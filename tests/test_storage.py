"""Storage tests: CSV/JSON/Arrow loaders, schema rules, chunked streaming,
device upload, column stats (reference tier: extended_types_test.cpp +
loader behaviors from csv_loader.cpp/json_loader.cpp)."""

import io

import numpy as np
import pytest

from warpdb_tpu.errors import UnsupportedError, WarpDBError
from warpdb_tpu.storage import DataType, DeviceTable, HostTable, load_table
from warpdb_tpu.storage.csv import iter_csv_chunks, load_csv_to_host
from warpdb_tpu.storage.json import load_json_to_host


def test_csv_default_all_float32(data_dir):
    t = load_csv_to_host(str(data_dir / "test.csv"))
    assert t.column_names == ["price", "quantity"]
    assert all(c.dtype is DataType.FLOAT32 for c in t.columns)
    assert t.num_rows == 4
    np.testing.assert_allclose(
        t.get_column("price").data, [10.5, 20.0, 15.25, 30.0]
    )


def test_csv_explicit_schema(data_dir):
    schema = [DataType.FLOAT32, DataType.INT32, DataType.FLOAT32]
    t = load_csv_to_host(str(data_dir / "extended.csv"), schema)
    assert t.get_column("quantity").dtype is DataType.INT32
    assert t.get_column("quantity").data.dtype == np.int32
    np.testing.assert_allclose(
        t.get_column("discount").data, [0.1, 0.2, 0.05, 0.15], rtol=1e-6
    )


def test_csv_schema_mismatch(data_dir):
    with pytest.raises(WarpDBError, match="Schema size does not match column count"):
        load_csv_to_host(str(data_dir / "test.csv"), [DataType.FLOAT32])


def test_csv_missing_file():
    with pytest.raises(WarpDBError, match="Unable to open file"):
        load_csv_to_host("no_such_file.csv")


def test_csv_chunked_no_header_bug(tmp_path):
    # 10 data rows, chunks of 3 → 3+3+3+1; the reference's load_csv_chunk
    # would have eaten rows 4 and 7 as "headers".
    path = tmp_path / "chunked.csv"
    lines = ["a,b"] + [f"{i},{i*2}" for i in range(10)]
    path.write_text("\n".join(lines) + "\n")
    chunks = list(iter_csv_chunks(str(path), max_rows=3))
    assert [c.num_rows for c in chunks] == [3, 3, 3, 1]
    all_a = np.concatenate([c.get_column("a").data for c in chunks])
    np.testing.assert_allclose(all_a, np.arange(10, dtype=np.float32))


def test_csv_chunked_stream_object():
    text = "x,y\n1,2\n3,4\n5,6\n"
    chunks = list(iter_csv_chunks(io.StringIO(text), max_rows=2))
    assert [c.num_rows for c in chunks] == [2, 1]


def test_json_loader(data_dir):
    t = load_json_to_host(str(data_dir / "test.json"))
    assert t.get_column("price").dtype is DataType.FLOAT32
    assert t.get_column("quantity").dtype is DataType.INT32
    np.testing.assert_allclose(
        t.get_column("price").data, [10.5, 20.0, 15.25, 30.0]
    )
    assert list(t.get_column("quantity").data) == [3, 4, 2, 5]


def test_extension_dispatch(data_dir):
    assert load_table(str(data_dir / "test.csv")).num_rows == 4
    assert load_table(str(data_dir / "test.json")).num_rows == 4
    with pytest.raises(WarpDBError, match="Unsupported file format"):
        load_table("foo.xyz")


def test_parquet_roundtrip(tmp_path, data_dir):
    pa = pytest.importorskip("pyarrow")
    import pyarrow.parquet as pq

    from warpdb_tpu.storage.arrow import host_table_to_arrow

    t = load_csv_to_host(str(data_dir / "test.csv"))
    path = tmp_path / "t.parquet"
    pq.write_table(host_table_to_arrow(t), path)
    back = load_table(str(path))
    np.testing.assert_allclose(
        back.get_column("price").data, t.get_column("price").data
    )


def test_column_stats(data_dir):
    t = load_csv_to_host(str(data_dir / "test.csv"))
    stats = t.get_column("price").stats
    assert stats.min == pytest.approx(10.5)
    assert stats.max == pytest.approx(30.0)
    assert stats.null_count == 0


def test_device_table_padding(data_dir):
    t = load_csv_to_host(str(data_dir / "test.csv"))
    dt = DeviceTable.from_host(t)
    assert dt.num_rows == 4
    assert dt.padded_rows % 1024 == 0
    col = np.asarray(dt.columns["price"])
    np.testing.assert_allclose(col[:4], [10.5, 20.0, 15.25, 30.0])
    assert (col[4:] == 0).all()


def test_device_table_dict_encodes_strings():
    # Strings are dictionary-encoded onto the device (sorted vocab +
    # int32 codes) — exceeds the reference, which left device_ptr null.
    t = HostTable.from_dict({"name": ["b", "a", "b"], "v": np.array([1.0, 2.0, 3.0], np.float32)})
    dt = DeviceTable.from_host(t)
    assert "name" in dt.columns
    assert dt.columns["name"].dtype == np.int32
    assert dt.dicts["name"].tolist() == ["a", "b"]
    assert np.asarray(dt.columns["name"])[:3].tolist() == [1, 0, 1]
    assert "name" in dt.dtypes            # still part of the schema
    assert "v" in dt.columns
    # Stats bound the code range so string GROUP BY rides the dense path.
    assert dt.stats["name"].min == 0.0 and dt.stats["name"].max == 1.0


def test_host_table_slice_concat():
    t = HostTable.from_dict({"v": np.arange(10, dtype=np.float32)})
    parts = [t.slice(0, 4), t.slice(4, 10)]
    back = HostTable.concat(parts)
    np.testing.assert_allclose(back.get_column("v").data, np.arange(10))


def test_csv_malformed_cell(tmp_path):
    path = tmp_path / "bad.csv"
    path.write_text("a,b\n1,2\nx,4\n")
    with pytest.raises(Exception):
        load_csv_to_host(str(path))


def test_empty_csv(tmp_path):
    path = tmp_path / "empty.csv"
    path.write_text("")
    with pytest.raises(WarpDBError, match="Empty CSV file"):
        load_csv_to_host(str(path))


def test_iter_table_chunks_parquet(tmp_path):
    pa = pytest.importorskip("pyarrow")
    import pyarrow.parquet as pq

    from warpdb_tpu.storage.chunks import iter_table_chunks, table_column_names

    n = 5000
    t = pa.table({
        "price": np.arange(n, dtype=np.float32),
        "quantity": (np.arange(n) % 7).astype(np.int32),
    })
    path = tmp_path / "t.parquet"
    pq.write_table(t, path, row_group_size=1200)
    assert table_column_names(str(path)) == ["price", "quantity"]
    chunks = list(iter_table_chunks(str(path), 800))
    assert sum(c.num_rows for c in chunks) == n
    assert max(c.num_rows for c in chunks) <= 800
    got = np.concatenate([c.get_column("price").data for c in chunks])
    np.testing.assert_allclose(got, np.arange(n, dtype=np.float32))


def test_iter_table_chunks_ndjson(tmp_path):
    from warpdb_tpu.storage.chunks import iter_table_chunks

    path = tmp_path / "t.ndjson"
    path.write_text(
        "\n".join(f'{{"price": {i}.5, "quantity": {i % 3}}}' for i in range(10))
    )
    chunks = list(iter_table_chunks(str(path), 4))
    assert [c.num_rows for c in chunks] == [4, 4, 2]
    got = np.concatenate([c.get_column("price").data for c in chunks])
    np.testing.assert_allclose(got, np.arange(10) + 0.5)


def test_warpdb_from_pyarrow_table():
    pa = pytest.importorskip("pyarrow")

    from warpdb_tpu import WarpDB

    t = pa.table({
        "price": np.float32([1.5, 2.5, 3.5]),
        "cat": ["a", "b", "a"],
    })
    db = WarpDB(t)
    assert db.query_sql("SELECT SUM(price) FROM t GROUP BY cat") == [5.0, 2.5]
    assert db.query_sql("SELECT cat FROM t WHERE price > 2") == ["b", "a"]
