"""Arrow C Data Interface export tests (reference arrow_utils.cpp +
pywarpdb.cpp contract: capsules consumable by pyarrow, optional shm)."""

import os

import numpy as np
import pytest

from warpdb_tpu import WarpDB


@pytest.fixture(scope="module")
def db():
    return WarpDB("data/test.csv")


def test_query_arrow_capsules(db):
    pa = pytest.importorskip("pyarrow")
    arr = db.query_arrow_array("price * quantity")
    assert arr.type == pa.float32()
    np.testing.assert_allclose(
        arr.to_numpy(zero_copy_only=False), [31.5, 80.0, 30.5, 150.0]
    )


def test_query_arrow_schema_format(db):
    from warpdb_tpu.api import _capsule_address
    from warpdb_tpu.interchange.arrow_export import ArrowSchemaStruct
    import ctypes

    _, schema_capsule = db.query_arrow("price + 1")
    addr = _capsule_address(schema_capsule)
    schema = ArrowSchemaStruct.from_address(addr)
    assert schema.format == b"f"
    assert schema.name == b"result"


def test_query_arrow_shared_memory(db):
    pa = pytest.importorskip("pyarrow")
    arr_c, schema_c = db.query_arrow("price + 1", shared_memory=True)
    assert os.path.exists("/dev/shm/warpdb_result")
    # Another "process" can map the same buffer and see the data.
    with open("/dev/shm/warpdb_result", "rb") as f:
        raw = np.frombuffer(f.read(16), dtype=np.float32)
    np.testing.assert_allclose(raw, [11.5, 21.0, 16.25, 31.0])
    from warpdb_tpu.api import _capsule_address

    a = pa.Array._import_from_c(_capsule_address(arr_c), _capsule_address(schema_c))
    np.testing.assert_allclose(a.to_numpy(zero_copy_only=False),
                               [11.5, 21.0, 16.25, 31.0])
    del a  # release callback unlinks the shm


def test_cli_smoke(capsys):
    from warpdb_tpu.__main__ import main

    rc = main(["price * quantity", "data/test.csv", "--limit-print", "4"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Result[0] = 31.5" in out
    assert "Result[3] = 150.0" in out


def test_cli_sql(capsys):
    from warpdb_tpu.__main__ import main

    rc = main(["SELECT SUM(price) FROM test GROUP BY quantity", "data/test.csv"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Result[0] = " in out


def test_struct_array_export(data_dir):
    import pyarrow as pa

    from warpdb_tpu import WarpDB

    db = WarpDB(str(data_dir / "test.csv"))
    rb = db.query_record_batch(
        "SELECT quantity AS q, SUM(price) AS total, COUNT(*) AS n "
        "FROM test GROUP BY quantity ORDER BY quantity ASC"
    )
    assert rb.num_rows == 4
    assert rb.schema.names == ["q", "total", "n"]
    assert rb.column("q").to_pylist() == [2.0, 3.0, 4.0, 5.0]
    assert rb.column("total").to_pylist() == pytest.approx(
        [15.25, 10.5, 20.0, 30.0]
    )


def test_struct_array_export_strings(tmp_path):
    import pyarrow as pa

    from warpdb_tpu import DataType, WarpDB

    p = tmp_path / "s.csv"
    p.write_text("price,category\n10.5,toys\n20.0,books\n15.25,toys\n")
    db = WarpDB(str(p), [DataType.FLOAT32, DataType.STRING])
    rb = db.query_record_batch(
        "SELECT category AS cat, SUM(price) AS total FROM s "
        "GROUP BY category ORDER BY category ASC"
    )
    assert rb.column("cat").to_pylist() == ["books", "toys"]
    assert rb.column("total").to_pylist() == pytest.approx([20.0, 25.75])
    assert pa.types.is_string(rb.schema.field("cat").type)
