"""Native C++ runtime library tests (skipped when not built:
``make -C native``)."""

import os

import numpy as np
import pytest

from warpdb_tpu.interchange import native


pytestmark = pytest.mark.skipif(
    native.load_native() is None, reason="libwarpdb_native.so not built"
)


def test_count_rows(tmp_path):
    path = tmp_path / "t.csv"
    path.write_text("a,b\n1,2\n3,4\n5,6\n")
    lib = native.load_native()
    assert lib.wdb_csv_count_rows(str(path).encode()) == 3


def test_count_rows_no_trailing_newline(tmp_path):
    path = tmp_path / "t.csv"
    path.write_text("a\n1\n2")
    lib = native.load_native()
    assert lib.wdb_csv_count_rows(str(path).encode()) == 2


def test_parse_matches_python_loader(tmp_path):
    rng = np.random.default_rng(3)
    n = 50_000
    a = rng.uniform(0, 1000, n)
    b = rng.integers(0, 100, n)
    path = tmp_path / "big.csv"
    with open(path, "w") as f:
        f.write("x,y\n")
        for i in range(n):
            f.write(f"{a[i]:.4f},{b[i]}\n")
    cols = native.csv_parse_f32(str(path), 2)
    assert len(cols[0]) == n
    expect_x = np.array([np.float32(round(v, 4)) for v in a[:100]])
    np.testing.assert_allclose(cols[0][:100], expect_x, rtol=1e-6)
    np.testing.assert_array_equal(cols[1], b.astype(np.float32))


def test_parse_multithreaded_consistency(tmp_path):
    n = 200_000
    path = tmp_path / "mt.csv"
    with open(path, "w") as f:
        f.write("i\n")
        for i in range(n):
            f.write(f"{i}\n")
    one = native.csv_parse_f32(str(path), 1, num_threads=1)[0]
    eight = native.csv_parse_f32(str(path), 1, num_threads=8)[0]
    np.testing.assert_array_equal(one, eight)
    np.testing.assert_array_equal(one, np.arange(n, dtype=np.float32))


def test_native_arrow_export_used():
    pa = pytest.importorskip("pyarrow")
    from warpdb_tpu.interchange.arrow_export import _export_native

    vals = np.array([1.5, 2.5, 3.5], np.float32)
    result = _export_native(vals, False)
    assert result is not None
    arr_c, schema_c = result
    from warpdb_tpu.api import _capsule_address

    a = pa.Array._import_from_c(_capsule_address(arr_c), _capsule_address(schema_c))
    np.testing.assert_allclose(a.to_numpy(zero_copy_only=False), vals)


def test_native_arrow_export_shm():
    lib = native.load_native()
    from warpdb_tpu.interchange.arrow_export import _export_native

    vals = np.array([7.0, 8.0], np.float32)
    result = _export_native(vals, True)
    assert result is not None
    assert os.path.exists("/dev/shm/warpdb_result")
    with open("/dev/shm/warpdb_result", "rb") as f:
        raw = np.frombuffer(f.read(8), dtype=np.float32)
    np.testing.assert_allclose(raw, vals)


def test_native_stream_chunks(tmp_path):
    from warpdb_tpu.interchange import native as native_mod

    if native_mod.load_native() is None:
        pytest.skip("native library not built")
    path = tmp_path / "s.csv"
    lines = ["a,b"] + [f"{i},{i * 2}" for i in range(10)]
    path.write_text("\n".join(lines) + "\n")
    chunks = list(native_mod.iter_csv_chunks_native(str(path), 2, 3))
    assert [c.shape[1] for c in chunks] == [3, 3, 3, 1]
    all_a = np.concatenate([c[0] for c in chunks])
    np.testing.assert_allclose(all_a, np.arange(10, dtype=np.float32))
    all_b = np.concatenate([c[1] for c in chunks])
    np.testing.assert_allclose(all_b, 2 * np.arange(10, dtype=np.float32))


def test_native_stream_via_iter_csv_chunks(tmp_path):
    # iter_csv_chunks routes through the native stream for f32 schemas
    # and must produce the same HostTables as the Python path.
    from warpdb_tpu.interchange import native as native_mod
    from warpdb_tpu.storage.csv import iter_csv_chunks

    if native_mod.load_native() is None:
        pytest.skip("native library not built")
    path = tmp_path / "s2.csv"
    n = 5000
    rng = np.random.default_rng(11)
    vals = rng.uniform(0, 100, (n, 2))
    body = "\n".join(f"{a:.4f},{b:.4f}" for a, b in vals)
    path.write_text("x,y\n" + body + "\n")
    chunks = list(iter_csv_chunks(str(path), 1024))
    assert sum(c.num_rows for c in chunks) == n
    got = np.concatenate([c.get_column("x").data for c in chunks])
    want = np.asarray([float(f"{a:.4f}") for a in vals[:, 0]], np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_native_stream_malformed(tmp_path):
    from warpdb_tpu.errors import WarpDBError
    from warpdb_tpu.interchange import native as native_mod
    from warpdb_tpu.storage.csv import iter_csv_chunks

    if native_mod.load_native() is None:
        pytest.skip("native library not built")
    path = tmp_path / "bad.csv"
    path.write_text("a,b\n1,2\nxx,4\n")
    with pytest.raises(WarpDBError, match="Malformed"):
        list(iter_csv_chunks(str(path), 10))
