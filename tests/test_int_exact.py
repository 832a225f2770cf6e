"""Exact integer-key semantics end-to-end (VERDICT r3 #3).

The reference declares Int32/Int64 first-class DataTypes
(/root/reference/include/csv_loader.hpp:13); its all-float compute
pipeline would corrupt them, ours must not: key VALUES survive beyond
f32's 2^24 integer ceiling through GROUP BY, JOIN, ORDER BY, DISTINCT,
WHERE, the mesh paths, and streaming; int64 beyond the int32 device
range refuses loudly instead of truncating (crossing 2^31).
"""

import numpy as np
import pytest

from warpdb_tpu import WarpDB
from warpdb_tpu.errors import ValidationError
from warpdb_tpu.parallel import data_mesh
from warpdb_tpu.storage import HostTable

# Adversarial key set: consecutive values straddling 2^24 (any f32 cast
# collides 2^24 and 2^24+1) plus negatives and int32 extremes.
KEYS = np.array(
    [
        16777215, 16777216, 16777217, 16777218,   # straddle 2^24
        -16777217, -16777216,                     # negative straddle
        2147483646, 2147483647,                   # int32 max edge
        -2147483648,                              # int32 min
        0, 1,
    ],
    np.int32,
)


def _db(reps: int = 3) -> tuple:
    k = np.tile(KEYS, reps)
    v = np.arange(len(k), dtype=np.float32) % 7 + 1
    db = WarpDB(HostTable.from_dict({"k": k, "v": v}))
    return db, k, v


def test_group_by_keys_exact_beyond_2_24():
    db, k, v = _db()
    out = db.query_sql_table("SELECT k, SUM(v) AS s FROM t GROUP BY k")
    got = np.sort(np.asarray(out["k"], np.int64))
    want = np.sort(np.unique(k).astype(np.int64))
    np.testing.assert_array_equal(got, want)
    for key, s in zip(out["k"], out["s"]):
        assert s == pytest.approx(float(v[k == key].sum()), rel=1e-5)


def test_group_by_highcard_sort_path_exact():
    # Cardinality high enough that stats can't bound a dense slot table.
    n = 1 << 12
    kk = ((np.arange(n, dtype=np.int64) * 7919) % (1 << 26)).astype(
        np.int32
    ) + (1 << 24)
    db = WarpDB(HostTable.from_dict(
        {"k": kk, "v": np.ones(n, np.float32)}
    ))
    out = db.query_sql_table("SELECT k, COUNT(*) AS n FROM t GROUP BY k")
    got = np.sort(np.asarray(out["k"], np.int64))
    np.testing.assert_array_equal(got, np.sort(np.unique(kk).astype(np.int64)))


def test_distinct_exact():
    db, k, _ = _db()
    out = db.query_sql_table("SELECT DISTINCT k FROM t")
    got = np.sort(np.asarray(out["k"], np.int64))
    np.testing.assert_array_equal(got, np.sort(np.unique(k).astype(np.int64)))


def test_order_by_exact():
    db, k, _ = _db(1)
    out = db.query_sql_table("SELECT k FROM t ORDER BY k ASC")
    np.testing.assert_array_equal(
        np.asarray(out["k"], np.int64), np.sort(k.astype(np.int64))
    )
    out = db.query_sql_table("SELECT k FROM t ORDER BY k DESC")
    np.testing.assert_array_equal(
        np.asarray(out["k"], np.int64), np.sort(k.astype(np.int64))[::-1]
    )


def test_where_equality_exact():
    db, k, v = _db()
    for target in (16777216, 16777217, -16777217, 2147483647):
        out = db.query_sql_table(f"SELECT v FROM t WHERE k = {target}")
        np.testing.assert_allclose(
            np.sort(np.asarray(out["v"], np.float64)),
            np.sort(v[k == target].astype(np.float64)),
        )
    # Non-integral literal: exact integer rewrite, not an f32 round.
    out = db.query_sql_table("SELECT v FROM t WHERE k < 16777216.5")
    assert len(out["v"]) == int((k <= 16777216).sum())


def test_join_no_false_matches_beyond_2_24():
    # 16777216 vs 16777217 collide under f32: the join must NOT match
    # them, and must match the exact pairs.
    db = WarpDB(HostTable.from_dict({
        "k": np.array([16777216, 16777217, 16777218], np.int32),
        "v": np.array([1.0, 2.0, 3.0], np.float32),
    }))
    db.register_table("d", HostTable.from_dict({
        "k": np.array([16777217, 16777219], np.int32),
        "w": np.array([10.0, 30.0], np.float32),
    }))
    out = db.query_sql_table("SELECT t.k, d.w FROM t JOIN d ON t.k = d.k")
    assert list(np.asarray(out["t.k"], np.int64)) == [16777217]
    assert out["d.w"] == [10.0]
    # LEFT JOIN: misses stay misses.
    out = db.query_sql_table(
        "SELECT t.k, d.w FROM t LEFT JOIN d ON t.k = d.k ORDER BY t.k ASC"
    )
    assert list(np.asarray(out["t.k"], np.int64)) == [
        16777216, 16777217, 16777218,
    ]
    w = np.asarray(out["d.w"], np.float64)
    assert np.isnan(w[0]) and w[1] == 10.0 and np.isnan(w[2])


def test_mesh_group_by_exact():
    mesh = data_mesh()
    db, k, v = _db(reps=16)
    db = WarpDB(HostTable.from_dict(
        {"k": np.tile(KEYS, 16),
         "v": np.ones(len(KEYS) * 16, np.float32)}
    ), mesh=mesh)
    out = db.query_sql_table("SELECT k, COUNT(*) AS n FROM t GROUP BY k")
    got = np.sort(np.asarray(out["k"], np.int64))
    np.testing.assert_array_equal(
        got, np.sort(np.unique(KEYS).astype(np.int64))
    )
    assert all(n == 16 for n in out["n"])


def test_mesh_join_exact(tmp_path):
    mesh = data_mesh()
    n = 4096
    kk = np.where(
        np.arange(n) % 2 == 0, 16777216, 16777217
    ).astype(np.int32)
    db = WarpDB(HostTable.from_dict(
        {"k": kk, "v": np.ones(n, np.float32)}
    ), mesh=mesh)
    db.register_table("d", HostTable.from_dict({
        "k": np.array([16777217], np.int32),
        "w": np.array([5.0], np.float32),
    }))
    out = db.query_sql_table(
        "SELECT SUM(d.w) AS s FROM t JOIN d ON t.k = d.k"
    )
    # Exactly the odd rows (16777217) match; 16777216 must not.
    assert out["s"] == [pytest.approx(5.0 * (n // 2))]


def test_streaming_group_by_exact(tmp_path):
    path = tmp_path / "wide.csv"
    k = np.tile(KEYS, 9)
    v = np.ones(len(k), np.float32)
    with open(path, "w") as f:
        f.write("k,v\n")
        for a, b in zip(k, v):
            f.write(f"{int(a)},{b}\n")
    from warpdb_tpu.storage.table import DataType

    out = WarpDB.query_streaming_sql(
        str(path), "SELECT k, COUNT(*) AS n FROM t GROUP BY k",
        rows_per_chunk=13,
        schema=[DataType.INT32, DataType.FLOAT32],
    )
    got = np.sort(np.asarray(out["k"], np.int64))
    np.testing.assert_array_equal(
        got, np.sort(np.unique(KEYS).astype(np.int64))
    )
    assert all(n == 9 for n in out["n"])


def test_int64_beyond_int32_is_exact():
    # Crossing 2^31 (VERDICT r4 #7): wide int64 keys now ride the
    # sorted-dictionary scheme (i32 codes, int64 vocab) — r3's
    # load-time refusal flips to exactness.
    db = WarpDB(HostTable.from_dict({
        "k": np.array([2**40, 2**40 + 1, 2**40, -2**40], np.int64),
        "v": np.array([1.0, 2.0, 4.0, 8.0], np.float32),
    }))
    out = db.query_sql_table(
        "SELECT k, SUM(v) AS s FROM t GROUP BY k ORDER BY k ASC"
    )
    assert list(out["k"]) == [-2**40, 2**40, 2**40 + 1]
    assert out["s"] == [8.0, 5.0, 2.0]
    # int64 WITHIN int32 range stays exact end-to-end.
    db = WarpDB(HostTable.from_dict({
        "k": np.array([16777217, 16777218, 16777217], np.int64),
        "v": np.array([1.0, 2.0, 4.0], np.float32),
    }))
    out = db.query_sql_table("SELECT k, SUM(v) AS s FROM t GROUP BY k")
    assert list(np.asarray(out["k"], np.int64)) == [16777217, 16777218]
    assert out["s"] == [5.0, 2.0]


def test_having_large_integer_literal_exact():
    db, k, v = _db()
    out = db.query_sql_table(
        "SELECT k, SUM(v) AS s FROM t GROUP BY k HAVING k = 16777217"
    )
    assert list(np.asarray(out["k"], np.int64)) == [16777217]
