"""Wide-int64 columns (values beyond the int32 device range) —
VERDICT r4 #7: carried as i32 dictionary codes against a sorted host
int64 vocabulary (storage/strings.encode_int64_columns), exactly the
string scheme.  Code order == value order, so every key/order operator
is exact at any magnitude; arithmetic refuses loudly (its values exceed
exact f32 anyway).

Reference context: Int64 is a first-class DataType carried natively
(/root/reference/include/csv_loader.hpp:13); its all-f32 compute would
corrupt such keys — ours must not.
"""

import numpy as np
import pytest

from warpdb_tpu import WarpDB
from warpdb_tpu.errors import ValidationError
from warpdb_tpu.storage import HostTable

# 2^40-scale surrogate keys with adjacent values an f32 (or f64-via-f32)
# cast would collide.
K = np.array(
    [2**40, 2**40 + 1, 2**40 + 2, -(2**40), 2**33, 2**33 + 1],
    np.int64,
)


def _db(reps: int = 2):
    k = np.tile(K, reps)
    v = (np.arange(len(k)) % 5 + 1).astype(np.float32)
    db = WarpDB(HostTable.from_dict({"k": k, "v": v}))
    return db, k, v


def test_group_by_wide_keys_exact():
    db, k, v = _db()
    out = db.query_sql_table("SELECT k, SUM(v) AS s FROM t GROUP BY k")
    got = np.sort(np.asarray(out["k"], np.int64))
    np.testing.assert_array_equal(got, np.sort(np.unique(k)))
    for key, s in zip(out["k"], out["s"]):
        assert s == pytest.approx(float(v[k == key].sum()), rel=1e-6)


def test_order_by_and_distinct_wide_exact():
    db, k, _ = _db(1)
    out = db.query_sql_table("SELECT k FROM t ORDER BY k DESC")
    np.testing.assert_array_equal(
        np.asarray(out["k"], np.int64), np.sort(k)[::-1]
    )
    out = db.query_sql_table("SELECT DISTINCT k FROM t")
    np.testing.assert_array_equal(
        np.sort(np.asarray(out["k"], np.int64)), np.sort(np.unique(k))
    )


def test_where_literals_wide_exact():
    db, k, v = _db()
    out = db.query_sql_table(f"SELECT v FROM t WHERE k = {2**40 + 1}")
    np.testing.assert_allclose(
        np.sort(np.asarray(out["v"])), np.sort(v[k == 2**40 + 1])
    )
    # Adjacent key must NOT match (f32 would collide them).
    out = db.query_sql_table(f"SELECT v FROM t WHERE k = {2**40}")
    np.testing.assert_allclose(
        np.sort(np.asarray(out["v"])), np.sort(v[k == 2**40])
    )
    # Range comparisons: non-member literal sits at its exact rank.
    out = db.query_sql_table(f"SELECT v FROM t WHERE k > {2**39}")
    assert len(out["v"]) == int((k > 2**39).sum())
    # IN list lowers to OR-of-equalities in code space.
    out = db.query_sql_table(
        f"SELECT v FROM t WHERE k IN ({2**40}, {2**33 + 1})"
    )
    assert len(out["v"]) == int(np.isin(k, [2**40, 2**33 + 1]).sum())


def test_join_wide_both_coded():
    db = WarpDB(HostTable.from_dict({
        "k": np.array([2**40, 2**40 + 1, 2**40 + 2], np.int64),
        "v": np.array([1.0, 2.0, 3.0], np.float32),
    }))
    db.register_table("d", HostTable.from_dict({
        "k": np.array([2**40 + 1, 2**41], np.int64),
        "w": np.array([10.0, 30.0], np.float32),
    }))
    out = db.query_sql_table("SELECT t.k, d.w FROM t JOIN d ON t.k = d.k")
    assert list(np.asarray(out["t.k"], np.int64)) == [2**40 + 1]
    assert out["d.w"] == [10.0]


def test_join_wide_probe_coded_build_raw():
    # lineitem keys exceed 2^31 (coded) while the dim table's fit in
    # int32 (raw) — the build side re-encodes under the probe vocab.
    db = WarpDB(HostTable.from_dict({
        "k": np.array([2**40, 7, 2**40, 9], np.int64),
        "v": np.array([1.0, 2.0, 4.0, 8.0], np.float32),
    }))
    db.register_table("d", HostTable.from_dict({
        "k": np.array([7, 8], np.int64),
        "w": np.array([100.0, 200.0], np.float32),
    }))
    out = db.query_sql("SELECT SUM(v * d.w) FROM t JOIN d ON k = d.k")
    assert float(out[0]) == pytest.approx(200.0)


def test_join_wide_probe_raw_build_coded():
    db = WarpDB(HostTable.from_dict({
        "k": np.array([7, 8, 9], np.int64),
        "v": np.array([1.0, 2.0, 4.0], np.float32),
    }))
    db.register_table("d", HostTable.from_dict({
        "k": np.array([8, 2**40], np.int64),
        "w": np.array([100.0, 200.0], np.float32),
    }))
    out = db.query_sql("SELECT SUM(v * d.w) FROM t JOIN d ON k = d.k")
    assert float(out[0]) == pytest.approx(200.0)


def test_min_max_count_wide():
    db, k, _ = _db()
    out = db.query_sql_table(
        "SELECT MIN(k) AS lo, MAX(k) AS hi, COUNT(k) AS n FROM t"
    )
    assert int(out["lo"][0]) == int(k.min())
    assert int(out["hi"][0]) == int(k.max())
    assert float(out["n"][0]) == len(k)


def test_arithmetic_over_wide_refuses_loudly():
    db, _, _ = _db()
    with pytest.raises(ValidationError, match="int64"):
        db.query_sql("SELECT SUM(k) FROM t")
    with pytest.raises(ValidationError, match="int64"):
        db.query_sql("SELECT k + 1 FROM t")


def test_scalar_subquery_wide_exact():
    db = WarpDB(HostTable.from_dict({
        "k": np.array([2**40, 2**40 + 1], np.int64),
        "v": np.array([1.0, 2.0], np.float32),
    }))
    out = db.query_sql_table(
        "SELECT v FROM t WHERE k = (SELECT MAX(k) FROM t)"
    )
    assert list(out["v"]) == [2.0]


def test_wide_vs_nonconstant_comparison_refuses():
    """Comparing a wide column to a non-constant expression would
    compare CODES to values — must refuse loudly (review r5)."""
    db = WarpDB(HostTable.from_dict({
        "k": np.array([2**40, 2**40 + 1, 2**40 + 2, 5], np.int64),
        "q": np.array([1.0, 2.0, 3.0, 4.0], np.float32),
    }))
    with pytest.raises(ValidationError, match="int64"):
        db.query_sql("SELECT q FROM t WHERE k > q + 0")
    with pytest.raises(ValidationError, match="int64"):
        db.query_sql("SELECT q FROM t WHERE k = q")


def test_in_subquery_wide_values_noncoded_outer_exact():
    """Wide int64 subquery values against a plain int32 outer column:
    non-f32-round-tripping values can never match and must not be
    rounded into spurious matches (2147483650 once matched
    2147483647)."""
    db = WarpDB(HostTable.from_dict({
        "q": np.array([2147483647, 5, 7], np.int32),
        "v": np.ones(3, np.float32),
    }))
    db.register_table("t2", HostTable.from_dict({
        "k": np.array([2147483650, 7], np.int64),
    }))
    out = db.query_sql_table("SELECT q FROM t WHERE q IN (SELECT k FROM t2)")
    assert list(np.asarray(out["q"], np.int64)) == [7]


def test_join_wide_build_float_probe_no_sentinel_collision():
    """Raw f32 probe key at the f32 ulp boundary must NOT join an
    out-of-range build key through the miss sentinel (review r5: the
    int sentinel max+1 rounded back onto max in f32)."""
    db = WarpDB(HostTable.from_dict({
        "pk": np.array([33554436.0, 7.0], np.float32),
        "v": np.array([1.0, 2.0], np.float32),
    }))
    db.register_table("d", HostTable.from_dict({
        "pk": np.array([10000000000, 7], np.int64),
        "w": np.array([100.0, 200.0], np.float32),
    }))
    out = db.query_sql_table("SELECT v, d.w FROM t JOIN d ON pk = d.pk")
    assert list(np.asarray(out["v"])) == [2.0]
    assert list(np.asarray(out["d.w"])) == [200.0]


def test_wide_value_context_refusals_cover_order_stats_and_functions():
    db, _, _ = _db()
    for sql in (
        "SELECT MEDIAN(k) FROM t",
        "SELECT PERCENTILE(k, 0.5) FROM t",
        "SELECT ABS(k) FROM t",
    ):
        with pytest.raises(ValidationError, match="int64"):
            db.query_sql(sql)


def test_qualify_count_kernel_not_reused_across_stats(monkeypatch):
    """Two same-schema tables with different partition-key stats must
    not share the QUALIFY survivor-count kernel (review r5: a stale
    dense config silently truncated results)."""
    rng = np.random.default_rng(9)
    n = 64
    v = rng.uniform(1.0, 2.0, n).astype(np.float32)
    a = WarpDB(HostTable.from_dict({
        "p": rng.integers(0, 4, n).astype(np.float32), "v": v,
    }))
    big = (rng.integers(0, 4, n) * 1_000_000).astype(np.float32)
    b = WarpDB(HostTable.from_dict({"p": big, "v": v}))
    sql = "SELECT v FROM t QUALIFY SUM(v) OVER (PARTITION BY p) > 0"
    assert len(a.query_sql_table(sql)["v"]) == n
    assert len(b.query_sql_table(sql)["v"]) == n
