"""Out-of-core partition-aggregate windows (VERDICT r4 #6).

``AGG(e) OVER (PARTITION BY k)`` streams in two passes — merged grouped
partials, then per-row broadcast — with state O(partitions).  Every test
is differential against the in-memory engine on the same data; ordered/
framed windows keep their loud refusal.

Reference: out-of-core there was scans-only (warpdb.cpp:544-590).
"""

import numpy as np
import pytest

from warpdb_tpu import WarpDB
from warpdb_tpu.errors import UnsupportedError
from warpdb_tpu.storage import HostTable


def _write_csv(path, cols: dict) -> None:
    names = list(cols)
    n = len(next(iter(cols.values())))
    with open(path, "w") as f:
        f.write(",".join(names) + "\n")
        for i in range(n):
            f.write(",".join(str(cols[k][i]) for k in names) + "\n")


def _data(n=999, parts=7, seed=11):
    rng = np.random.default_rng(seed)
    return {
        "p": rng.integers(0, parts, n).astype(np.float32),
        "v": np.round(
            rng.uniform(0.0, 100.0, n), 2
        ).astype(np.float32),
    }


QUERIES = [
    "SELECT v, SUM(v) OVER (PARTITION BY p) AS s FROM t",
    "SELECT v - AVG(v) OVER (PARTITION BY p) AS d FROM t",
    "SELECT MAX(v) OVER (PARTITION BY p) - MIN(v) OVER (PARTITION BY p)"
    " AS r FROM t",
    "SELECT v / COUNT(v) OVER (PARTITION BY p) AS w FROM t "
    "WHERE v > 30",
    "SELECT v, SUM(v) OVER () AS tot FROM t",
]


@pytest.mark.parametrize("sql", QUERIES)
def test_streaming_window_matches_in_memory(tmp_path, sql):
    cols = _data()
    path = tmp_path / "t.csv"
    _write_csv(path, cols)
    db = WarpDB(HostTable.from_dict(cols))
    want = db.query_sql_table(sql)
    got = WarpDB.query_streaming_sql(str(path), sql, rows_per_chunk=64)
    assert list(got.keys()) == list(want.keys())
    for k in want:
        np.testing.assert_allclose(
            np.asarray(got[k], np.float64),
            np.asarray(want[k], np.float64),
            rtol=2e-4, atol=1e-3,
        )


def test_streaming_window_orderby_limit(tmp_path):
    cols = _data()
    path = tmp_path / "t.csv"
    _write_csv(path, cols)
    db = WarpDB(HostTable.from_dict(cols))
    sql = (
        "SELECT v - AVG(v) OVER (PARTITION BY p) AS d FROM t "
        "ORDER BY d DESC LIMIT 5"
    )
    want = db.query_sql_table(sql)
    got = WarpDB.query_streaming_sql(str(path), sql, rows_per_chunk=64)
    np.testing.assert_allclose(
        np.asarray(got["d"], np.float64),
        np.asarray(want["d"], np.float64),
        rtol=2e-4, atol=1e-3,
    )


def test_streaming_window_string_partition(tmp_path):
    n = 300
    rng = np.random.default_rng(3)
    cols = {
        "s": np.array(["aa", "bb", "cc"])[rng.integers(0, 3, n)],
        "v": np.round(rng.uniform(0, 10, n), 2).astype(np.float32),
    }
    path = tmp_path / "t.csv"
    _write_csv(path, cols)
    from warpdb_tpu import DataType

    db = WarpDB(HostTable.from_dict(cols))
    sql = "SELECT v - AVG(v) OVER (PARTITION BY s) AS d FROM t"
    want = db.query_sql_table(sql)
    got = WarpDB.query_streaming_sql(
        str(path), sql, rows_per_chunk=32,
        schema=[DataType.STRING, DataType.FLOAT32],
    )
    np.testing.assert_allclose(
        np.asarray(got["d"], np.float64),
        np.asarray(want["d"], np.float64),
        rtol=2e-4, atol=1e-3,
    )


def test_streaming_ordered_window_still_refuses(tmp_path):
    cols = _data(50)
    path = tmp_path / "t.csv"
    _write_csv(path, cols)
    with pytest.raises(UnsupportedError, match="window"):
        WarpDB.query_streaming_sql(
            str(path),
            "SELECT SUM(v) OVER (PARTITION BY p ORDER BY v ASC) FROM t",
            rows_per_chunk=16,
        )
    with pytest.raises(UnsupportedError, match="window"):
        WarpDB.query_streaming_sql(
            str(path),
            "SELECT RANK() OVER (PARTITION BY p ORDER BY v ASC) FROM t",
            rows_per_chunk=16,
        )
