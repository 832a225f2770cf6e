"""GROUP BY GROUPING SETS / ROLLUP / CUBE and the GROUPING() marker.

Extension over the reference, whose grammar has plain GROUP BY only
(expression.hpp:132-143).  Standard semantics in the engine's
missing-value representation: a rolled-up numeric key reads NaN, a
rolled-up string key reads "" (the engine has no NULL; NaN/empty-code
are its missing markers — see README "Known limitations").
"""

import math

import numpy as np
import pytest

from warpdb_tpu import DataType, WarpDB
from warpdb_tpu.errors import ParseError
from warpdb_tpu.frontend import parse_query_text


@pytest.fixture(scope="module")
def gdb(tmp_path_factory):
    p = tmp_path_factory.mktemp("gsets") / "sales.csv"
    rng = np.random.default_rng(7)
    regions = ["east", "west", "north"]
    products = ["a", "b"]
    rows = []
    for _ in range(60):
        rows.append(
            (
                regions[rng.integers(3)],
                products[rng.integers(2)],
                float(rng.integers(1, 9)),
                round(float(rng.uniform(1, 100)), 2),
            )
        )
    p.write_text(
        "region,product,quantity,price\n"
        + "\n".join(f"{r},{pr},{q},{pc}" for r, pr, q, pc in rows)
    )
    schema = [DataType.STRING, DataType.STRING, DataType.FLOAT32, DataType.FLOAT32]
    db = WarpDB(str(p), schema)
    return db, rows


def _oracle_sets(rows, keysets):
    """dict per grouping set: (key tuple) -> sum(price) with f32 accum."""
    out = []
    for keys in keysets:
        acc = {}
        for r, pr, q, pc in rows:
            vals = {"region": r, "product": pr, "quantity": q}
            k = tuple(vals[c] for c in keys)
            acc[k] = np.float32(acc.get(k, np.float32(0.0)) + np.float32(pc))
        out.append(acc)
    return out


def _rowset(res):
    cols = list(res.values())
    rows = set()
    for tup in zip(*cols):
        rows.add(
            tuple(
                "NaN"
                if isinstance(v, float) and math.isnan(v)
                else (round(v, 2) if isinstance(v, float) else v)
                for v in tup
            )
        )
    return rows


def _expected_rowset(rows, keysets, all_keys):
    exp = set()
    oracles = _oracle_sets(rows, keysets)
    str_keys = {"region", "product"}
    for keys, acc in zip(keysets, oracles):
        for ktup, s in acc.items():
            vals = dict(zip(keys, ktup))
            row = []
            for c in all_keys:
                if c in vals:
                    row.append(vals[c])
                elif c in str_keys:
                    row.append("")
                else:
                    row.append("NaN")
            row.append(round(float(s), 2))
            exp.add(tuple(row))
    return exp


def test_rollup_two_keys(gdb):
    db, rows = gdb
    res = db.query_sql_table(
        "SELECT region, product, SUM(price) FROM sales "
        "GROUP BY ROLLUP(region, product)"
    )
    got = _rowset(res)
    exp = _expected_rowset(
        rows,
        [("region", "product"), ("region",), ()],
        ["region", "product"],
    )
    assert got == exp


def test_cube_two_keys(gdb):
    db, rows = gdb
    res = db.query_sql_table(
        "SELECT region, product, SUM(price) FROM sales "
        "GROUP BY CUBE(region, product)"
    )
    got = _rowset(res)
    exp = _expected_rowset(
        rows,
        [("region", "product"), ("region",), ("product",), ()],
        ["region", "product"],
    )
    assert got == exp


def test_grouping_sets_explicit(gdb):
    db, rows = gdb
    res = db.query_sql_table(
        "SELECT region, product, SUM(price) FROM sales "
        "GROUP BY GROUPING SETS ((region), (product), ())"
    )
    got = _rowset(res)
    exp = _expected_rowset(
        rows,
        [("region",), ("product",), ()],
        ["region", "product"],
    )
    assert got == exp


def test_numeric_key_rollup_nan_fill(gdb):
    db, rows = gdb
    res = db.query_sql_table(
        "SELECT quantity, SUM(price) FROM sales GROUP BY ROLLUP(quantity)"
    )
    got = _rowset(res)
    exp = _expected_rowset(rows, [("quantity",), ()], ["quantity"])
    assert got == exp


def test_grouping_marker(gdb):
    db, _ = gdb
    res = db.query_sql_table(
        "SELECT region, GROUPING(region), COUNT(*) FROM sales "
        "GROUP BY GROUPING SETS ((region), ())"
    )
    rows = list(zip(*res.values()))
    # Exactly one total row, flagged 1; per-region rows flagged 0.
    totals = [r for r in rows if r[1] == 1.0]
    details = [r for r in rows if r[1] == 0.0]
    assert len(totals) == 1 and totals[0][0] == ""
    assert len(details) == 3
    assert sum(r[2] for r in details) == totals[0][2] == 60


def test_mixed_plain_and_rollup(gdb):
    db, rows = gdb
    # Standard cross-product: a, ROLLUP(b) == sets {(a,b),(a)}.
    res = db.query_sql_table(
        "SELECT region, product, SUM(price) FROM sales "
        "GROUP BY region, ROLLUP(product)"
    )
    got = _rowset(res)
    exp = _expected_rowset(
        rows,
        [("region", "product"), ("region",)],
        ["region", "product"],
    )
    assert got == exp


def test_rollup_order_by_and_limit(gdb):
    db, rows = gdb
    res = db.query_sql_table(
        "SELECT region, SUM(price) AS total FROM sales "
        "GROUP BY ROLLUP(region) ORDER BY total DESC LIMIT 2"
    )
    rows_out = list(zip(*res.values()))
    assert len(rows_out) == 2
    # Grand total dominates any single region.
    assert rows_out[0][0] == ""
    assert rows_out[0][1] >= rows_out[1][1]


def test_rollup_order_by_key_nan_last(gdb):
    db, _ = gdb
    res = db.query_sql_table(
        "SELECT quantity, COUNT(*) FROM sales "
        "GROUP BY ROLLUP(quantity) ORDER BY quantity"
    )
    q = list(res.values())[0]
    # NaN (the rolled-up total) sorts last ascending, engine total order.
    assert all(not math.isnan(v) for v in q[:-1])
    assert math.isnan(q[-1])
    assert q[:-1] == sorted(q[:-1])


def test_having_applies_per_set(gdb):
    db, rows = gdb
    res = db.query_sql_table(
        "SELECT region, COUNT(*) FROM sales "
        "GROUP BY ROLLUP(region) HAVING COUNT(*) > 15"
    )
    out = list(zip(*res.values()))
    counts = {}
    for r in rows:
        counts[r[0]] = counts.get(r[0], 0) + 1
    exp = {(k, float(v)) for k, v in counts.items() if v > 15}
    exp.add(("", 60.0))  # grand total passes COUNT(*) > 15
    assert set(out) == exp


def test_having_filters_empty_set_row(gdb):
    db, _ = gdb
    res = db.query_sql_table(
        "SELECT region, COUNT(*) FROM sales "
        "GROUP BY ROLLUP(region) HAVING COUNT(*) < 30"
    )
    out = list(zip(*res.values()))
    # Grand total (60) must be filtered; all regions < 30 remain.
    assert all(r[0] != "" for r in out)
    assert len(out) == 3


def test_grouping_in_having(gdb):
    db, _ = gdb
    res = db.query_sql_table(
        "SELECT region, COUNT(*) FROM sales "
        "GROUP BY ROLLUP(region) HAVING GROUPING(region) == 0"
    )
    out = list(zip(*res.values()))
    assert len(out) == 3 and all(r[0] != "" for r in out)


def test_rollup_as_plain_identifier():
    # ROLLUP/CUBE/GROUPING stay usable as column names (contextual
    # keywords, not reserved).
    q = parse_query_text("SELECT rollup FROM t GROUP BY rollup, cube")
    assert q.group_by.sets is None
    # Variables canonicalise with the reference's ``[idx]`` row suffix.
    assert [k.canonical() for k in q.group_by.keys] == [
        "rollup[idx]",
        "cube[idx]",
    ]


def test_degenerate_single_set_is_plain_group_by():
    q = parse_query_text(
        "SELECT a, b FROM t GROUP BY GROUPING SETS ((a, b))"
    )
    assert q.group_by.sets is None
    assert len(q.group_by.keys) == 2


def test_canonical_normalises_rollup_to_sets():
    a = parse_query_text("SELECT a, SUM(x) FROM t GROUP BY ROLLUP(a)")
    b = parse_query_text(
        "SELECT a, SUM(x) FROM t GROUP BY GROUPING SETS ((a), ())"
    )
    assert a.canonical() == b.canonical()


def test_rollup_empty_rejected():
    with pytest.raises(ParseError):
        parse_query_text("SELECT 1 FROM t GROUP BY ROLLUP()")


def test_cube_width_capped():
    keys = ", ".join(f"k{i}" for i in range(9))
    with pytest.raises(ParseError):
        parse_query_text(f"SELECT 1 FROM t GROUP BY CUBE({keys})")


def test_rollup_key_used_in_expression(gdb):
    db, rows = gdb
    # A rolled-up key referenced in row-level arithmetic becomes NULL
    # (NaN) and propagates; the detail rows compute normally.
    res = db.query_sql_table(
        "SELECT quantity + 1, SUM(price) FROM sales "
        "GROUP BY ROLLUP(quantity)"
    )
    col = list(res.values())[0]
    n_nan = sum(1 for v in col if math.isnan(v))
    assert n_nan == 1
    qs = {q for _, _, q, _ in rows}
    assert {v for v in col if not math.isnan(v)} == {q + 1 for q in qs}
