"""TPC-H-derived benchmark suite correctness gate.

benchmarks/tpch.py is a perf harness; this test pins that every suite
query computes the right answer (vs the NumPy oracle in the same file)
at small scale, so the benchmark can never silently measure wrong
results.  Covers: wide multi-aggregate GROUP BY over string keys (q1),
two-join selective-filter top-k (q3), join-chain GROUP BY string (q5),
multi-predicate scan aggregate (q6), join + CASE conditional aggregation
+ IN + <> (q12), and HAVING + top-k over a high-cardinality group (q18).
"""

import pathlib
import sys

import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent
                       / "benchmarks"))

import tpch  # noqa: E402


@pytest.fixture(scope="module")
def setup():
    tables = tpch.make_tables(12_000, seed=11)
    db = tpch.build_db(tables)
    return tables, db


@pytest.mark.parametrize("name", list(tpch.QUERIES))
def test_tpch_query_matches_oracle(setup, name):
    tables, db = setup
    got = db.query_sql_table(tpch.QUERIES[name])
    tpch.check_results(name, got, tpch.oracle(tables, name))
