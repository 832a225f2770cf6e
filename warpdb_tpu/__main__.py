"""CLI: ``python -m warpdb_tpu "<expr|SQL>" [data_file]``.

Mirrors the reference CLI contract (main.cu:120-128): one query argument
(expression with optional WHERE, or a full SELECT statement), an optional
data file defaulting to ``data/test.csv``, and ``Result[i] = v`` output
lines (main.cu:337-343 / optimizer.cpp:56-58) for side-by-side diffing.
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="warpdb_tpu",
        description="TPU-native vectorized SQL query engine",
    )
    parser.add_argument("query", help='e.g. "price * quantity WHERE price > 10" or a SELECT statement')
    parser.add_argument("data_file", nargs="?", default="data/test.csv")
    parser.add_argument("--limit-print", type=int, default=20,
                        help="max result rows to print")
    parser.add_argument("--sharded", action="store_true",
                        help="execute across all local devices")
    parser.add_argument("--profile", metavar="DIR", default=None,
                        help="write a jax profiler trace to DIR")
    args = parser.parse_args(argv)

    from . import WarpDB

    t0 = time.perf_counter()
    db = WarpDB(args.data_file)
    t_load = time.perf_counter() - t0
    print(f"Loaded {db.num_rows} rows from {args.data_file} "
          f"({', '.join(db.column_names)}) in {t_load*1e3:.1f} ms")

    profile_ctx = None
    if args.profile:
        import jax

        profile_ctx = jax.profiler.trace(args.profile)
        profile_ctx.__enter__()

    t1 = time.perf_counter()
    is_sql = args.query.strip().upper().startswith("SELECT")
    if is_sql:
        result = db.query_sql(args.query)
    elif args.sharded:
        result = db.query_sharded(args.query)
    else:
        result = db.query(args.query)
    t_query = time.perf_counter() - t1

    if profile_ctx is not None:
        profile_ctx.__exit__(None, None, None)

    for i, v in enumerate(result[: args.limit_print]):
        print(f"Result[{i}] = {v}")
    if len(result) > args.limit_print:
        print(f"... ({len(result)} rows total)")
    rows = db.num_rows if not is_sql else len(result)
    print(f"Query executed in {t_query*1e3:.2f} ms "
          f"({db.num_rows / max(t_query, 1e-9):,.0f} rows/s incl. compile)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
