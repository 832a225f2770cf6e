"""Profile the expansion-join e2e path stage by stage on the real chip.

Replicates bench.py's e2e_join_expand query (33.5M probe rows x 2-dup
build side -> 67M output rows) and times:

  phase1      sort/dense match counts + the capacity count sync
  gate        windowed-expansion span check (one more scalar sync)
  join        full _materialize_join (phase1 + gate + expand/gather)
  groupfin    the grouped aggregation + ORDER BY + transfer on the
              joined table (full query minus join)
  full        the whole query e2e

Each stage is median-of-5; every timed call forces a scalar to host
(block_until_ready does not sync through the relay).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from warpdb_tpu import WarpDB
    from warpdb_tpu.config import get_config
    from warpdb_tpu.storage import HostTable

    n = int(os.environ.get("ROWS", 1 << 25))
    slots = 32
    rng = np.random.default_rng(12345)
    table_np = {
        "price": rng.uniform(0.0, 100.0, n).astype(np.float32),
        "quantity": rng.integers(0, slots, n).astype(np.float32),
    }
    db = WarpDB(HostTable.from_dict(table_np))
    dup = HostTable.from_dict(
        {
            "quantity": np.tile(np.arange(slots, dtype=np.float32), 2),
            "bonus": rng.uniform(0.0, 1.0, 2 * slots).astype(np.float32),
        }
    )
    db.register_table("dup", dup)
    get_config().join_cache_entries = 0
    get_config().eager_join_aggregation = False

    sql = (
        "SELECT SUM(price * dup.bonus) FROM t "
        "JOIN dup ON quantity = dup.quantity "
        "GROUP BY quantity ORDER BY quantity ASC"
    )

    def timeit(fn, reps=5):
        fn()
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[len(ts) // 2], ts[0], ts[-1]

    # --- full query ---
    t_full = timeit(lambda: db.query_sql(sql))
    print(f"full      {t_full[0]*1e3:8.1f} ms  [{t_full[1]*1e3:.1f}, {t_full[2]*1e3:.1f}]")

    # --- join materialisation alone ---
    from warpdb_tpu.engine import join_exec
    from warpdb_tpu.frontend import parse_query_text

    ast = parse_query_text("SELECT price FROM t JOIN dup ON quantity = dup.quantity")
    cond = ast.joins[0].condition
    left = db.table
    right = db._catalog["dup"]
    needed = {"price", "quantity", "dup.bonus", "dup.quantity", "bonus"}

    def join_only():
        out = join_exec._materialize_join(left, right, "dup", cond, needed=needed)
        # force one scalar to host
        float(out.columns["price"][0])
        return out

    t_join = timeit(join_only)
    print(f"join      {t_join[0]*1e3:8.1f} ms  [{t_join[1]*1e3:.1f}, {t_join[2]*1e3:.1f}]")

    # --- phase1 alone (replicating _materialize_join_local's prologue) ---
    from warpdb_tpu.engine.compiler import get_or_compile, schema_signature
    from warpdb_tpu.engine.join_exec import (
        _join_key_pair, _next_pow2, _resolve_join_sides,
        _translated_right_key,
    )
    from warpdb_tpu.ops.join import join_match_counts_dense

    pairs = join_exec._equality_pairs(cond)
    lkeys, rkeys = [], []
    for lv, rv in _resolve_join_sides(left, right, "dup", pairs):
        lraw, rraw = _translated_right_key(left, right, lv, rv)
        lk, rk = _join_key_pair(lraw, rraw)
        lkeys.append(lk)
        rkeys.append(rk)
    dense_k = max(_next_pow2(max(right.num_rows, 1)), 8)
    print(f"dense_k = {dense_k}")

    @jax.jit
    def phase1(lks, rks, n_left, n_right):
        lmask = jnp.arange(lks[0].shape[0], dtype=jnp.int32) < n_left
        rmask = jnp.arange(rks[0].shape[0], dtype=jnp.int32) < n_right
        p1 = join_match_counts_dense(lks[0], lmask, rks[0], rmask, dense_k)
        return p1

    def phase1_only():
        p1 = phase1(tuple(lkeys), tuple(rkeys),
                    jnp.int32(left.num_rows), jnp.int32(right.num_rows))
        return int(p1.total)

    t_p1 = timeit(phase1_only)
    print(f"phase1    {t_p1[0]*1e3:8.1f} ms  [{t_p1[1]*1e3:.1f}, {t_p1[2]*1e3:.1f}]")

    # --- gate (span check) given phase1 ---
    p1 = phase1(tuple(lkeys), tuple(rkeys),
                jnp.int32(left.num_rows), jnp.int32(right.num_rows))
    total = int(p1.total)
    capacity = max(_next_pow2(total), 1024)
    print(f"total = {total}, capacity = {capacity}")

    from warpdb_tpu.ops.pallas_expand import (
        expand_block_owners, expand_spans_ok, windowed_expand,
    )

    @jax.jit
    def gate(p1, n_left):
        offsets = jnp.cumsum(p1.counts) - p1.counts
        tot = jnp.sum(p1.counts)
        p_lo, p_last = expand_block_owners(offsets, capacity, tot)
        return expand_spans_ok(p_lo, p_last)

    t_gate = timeit(lambda: bool(jax.device_get(gate(p1, jnp.int32(left.num_rows)))))
    print(f"gate      {t_gate[0]*1e3:8.1f} ms  [{t_gate[1]*1e3:.1f}, {t_gate[2]*1e3:.1f}]")

    # --- fused windowed expand alone ---
    lcols = (left.columns["price"], left.columns["quantity"])

    @jax.jit
    def expand_only(p1, lcols):
        offsets = jnp.cumsum(p1.counts) - p1.counts
        tot = jnp.sum(p1.counts)
        pidx, off_r, taken = windowed_expand(
            offsets, tuple(lcols) + (p1.lo,), capacity, total=tot
        )
        return taken[0][0]

    t_exp = timeit(lambda: float(expand_only(p1, lcols)))
    print(f"expand    {t_exp[0]*1e3:8.1f} ms  [{t_exp[1]*1e3:.1f}, {t_exp[2]*1e3:.1f}]")

    # --- build-side sweep alone ---
    from warpdb_tpu.ops.join import dense_select_sweep

    @jax.jit
    def sweep_only(p1, rcols):
        r = jnp.arange(capacity, dtype=jnp.int32)
        valid = r < jnp.int32(total)
        slot = jnp.clip(r % right.padded_rows, 0, p1.build_order.shape[0] - 1)
        taken = dense_select_sweep(
            tuple(c[p1.build_order] for c in rcols), slot, valid, dense_k
        )
        return taken[0][0]

    rcols = (right.columns["bonus"], right.columns["quantity"])
    t_sw = timeit(lambda: float(sweep_only(p1, rcols)))
    print(f"sweep     {t_sw[0]*1e3:8.1f} ms  [{t_sw[1]*1e3:.1f}, {t_sw[2]*1e3:.1f}]")

    # --- group-by finish on the joined table ---
    joined = join_exec._materialize_join(left, right, "dup", cond, needed=needed)
    db2 = WarpDB.__new__(WarpDB)
    db2.__dict__.update(db.__dict__)
    db2._table = joined
    try:
        from warpdb_tpu.api import Catalog
        db2._catalog = Catalog({"t": joined, "dup": right})
    except Exception:
        pass
    sql2 = ("SELECT SUM(price * bonus) FROM t "
            "GROUP BY quantity ORDER BY quantity ASC")
    t_grp = timeit(lambda: db2.query_sql(sql2))
    print(f"groupfin  {t_grp[0]*1e3:8.1f} ms  [{t_grp[1]*1e3:.1f}, {t_grp[2]*1e3:.1f}]")

    print(f"\nrows/s (full, probe rows): {n / t_full[0]/1e6:.1f} M")


if __name__ == "__main__":
    main()
