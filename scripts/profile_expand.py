"""Stage-by-stage profile of the expansion join (VERDICT r3 #5).

Reconstructs bench.py's e2e_join_expand pipeline with forced host syncs
between stages so the relay-opaque device time decomposes:

  A  phase1 (dense (N,K) sweep) + count sync
  B  fused-window gate (expand_block_owners + spans check) + bool sync
  C  windowed_expand byte-plane prep (traced separately)
  D  windowed_expand full (prep + Pallas kernel + post masks)
  E  build-side dense_select_sweep at capacity
  F  dense GROUP BY over the capacity-sized joined columns
  X  the real engine e2e (db.query_sql) for reference

Each stage is median of 5 (one warm first).  Syncs force a scalar (or
one element) to host — block_until_ready does not sync on the relay.
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, "/root/repo")

from warpdb_tpu import WarpDB
from warpdb_tpu.config import get_config
from warpdb_tpu.ops.join import (
    dense_select_sweep,
    join_match_counts_dense,
)
from warpdb_tpu.ops.pallas_expand import (
    expand_block_owners,
    expand_spans_ok,
    windowed_expand,
)
from warpdb_tpu.ops.sort import sort_key_any  # noqa: F401  (parity import)
from warpdb_tpu.storage import HostTable

N = 1 << 25
GROUP_SLOTS = 32
K = 64  # dup table rows (2 dups per key)
REPEATS = 5


def timed(name, fn):
    fn()
    ts = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    med = ts[REPEATS // 2]
    print(f"{name:<44s} {med*1e3:9.1f} ms   (min {ts[0]*1e3:7.1f}, max {ts[-1]*1e3:7.1f})")
    return med


def main():
    rng = np.random.default_rng(12345)
    table_np = {
        "price": rng.uniform(0.0, 100.0, N).astype(np.float32),
        "quantity": rng.integers(0, GROUP_SLOTS, N).astype(np.float32),
    }
    db = WarpDB(HostTable.from_dict(table_np))
    dup = HostTable.from_dict(
        {
            "quantity": np.tile(np.arange(GROUP_SLOTS, dtype=np.float32), 2),
            "bonus": rng.uniform(0.0, 1.0, 2 * GROUP_SLOTS).astype(np.float32),
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
    t_e2e = timed("X  engine e2e query_sql", lambda: db.query_sql(sql))

    left = db.table  # DeviceTable
    price = left.columns["price"]
    quantity = left.columns["quantity"]
    n_pad = price.shape[0]
    bkey = jnp.asarray(np.tile(np.arange(GROUP_SLOTS, dtype=np.float32), 2))
    bkey = jnp.pad(bkey, (0, 1024 - 2 * GROUP_SLOTS))
    bonus = jnp.asarray(
        np.asarray(dup.require_column("bonus").data, np.float32)
    )
    bonus = jnp.pad(bonus, (0, 1024 - 2 * GROUP_SLOTS))

    # --- A: phase1 dense sweep + count sync -------------------------------
    @jax.jit
    def phase1_fn(pk, bk):
        pmask = jnp.arange(pk.shape[0], dtype=jnp.int32) < N
        bmask = jnp.arange(bk.shape[0], dtype=jnp.int32) < 2 * GROUP_SLOTS
        p1 = join_match_counts_dense(pk, pmask, bk, bmask, K)
        return p1

    def run_a():
        p1 = phase1_fn(quantity, bkey)
        return int(p1.total)

    timed("A  phase1 dense sweep + total sync", run_a)
    p1 = phase1_fn(quantity, bkey)
    total = int(p1.total)
    capacity = 1 << (int(np.ceil(np.log2(max(total, 1024)))))
    print(f"   total={total}  capacity={capacity}")

    # --- B: gate ------------------------------------------------------------
    @jax.jit
    def gate_fn(p1):
        offsets = jnp.cumsum(p1.counts) - p1.counts
        tot = jnp.sum(p1.counts)
        p_lo, p_last = expand_block_owners(offsets, capacity, tot)
        return expand_spans_ok(p_lo, p_last)

    timed("B  fused-window gate + bool sync", lambda: bool(gate_fn(p1)))

    # --- C: byte-plane prep only --------------------------------------------
    @jax.jit
    def prep_fn(p1, price, quantity):
        counts = p1.counts
        offsets = jnp.cumsum(counts) - counts
        cols = (price, quantity, p1.lo)
        c_cols = len(cols) + 1
        off32 = offsets.astype(jnp.int32)
        bits = jnp.stack(
            [lax.bitcast_convert_type(c, jnp.uint32).astype(jnp.int32)
             for c in (*cols, off32)],
            axis=0,
        )
        planes = jnp.concatenate(
            [((bits >> s) & 0xFF).astype(jnp.bfloat16) for s in (0, 8, 16, 24)],
            axis=0,
        ).reshape(4, c_cols, n_pad).transpose(1, 0, 2).reshape(4 * c_cols, n_pad)
        return planes

    def run_c():
        pl = prep_fn(p1, price, quantity)
        return jax.device_get(pl[0, :1])

    timed("C  byte-plane prep (3 cols + offsets)", run_c)

    # --- D: full windowed_expand --------------------------------------------
    @jax.jit
    def expand_fn(p1, price, quantity):
        counts = p1.counts
        offsets = jnp.cumsum(counts) - counts
        tot = jnp.sum(counts)
        pidx, off_r, taken = windowed_expand(
            offsets, (price, quantity, p1.lo), capacity, total=tot
        )
        return pidx, off_r, taken

    def run_d():
        pidx, off_r, taken = expand_fn(p1, price, quantity)
        return jax.device_get(taken[0][:1])

    timed("D  windowed_expand full (prep+kernel)", run_d)

    # --- E: build-side dense sweep at capacity --------------------------------
    pidx, off_r, taken = expand_fn(p1, price, quantity)
    r = jnp.arange(capacity, dtype=jnp.int32)

    @jax.jit
    def build_side(p1, taken_lo, off_r):
        valid = r < p1.total
        dup_j = r - off_r
        slot = jnp.clip(taken_lo + dup_j, 0, p1.build_order.shape[0] - 1)
        slot = jnp.where(valid, slot, 0)
        (b,) = dense_select_sweep(
            (bonus[p1.build_order],), slot, valid, K
        )
        return b

    def run_e():
        b = build_side(p1, taken[2], off_r)
        return jax.device_get(b[:1])

    timed("E  build-side dense_select_sweep @cap", run_e)

    # --- F: dense GROUP BY over capacity ---------------------------------------
    from warpdb_tpu.ops.aggregate import dense_group_aggregate

    b = build_side(p1, taken[2], off_r)

    @jax.jit
    def group_fn(q, pr, b, tot):
        valid = jnp.arange(capacity, dtype=jnp.int32) < tot
        g = dense_group_aggregate(
            q, (pr * b,), valid, 0, GROUP_SLOTS, need=("sum",)
        )
        return g.values[0].sums

    def run_f():
        s = group_fn(taken[1], taken[0], b, p1.total)
        return jax.device_get(s[:1])

    timed("F  dense GROUP BY @capacity", run_f)

    # --- D2: windowed_expand kernel only (pre-built planes) --------------------
    print(f"\n   e2e rows/s: {N / t_e2e / 1e6:.1f} M (input rows)")


if __name__ == "__main__":
    main()
