"""Distributed inner equi-join: hash-partitioned all-to-all shuffle join.

BASELINE.md config #5 ("multi-host hash join + skew-aware distributed
shuffle") — and strictly beyond the reference, which parsed joins but
never executed them (warpdb.hpp:22-23), let alone distributed.

Inside one ``shard_map`` program per shard:

1. both relations partition their local rows by join-key hash
   (``hash(key) mod n_dev``) into equal-sized send buckets — same
   static-gather construction as the shuffle GROUP BY;
2. two ``all_to_all`` exchanges (one per side) co-locate every
   occurrence of a key on its owning device, payload columns riding
   along with the keys;
3. each device runs the local sorted-probe join (binary-searched
   duplicate ranges, prefix-sum expansion — ops/join.py) over the rows
   it now owns, emitting joined payload columns into a fixed-capacity
   buffer with a validity count.

Overflow of either the exchange buckets (skew) or the join output
capacity (duplicate blowup) is detected on device and retried with
doubled capacities — the two-phase static-shape protocol, distributed.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..engine.compiler import get_or_compile, schema_signature
from ..errors import ExecutionError
from ..ops.join import join_gather_indices, join_match_counts
from ..ops.sort import float_sort_key
from ..storage.table import DeviceTable
from .mesh import DATA_AXIS, data_mesh
from .sharded import _ensure_sharded

__all__ = ["distributed_join"]

_HASH_MULT = jnp.uint32(2654435761)


def _partition_exchange(keys, payloads, valid, n_dev, send_cap):
    """Bucket local rows by key hash and all_to_all them; returns
    (keys, payloads, valid, overflow) for the rows this device owns."""
    n_local = keys.shape[0]
    kbits = float_sort_key(keys)
    dest = ((kbits * _HASH_MULT) >> jnp.uint32(16)).astype(jnp.int32) % n_dev
    dest = jnp.where(valid, dest, n_dev)

    order = lax.sort(
        (dest, jnp.arange(n_local, dtype=jnp.int32)), num_keys=1, is_stable=True
    )[1]
    dest_sorted = dest[order]
    counts = jnp.zeros((n_dev + 1,), jnp.int32).at[dest_sorted].add(
        1, mode="drop"
    )[:n_dev]
    starts = jnp.cumsum(counts) - counts

    slot = jnp.arange(send_cap, dtype=jnp.int32)
    src = jnp.clip(starts[:, None] + slot[None, :], 0, n_local - 1)
    send_valid = slot[None, :] < counts[:, None]
    row_idx = order[src]

    send_keys = jnp.where(send_valid, keys[row_idx], 0.0)
    send_payloads = [jnp.where(send_valid, p[row_idx], 0.0) for p in payloads]
    overflow = jnp.max(counts) > send_cap

    recv_keys = lax.all_to_all(send_keys, DATA_AXIS, 0, 0, tiled=False)
    recv_valid = lax.all_to_all(
        send_valid.astype(jnp.int32), DATA_AXIS, 0, 0, tiled=False
    ).astype(jnp.bool_)
    recv_payloads = [
        lax.all_to_all(p, DATA_AXIS, 0, 0, tiled=False) for p in send_payloads
    ]
    return (
        recv_keys.reshape(-1),
        [p.reshape(-1) for p in recv_payloads],
        recv_valid.reshape(-1),
        overflow,
    )


def distributed_join(
    left: DeviceTable,
    right: DeviceTable,
    left_key_col: str,
    right_key_col: str,
    left_payload: Sequence[str],
    right_payload: Sequence[str],
    mesh=None,
    overcommit: float = 2.0,
):
    """Inner equi-join of two row-sharded tables over the mesh.

    Returns a host dict: ``{col: np.ndarray}`` for the requested payload
    columns (left names as-is, right prefixed ``right.``), with matched
    pairs in hash-partition order (unordered, like any parallel hash
    join).  Capacities retry on overflow."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    if mesh is None:
        mesh = data_mesh()
    n_dev = int(mesh.devices.size)
    left = _ensure_sharded(left, mesh) if n_dev > 1 else left
    right = _ensure_sharded(right, mesh) if n_dev > 1 else right

    l_local = left.padded_rows // max(n_dev, 1)
    r_local = right.padded_rows // max(n_dev, 1)
    send_cap_l = max(128, int(np.ceil(l_local / max(n_dev, 1) * overcommit)))
    send_cap_r = max(128, int(np.ceil(r_local / max(n_dev, 1) * overcommit)))
    out_cap = max(1024, int(l_local * overcommit))

    lp = tuple(left_payload)
    rp = tuple(right_payload)

    for attempt in range(4):
        key = (
            "dist_join", left_key_col, right_key_col, lp, rp,
            schema_signature(left.columns), schema_signature(right.columns),
            n_dev, send_cap_l, send_cap_r, out_cap,
        )

        def build():
            def body(lcols, rcols, n_left, n_right):
                n_l = next(iter(lcols.values())).shape[0]
                n_r = next(iter(rcols.values())).shape[0]
                shard = lax.axis_index(DATA_AXIS).astype(jnp.int32)
                l_valid = shard * n_l + jnp.arange(n_l, dtype=jnp.int32) < n_left
                r_valid = shard * n_r + jnp.arange(n_r, dtype=jnp.int32) < n_right

                lk, lpay, lv, ovl = _partition_exchange(
                    lcols[left_key_col].astype(jnp.float32),
                    [lcols[c].astype(jnp.float32) for c in lp],
                    l_valid, n_dev, send_cap_l,
                )
                rk, rpay, rv, ovr = _partition_exchange(
                    rcols[right_key_col].astype(jnp.float32),
                    [rcols[c].astype(jnp.float32) for c in rp],
                    r_valid, n_dev, send_cap_r,
                )

                phase1 = join_match_counts(lk, lv, rk, rv)
                probe_idx, build_idx, pair_valid = join_gather_indices(
                    phase1, out_cap
                )
                out_overflow = phase1.total > out_cap

                from ..ops.join import stacked_take

                out_cols = (
                    stacked_take(lpay, probe_idx, pair_valid)
                    + stacked_take(rpay, build_idx, pair_valid)
                )
                count = jnp.minimum(phase1.total, out_cap)
                overflow = jnp.logical_or(jnp.logical_or(ovl, ovr), out_overflow)
                return (
                    tuple(c[None] for c in out_cols),
                    count[None],
                    overflow[None],
                )

            fn = shard_map(
                body,
                mesh=mesh,
                in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(), P()),
                out_specs=(
                    tuple(P(DATA_AXIS) for _ in lp + rp),
                    P(DATA_AXIS),
                    P(DATA_AXIS),
                ),
                check_vma=False,
            )
            return jax.jit(fn)

        cols_s, counts_s, overflow_s = jax.device_get(
            get_or_compile(key, build)(
                left.columns, right.columns,
                jnp.int32(left.num_rows), jnp.int32(right.num_rows),
            )
        )
        if bool(np.any(overflow_s)):
            send_cap_l *= 2
            send_cap_r *= 2
            out_cap *= 2
            continue

        names = list(lp) + [f"right.{c}" for c in rp]
        out = {name: [] for name in names}
        for d in range(n_dev):
            c = int(counts_s[d])
            for i, name in enumerate(names):
                out[name].append(cols_s[i][d, :c])
        return {name: np.concatenate(parts) for name, parts in out.items()}

    raise ExecutionError(
        "distributed_join: capacity overflow persisted after retries "
        "(pathological key skew)"
    )
