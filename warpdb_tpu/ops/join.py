"""Inner equi-join.

The reference *parses* multi-join syntax (expression.cpp:375-401) but
never executes a join ("loads the same table for demonstration",
warpdb.hpp:22-23).  This operator makes JOIN real, TPU-style.

Design — sorted-probe join with a two-phase static-shape protocol
(SURVEY.md §7 "hard parts": dynamic result shapes on XLA):

* phase 1 (``join_match_counts``): sort the build side once, binary-search
  every probe key (``searchsorted`` — lane-parallel on the VPU) for its
  duplicate range, and return the total match count;
* the host picks an output capacity bucket (next power of two ≥ total —
  so at most log₂ distinct compilations);
* phase 2 (``join_gather_indices``): each output slot r finds its probe
  row by binary-searching the match-offset prefix sum, then its j-th
  duplicate inside the build range.  Emits (probe_idx, build_idx) pairs
  in probe-row order — deterministic, no atomics.

Row-major gather of the payload columns happens in the caller so columns
are only materialised once per output table.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from .sort import float_sort_key

__all__ = ["join_match_counts", "join_gather_indices", "JoinPhase1"]

_U32_MAX = jnp.uint32(0xFFFFFFFF)


class JoinPhase1(NamedTuple):
    build_order: jax.Array   # i32[n_build] — original index of sorted build rows
    build_sorted: jax.Array  # u32[n_build] — sorted build sort-keys
    lo: jax.Array            # i32[n_probe] — first matching build slot per probe row
    counts: jax.Array        # i32[n_probe] — matches per probe row
    total: jax.Array         # i32 scalar — total matched pairs


def join_match_counts(
    probe_keys: jax.Array,
    probe_mask: jax.Array,
    build_keys: jax.Array,
    build_mask: jax.Array,
) -> JoinPhase1:
    """Phase 1: sort build side, count matches per probe row."""
    bkey = jnp.where(build_mask, float_sort_key(build_keys), _U32_MAX)
    n_build = build_keys.shape[0]
    order = jnp.arange(n_build, dtype=jnp.int32)
    bkey_s, order_s = lax.sort((bkey, order), num_keys=1, is_stable=True)

    pkey = float_sort_key(probe_keys)
    lo = jnp.searchsorted(bkey_s, pkey, side="left").astype(jnp.int32)
    hi = jnp.searchsorted(bkey_s, pkey, side="right").astype(jnp.int32)
    counts = jnp.where(probe_mask, hi - lo, 0)
    total = jnp.sum(counts)
    return JoinPhase1(order_s, bkey_s, lo, counts, total)


def join_gather_indices(phase1: JoinPhase1, capacity: int):
    """Phase 2: expand matches into (probe_idx, build_idx) pairs.

    Returns ``(probe_idx[capacity], build_idx[capacity], valid[capacity])``
    ordered by probe row (then build duplicate order) — deterministic.
    """
    counts = phase1.counts
    offsets = jnp.cumsum(counts) - counts  # exclusive prefix sum
    ends = offsets + counts

    r = jnp.arange(capacity, dtype=jnp.int32)
    # probe row owning output slot r: last row whose start offset ≤ r.
    probe_idx = (
        jnp.searchsorted(ends, r, side="right").astype(jnp.int32)
    )
    n_probe = counts.shape[0]
    probe_idx = jnp.minimum(probe_idx, n_probe - 1)
    dup_j = r - offsets[probe_idx]
    slot = phase1.lo[probe_idx] + dup_j
    n_build = phase1.build_order.shape[0]
    slot = jnp.clip(slot, 0, n_build - 1)
    build_idx = phase1.build_order[slot]
    valid = r < phase1.total
    probe_idx = jnp.where(valid, probe_idx, 0)
    build_idx = jnp.where(valid, build_idx, 0)
    return probe_idx, build_idx, valid
