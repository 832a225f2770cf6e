"""Pallas TPU kernel: windowed gather at a nondecreasing index.

The expansion join's dominant cost is gathering the probe columns at the
capacity-sized ``probe_idx`` (ops/join.join_gather_indices): a random
take costs ~20 ns/row at 2^26 — ~1000x off the HBM roofline — because
TPU gathers pay per-row overhead (DESIGN.md §2).  But ``probe_idx`` is
NONDECREASING (expansion output is ordered by probe row), so each
1024-lane output block reads from a small contiguous source window.
This kernel exploits that:

* a scalar-prefetched per-block base (``idx[block_start] // 1024``)
  drives the BlockSpec index maps, so each grid step DMAs exactly two
  consecutive 1024-row source blocks HBM→VMEM (sequential traffic, no
  per-row addressing);
* within the 2048-row VMEM window, selection is an MXU one-hot matmul —
  the same fused-one-hot trick as ops/pallas_group — with NO per-lane
  dynamic indexing (the construct that crashes Mosaic, DESIGN.md §4);
* exactness: the f32/i32 source columns are pre-split into four
  bf16-held BYTE planes (each byte 0..255 is exact in bf16); the one-hot
  matmul picks one byte per row exactly (0/1 · byte, f32 accumulate),
  and the bytes reassemble with integer shifts — the gathered bits are
  reproduced EXACTLY, not to rounding.

Contract: every 1024-lane output block must satisfy
``idx[last] - idx[first] < 1024`` (then the 2048 window covers it).
``spans_ok`` checks this on device; callers ``lax.cond`` between this
kernel and the general stacked take — dense expansions (every probe row
matching, the common inner-join shape) always pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "windowed_sorted_take", "spans_ok", "supported",
    "windowed_expand", "expand_spans_ok",
    "uniform_expand", "uniform_expand_supported",
]

_BLK = 1024


def supported(n_idx: int, n_src: int) -> bool:
    """Static shape gate: lane-divisible index, lane-divisible source
    (device tables are always 1024-padded)."""
    return n_idx % _BLK == 0 and n_src % _BLK == 0 and n_src >= _BLK


def spans_ok(idx: jax.Array) -> jax.Array:
    """Device check of the per-block span contract (scalar bool)."""
    blocks = idx.reshape(-1, _BLK)
    return jnp.all(blocks[:, -1] - blocks[:, 0] < _BLK)


def _kernel(bases_ref, idx_ref, plo_ref, phi_ref, out_ref, *, c_cols):
    import jax.experimental.pallas as pl

    i = pl.program_id(0)
    base = bases_ref[i]
    idx = idx_ref[0, 0, :]
    # Local offset into the 2048-row VMEM window.  The clip only fires
    # outside the spans_ok contract (callers route those to the general
    # take), so it guards against OOB, never correctness.
    li = jnp.clip(idx - base * _BLK, 0, 2 * _BLK - 1)
    window = jnp.concatenate([plo_ref[...], phi_ref[...]], axis=1)
    # One-hot select: (4C, 2048) byte planes @ (2048, 1024) one-hot.
    sel = (
        li[None, :]
        == lax.broadcasted_iota(jnp.int32, (2 * _BLK, _BLK), 0)
    ).astype(jnp.bfloat16)
    dn = (((1,), (0,)), ((), ()))
    by = lax.dot_general(
        window, sel, dn, preferred_element_type=jnp.float32
    ).astype(jnp.int32)
    for c in range(c_cols):
        out_ref[c, :] = (
            by[4 * c]
            | (by[4 * c + 1] << 8)
            | (by[4 * c + 2] << 16)
            | (by[4 * c + 3] << 24)
        )


@functools.partial(jax.jit, static_argnames=("interpret",))
def windowed_sorted_take(cols, idx, valid, interpret: bool = False):
    """Gather C 4-byte columns at nondecreasing ``idx`` (see module
    docstring for the span contract).  Same signature/result as
    ``ops.join.stacked_take``: invalid slots zero."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    cols = tuple(cols)
    c_cols = len(cols)
    n_idx = idx.shape[0]
    n_src = cols[0].shape[0]
    steps = n_idx // _BLK

    # Byte planes, bf16-held (exact for 0..255): (4C, n_src + pad).
    # One extra zero block keeps ``base + 1`` in range for every base.
    bits = jnp.stack(
        [lax.bitcast_convert_type(c, jnp.uint32).astype(jnp.int32)
         for c in cols],
        axis=0,
    )
    planes = jnp.concatenate(
        [
            ((bits >> shift) & 0xFF).astype(jnp.bfloat16)
            for shift in (0, 8, 16, 24)
        ],
        axis=0,
    ).reshape(4, c_cols, n_src).transpose(1, 0, 2).reshape(4 * c_cols, n_src)
    planes = jnp.pad(planes, ((0, 0), (0, _BLK)))

    idx3 = idx.astype(jnp.int32).reshape(steps, 1, _BLK)
    first = idx3[:, 0, 0]
    bases = jnp.clip(first // _BLK, 0, n_src // _BLK - 1).astype(jnp.int32)

    kernel = functools.partial(_kernel, c_cols=c_cols)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((1, 1, _BLK), lambda i, b: (i, 0, 0)),
            pl.BlockSpec((4 * c_cols, _BLK), lambda i, b: (0, b[i])),
            pl.BlockSpec((4 * c_cols, _BLK), lambda i, b: (0, b[i] + 1)),
        ],
        out_specs=pl.BlockSpec((c_cols, _BLK), lambda i, b: (0, i)),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((c_cols, n_idx), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_idx * 2 * _BLK * 4 * c_cols,
            bytes_accessed=n_idx * (4 + 8 * c_cols) + n_idx * 4 * c_cols,
            transcendentals=0,
        ),
        interpret=interpret,
    )(bases, idx3, planes, planes)

    out = jnp.where(valid[None, :], out, jnp.int32(0))
    return tuple(
        lax.bitcast_convert_type(out[i], c.dtype)
        for i, c in enumerate(cols)
    )


# ---------------------------------------------------------------------------
# Fused expansion: ownership-by-counting + windowed gather in ONE pass
# ---------------------------------------------------------------------------


def _expand_kernel(plo_ref, off_lo, off_hi, pl_lo, pl_hi, out_ref, *,
                   c_cols):
    import jax.experimental.pallas as pl

    i = pl.program_id(0)
    q = plo_ref[i] // _BLK
    pos = i * _BLK + lax.broadcasted_iota(jnp.int32, (_BLK,), 0)
    w = jnp.concatenate([off_lo[0, :], off_hi[0, :]], axis=0)  # (2048,)
    # Ownership by counting: the owner of output position ``pos`` is the
    # LAST probe row whose exclusive start offset is ≤ pos (zero-count
    # rows tie on offsets and never end up last — see windowed_expand).
    # Every row before the window also satisfies offset ≤ pos (offsets
    # are monotone and the window anchor p_lo//1024 starts at or before
    # the block's first owner), so counting within the window gives the
    # owner's window-local index directly.
    le = (
        w[:, None] <= pos[None, :]
    )  # (2048, 1024)
    cnt = jnp.sum(le.astype(jnp.int32), axis=0)
    local = jnp.clip(cnt - 1, 0, 2 * _BLK - 1)
    window = jnp.concatenate([pl_lo[...], pl_hi[...]], axis=1)
    sel = (
        local[None, :]
        == lax.broadcasted_iota(jnp.int32, (2 * _BLK, _BLK), 0)
    ).astype(jnp.bfloat16)
    dn = (((1,), (0,)), ((), ()))
    by = lax.dot_general(
        window, sel, dn, preferred_element_type=jnp.float32
    ).astype(jnp.int32)
    for c in range(c_cols):
        out_ref[c, :] = (
            by[4 * c]
            | (by[4 * c + 1] << 8)
            | (by[4 * c + 2] << 16)
            | (by[4 * c + 3] << 24)
        )
    out_ref[c_cols, :] = q * _BLK + local


def expand_block_owners(offsets: jax.Array, capacity: int, total) -> tuple:
    """Owner probe row of each output block's first position (positions
    past ``total`` clamp to the last real output, so tail blocks anchor
    at the final owner), plus the owner of the LAST real output.
    ``searchsorted(offsets, pos, 'right') - 1``: 65K needles over 2^25
    rows — searchsorted's per-needle cost (DESIGN.md bans it at 2^24
    NEEDLES) is fine at needle counts 512x smaller, and nothing
    sort-free computes a monotone partition point cheaper."""
    steps = capacity // _BLK
    last = jnp.maximum(jnp.asarray(total, jnp.int32) - 1, 0)
    nb = jnp.minimum(
        jnp.arange(steps + 1, dtype=jnp.int32) * _BLK, last
    )
    p_all = (
        jnp.searchsorted(
            offsets.astype(jnp.int32), nb, side="right"
        ).astype(jnp.int32)
        - 1
    )
    p_all = jnp.clip(p_all, 0, offsets.shape[0] - 1)
    return p_all[:-1], p_all[-1]


def expand_spans_ok(p_lo: jax.Array, p_last: jax.Array) -> jax.Array:
    """Device check of the fused-expansion window contract: every output
    block's owner rows fit the 2048-row window anchored at
    ``p_lo//1024`` — i.e. consecutive block anchors (and the final
    owner) advance < 1024 rows.  Dense expansions (every probe row
    emitting ≥ 1 output) always pass; sparse matches (many zero-count
    rows between owners) may not."""
    nxt = jnp.concatenate([p_lo[1:], p_last.reshape(1)])
    return jnp.all(nxt - p_lo < _BLK)


@functools.partial(
    jax.jit, static_argnames=("capacity", "interpret")
)
def windowed_expand(offsets, cols, capacity: int, total=None,
                    interpret: bool = False):
    """Fused expansion-join metadata + gather: for each output position
    r in [0, capacity), find its owner probe row (the last row with
    exclusive start offset ≤ r) and gather every array in ``cols`` (plus
    ``offsets`` itself) at that row — replacing BOTH the
    scatter-at-starts + cummax forward fill AND the capacity-sized
    random take of the two-phase expansion (ops/join.join_gather_indices
    + stacked_take).

    Returns ``(probe_idx i32[capacity], off_r i32[capacity],
    taken tuple per col)``.  Caller contract: ``offsets`` monotone
    exclusive prefix sums padded so one extra 1024 block exists past the
    last real row, and ``expand_spans_ok`` verified True (the host
    decides before compiling this path — no traced branch).  Invalid
    tail positions (≥ total) return clipped garbage the caller masks.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    cols = tuple(cols)
    c_cols = len(cols) + 1  # + offsets (off_r output)
    n_probe = offsets.shape[0]
    steps = capacity // _BLK

    off32 = offsets.astype(jnp.int32)
    if total is None:
        total = off32[-1]  # padding rows carry offset == total
    p_lo, _p_last = expand_block_owners(off32, capacity, total)

    bits = jnp.stack(
        [
            lax.bitcast_convert_type(c, jnp.uint32).astype(jnp.int32)
            for c in (*cols, off32)
        ],
        axis=0,
    )
    planes = jnp.concatenate(
        [
            ((bits >> shift) & 0xFF).astype(jnp.bfloat16)
            for shift in (0, 8, 16, 24)
        ],
        axis=0,
    ).reshape(4, c_cols, n_probe).transpose(1, 0, 2).reshape(
        4 * c_cols, n_probe
    )
    planes = jnp.pad(planes, ((0, 0), (0, _BLK)))
    # Offsets window: padding rows read a sentinel ABOVE every position
    # so they never count as owners.
    off_pad = jnp.pad(
        off32.reshape(1, n_probe), ((0, 0), (0, _BLK)),
        constant_values=2**31 - 1,
    )

    kernel = functools.partial(_expand_kernel, c_cols=c_cols)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((1, _BLK), lambda i, p: (0, p[i] // _BLK)),
            pl.BlockSpec((1, _BLK), lambda i, p: (0, p[i] // _BLK + 1)),
            pl.BlockSpec((4 * c_cols, _BLK), lambda i, p: (0, p[i] // _BLK)),
            pl.BlockSpec(
                (4 * c_cols, _BLK), lambda i, p: (0, p[i] // _BLK + 1)
            ),
        ],
        out_specs=pl.BlockSpec((c_cols + 1, _BLK), lambda i, p: (0, i)),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((c_cols + 1, capacity), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * capacity * 2 * _BLK * (4 * c_cols + 1),
            bytes_accessed=capacity * (8 * c_cols + 8),
            transcendentals=0,
        ),
        interpret=interpret,
    )(p_lo, off_pad, off_pad, planes, planes)

    probe_idx = jnp.clip(out[c_cols], 0, n_probe - 1)
    off_r = out[c_cols - 1]
    taken = tuple(
        lax.bitcast_convert_type(out[i], c.dtype)
        for i, c in enumerate(cols)
    )
    return probe_idx, off_r, taken


# ---------------------------------------------------------------------------
# Uniform fan-out expansion: constant selection, zero per-block index work
# ---------------------------------------------------------------------------


def uniform_expand_supported(k: int, capacity: int, n_src: int) -> bool:
    """Static gate for :func:`uniform_expand`: fan-out k ∈ {2, 4, 8}
    (k | 1024 with a ≥128-lane source block), 1024-aligned shapes, and
    the whole output addressable within the source (capacity ≤ n_src·k —
    always true when capacity = next_pow2(total ≤ n_valid·k) and n_src
    is the pow2-padded probe length)."""
    return (
        k in (2, 4, 8)
        and capacity % _BLK == 0
        and n_src % _BLK == 0
        and capacity <= n_src * k
    )


def _uniform_kernel(planes_ref, sel_ref, out_ref, *, c_cols):
    dn = (((1,), (0,)), ((), ()))
    by = lax.dot_general(
        planes_ref[...], sel_ref[...], dn,
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32)
    for c in range(c_cols):
        out_ref[c, :] = (
            by[4 * c]
            | (by[4 * c + 1] << 8)
            | (by[4 * c + 2] << 16)
            | (by[4 * c + 3] << 24)
        )


@functools.partial(
    jax.jit, static_argnames=("k", "capacity", "interpret")
)
def uniform_expand(cols, k: int, capacity: int, interpret: bool = False):
    """Expansion gather for UNIFORM fan-out: every output position r in
    [0, capacity) takes ``col[r // k]`` — the inner-join expansion when
    every valid probe row matches exactly k build rows (fixed-fan-out
    dimension joins; detected from phase1's count min == max).

    The general :func:`windowed_expand` pays, per 1024-lane block, an
    ownership compare-reduce, a one-hot generation over a 2048-row
    window, and a scalar-prefetched anchor from a host-synced
    searchsorted gate.  Under uniform k ALL of that is analytic:
    output block i reads exactly source lanes [i·B, (i+1)·B), B =
    1024/k — a static index map, no gate, no scalar prefetch — and the
    in-window selection matrix sel[s, l] = (s == l//k) is the SAME for
    every block, so it is built once in XLA and stays VMEM-resident
    (constant index map).  The kernel body is one byte-plane matmul:
    (4C, B) @ (B, 1024) per block.  Measured (v5e, 2^25 probe rows,
    k=2, C=3): 232 ms (windowed) → ~30 ms.

    Exactness: the same byte-plane argument as the module docstring —
    bf16 holds 0..255 exactly, the one-hot picks one byte per row under
    f32 accumulation, integer shifts reassemble the original 32 bits.

    Returns the taken tuple only (ownership is ``r // k`` and the
    duplicate index ``r % k`` — callers compute both analytically).
    Positions ≥ total read padded-source garbage the caller masks.
    """
    import jax.experimental.pallas as pl

    cols = tuple(cols)
    c_cols = len(cols)
    n_src = cols[0].shape[0]
    B = _BLK // k
    steps = capacity // _BLK

    bits = jnp.stack(
        [
            lax.bitcast_convert_type(c, jnp.uint32).astype(jnp.int32)
            for c in cols
        ],
        axis=0,
    )
    planes = jnp.concatenate(
        [
            ((bits >> shift) & 0xFF).astype(jnp.bfloat16)
            for shift in (0, 8, 16, 24)
        ],
        axis=0,
    ).reshape(4, c_cols, n_src).transpose(1, 0, 2).reshape(
        4 * c_cols, n_src
    )
    sel = (
        lax.broadcasted_iota(jnp.int32, (B, _BLK), 0)
        == lax.broadcasted_iota(jnp.int32, (B, _BLK), 1) // k
    ).astype(jnp.bfloat16)

    kernel = functools.partial(_uniform_kernel, c_cols=c_cols)
    out = pl.pallas_call(
        kernel,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((4 * c_cols, B), lambda i: (0, i)),
            pl.BlockSpec((B, _BLK), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((c_cols, _BLK), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((c_cols, capacity), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * capacity * B * 4 * c_cols,
            bytes_accessed=capacity * 4 * c_cols + capacity // k * 8 * c_cols,
            transcendentals=0,
        ),
        interpret=interpret,
    )(planes, sel)

    return tuple(
        lax.bitcast_convert_type(out[i], c.dtype)
        for i, c in enumerate(cols)
    )
