"""Pallas TPU kernel: dense histogram + per-slot sums on the MXU.

The midrange GROUP BY's MXU engine computes, for stats-bounded integer
group ids, ``counts2d = onehot(gid_hi)ᵀ @ onehot(gid_lo)`` — a factorized
one-hot contraction whose (GHI, GLO) result is the dense histogram, with
value sums riding the same contraction (see
ops/aggregate._mxu_counts_sums, the portable XLA formulation).

The XLA version materialises the (chunk, GHI)/(chunk, GLO) one-hot
operands through HBM: ~(GHI+GLO)·2 bytes of traffic per input row versus
the 8 bytes of actual data — a ~100× write amplification that caps the
whole aggregation at ~90 M rows/s on v5e.  This kernel fuses one-hot
generation into the matmul pipeline: ids and values stream HBM→VMEM once,
the one-hots are built in VMEM by iota comparison (VPU), and the MXU
accumulates into a VMEM-resident (GHI, GLO) table revisited across the
sequential grid.  HBM traffic drops to exactly the input read.

Precision: one-hot entries are 0/1 (exact in bf16) and the MXU
accumulates in f32, so counts are exact per chunk; the i32 carry across
grid steps keeps totals exact past f32's 2^24 integer ceiling.  Value
sums use a 3-term bf16 split of each f32 value (hi/mid/lo mantissa
parts); scaling the 0/1 one-hot by each part is exact, so the three
accumulated contractions reproduce f32-grade sums (~2^-24 relative).

Reference lineage: this replaces the single-GPU-thread O(N·G) scan the
reference used for GROUP BY (jit.cpp:179-246) at the cardinality tier
where neither the VPU dense sweep nor sorts are the right tool.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["pallas_group_counts_sums", "supported_chunk"]


def supported_chunk(n: int) -> int:
    """Rows per grid step: largest supported power of two dividing ``n``
    (0 = shape unsupported, caller falls back to the XLA formulation)."""
    for c in (4096, 2048, 1024):
        if n % c == 0 and n >= c:
            return c
    return 0


def _kernel(gid_ref, val_ref, cnt_ref, sum_ref, *, ghi, glo, nv):
    import jax.experimental.pallas as pl

    @pl.when(pl.program_id(0) == 0)
    def _():
        cnt_ref[...] = jnp.zeros_like(cnt_ref)
        if nv:
            sum_ref[...] = jnp.zeros_like(sum_ref)

    g = gid_ref[0, 0, :]
    hi = g // glo
    lo = jnp.where(g < ghi * glo, g % glo, glo)  # invalid rows match nothing
    c = g.shape[0]
    a16 = (
        hi[:, None] == jax.lax.broadcasted_iota(jnp.int32, (c, ghi), 1)
    ).astype(jnp.bfloat16)
    b16 = (
        lo[:, None] == jax.lax.broadcasted_iota(jnp.int32, (c, glo), 1)
    ).astype(jnp.bfloat16)
    dn = (((0,), (0,)), ((), ()))
    cnt = lax.dot_general(a16, b16, dn, preferred_element_type=jnp.float32)
    cnt_ref[...] += cnt.astype(jnp.int32)

    for i in range(nv):
        # Column reshape happens in f32 (Mosaic only supports minor-dim
        # insertion for 32-bit types), THEN the 3-term bf16 split:
        # vh + vm + vl reproduces v to ~2^-24 relative, and each part
        # times a 0/1 one-hot entry is exact in bf16.  Residuals
        # sanitise to 0 when non-finite: for v = ±inf the subtraction
        # inf − inf would poison the lower terms with NaN (the head term
        # alone carries ±inf exactly); NaN v keeps NaN in the head term
        # and propagates as it should.
        v2 = val_ref[i, 0, 0, :][:, None]
        vh = v2.astype(jnp.bfloat16)
        r1 = v2 - vh.astype(jnp.float32)
        r1 = jnp.where(jnp.isfinite(r1), r1, 0.0)
        vm = r1.astype(jnp.bfloat16)
        r2 = r1 - vm.astype(jnp.float32)
        vl = jnp.where(jnp.isfinite(r2), r2, 0.0).astype(jnp.bfloat16)
        acc = sum_ref[i]
        for part in (vh, vm, vl):
            acc = acc + lax.dot_general(
                a16, b16 * part, dn,
                preferred_element_type=jnp.float32,
            )
        sum_ref[i] = acc


@functools.partial(
    jax.jit, static_argnames=("num_slots", "glo", "interpret")
)
def pallas_group_counts_sums(
    gid: jax.Array,
    values: tuple,
    num_slots: int,
    glo: int = 0,
    interpret: bool = False,
):
    """Dense histogram (+ per-slot sums) of ``gid`` ∈ [0, num_slots)
    (out-of-range ids contribute nothing).  Returns
    ``(counts i32[num_slots], sums tuple of f32[num_slots])``.

    Values must be FINITE: the scaling matmul multiplies zero one-hot
    entries by the value, and 0·inf = NaN would poison other slots —
    callers gate on stats (executor ``values_finite``)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = gid.shape[0]
    chunk = supported_chunk(n)
    if chunk == 0:
        raise ValueError(f"unsupported row count for pallas kernel: {n}")
    if not glo:
        glo = 128 if num_slots <= (1 << 14) else 256
    ghi = -(-num_slots // glo)
    steps = n // chunk
    nv = len(values)

    # The singleton middle dims satisfy the Mosaic block-shape rule (the
    # last two block dims must be tile-divisible or span the array — a
    # (…, 1, chunk) block spans its size-1 sublane dim exactly).
    gid2 = gid.reshape(steps, 1, chunk)
    vals2 = (
        jnp.stack([v.reshape(steps, 1, chunk) for v in values], axis=0)
        if nv
        else jnp.zeros((1, steps, 1, chunk), jnp.float32)
    )

    kernel = functools.partial(_kernel, ghi=ghi, glo=glo, nv=nv)
    cnt2d, sums2d = pl.pallas_call(
        kernel,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((1, 1, chunk), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((max(nv, 1), 1, 1, chunk), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((ghi, glo), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((max(nv, 1), ghi, glo), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((ghi, glo), jnp.int32),
            jax.ShapeDtypeStruct((max(nv, 1), ghi, glo), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * ghi * glo * (1 + 3 * nv),
            bytes_accessed=n * 4 * (1 + nv),
            transcendentals=0,
        ),
        interpret=interpret,
    )(gid2, vals2)

    counts = cnt2d.reshape(-1)[:num_slots]
    sums = tuple(sums2d[i].reshape(-1)[:num_slots] for i in range(nv))
    return counts, sums
