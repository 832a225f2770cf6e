"""Filter / compaction kernels.

The reference's only compaction is ``filter_price_gt`` — an
``atomicAdd``-slot kernel whose output order is **nondeterministic**
(main.cu:64-76) and which it once launches twice without resetting the
counter (main.cu:200-209).  The TPU design is an order-preserving
mask → exclusive-prefix-sum → scatter: deterministic by construction,
single fused XLA kernel, padded capacity + valid count to satisfy static
shapes (SURVEY.md §7 "hard parts").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["compact", "compact_pad_value"]

_PAD = jnp.float32(0.0)


def compact(values: jax.Array, mask: jax.Array, pad_value=0.0):
    """Gather ``values[mask]`` to the front, preserving row order.

    Returns ``(out, count)`` where ``out`` has the same padded length with
    selected values first and ``pad_value`` elsewhere, and ``count`` is the
    number of selected rows (int32 scalar, on device).
    """
    n = values.shape[0]
    mask_i = mask.astype(jnp.int32)
    # Exclusive prefix sum = destination slot for each selected row.
    slots = jnp.cumsum(mask_i) - mask_i
    dest = jnp.where(mask, slots, n)  # out-of-range → dropped
    out = jnp.full((n,), jnp.asarray(pad_value, values.dtype))
    out = out.at[dest].set(values, mode="drop")
    count = jnp.sum(mask_i)
    return out, count


def compact_pad_value(dtype) -> jnp.ndarray:
    return jnp.zeros((), dtype=dtype)
