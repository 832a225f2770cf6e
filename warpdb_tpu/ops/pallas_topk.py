"""Streaming top-k Pallas kernel.

Replaces the two-stage ``lax.top_k`` candidate pull (ops/sort.py) for
large inputs.  XLA's TopK costs ~15x the input's HBM time at k=16
because it runs a full selection network per row block; this kernel
makes one streaming pass instead:

* the input is viewed as (rows, 1024 lanes); a persistent VMEM scratch
  holds the running top-k **per lane** (k x 1024), sorted descending;
* per tile, a max-reduce finds each lane's best remaining candidate; a
  short data-dependent ``while_loop`` extracts lane maxima and bubbles
  them into the scratch **only while some lane still improves** — for
  randomly ordered data almost every tile exits after the single
  cond-check reduce, so the pass is HBM-bound;
* worst case (fully ascending input) is ~k+1 extract/insert rounds per
  tile, still far below the comparator-network cost;
* the (k, 1024) survivor table is tiny; the caller finishes with one
  ``lax.top_k`` over k*1024 candidates.

Exactness: every element not in the scratch is dominated by >= k
elements in its own lane, so the global top-k is always a subset of the
survivor table (duplicates handled by first-occurrence masking).

Reference point: the engine this replaces bubble-sorted the whole
column with a single GPU thread (jit.cpp:283-307).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pallas_topk_candidates", "supports_pallas_topk"]

LANES = 1024  # 8 sublanes x 128 lanes
_NEG_INF = float("-inf")  # plain float: jnp scalars would be captured consts


def _kernel(x_ref, out_ref, topk_ref, *, k: int, tile_rows: int):
    i = pl.program_id(0)
    n_tiles = pl.num_programs(0)

    @pl.when(i == 0)
    def _init():
        topk_ref[:] = jnp.full((k, LANES), _NEG_INF, jnp.float32)

    tile = x_ref[:]  # (tile_rows, LANES)

    def improving(tile):
        m = jnp.max(tile, axis=0)
        return jnp.any(m > topk_ref[k - 1, :])

    def extract(tile):
        m = jnp.max(tile, axis=0)  # (LANES,)
        # Bubble m into the sorted per-lane scratch.  Lanes where m no
        # longer improves are no-ops by construction (m falls off the
        # end without displacing anything).
        new = m
        for j in range(k):
            old = topk_ref[j, :]
            hi = jnp.maximum(old, new)
            new = jnp.minimum(old, new)
            topk_ref[j, :] = hi
        # Mask the first occurrence of m in each lane so duplicates are
        # consumed one copy per round (argmax returns the first max row).
        am = jnp.argmax(tile, axis=0)  # (LANES,)
        rows = jax.lax.broadcasted_iota(jnp.int32, tile.shape, 0)
        first = rows == am[None, :].astype(jnp.int32)
        return jnp.where(first, _NEG_INF, tile)

    lax.while_loop(improving, extract, tile)

    @pl.when(i == n_tiles - 1)
    def _emit():
        out_ref[:] = topk_ref[:]


@functools.partial(jax.jit, static_argnames=("k", "tile_rows"))
def pallas_topk_candidates(
    x: jax.Array, k: int, tile_rows: int = 256
) -> jax.Array:
    """(k, 1024) per-lane top-k survivor table of ``x`` (descending
    priority; pad ``x`` with -inf).  ``x.size`` must be a multiple of
    ``tile_rows * 1024``."""
    n = x.size
    rows = n // LANES
    grid = rows // tile_rows
    x2 = x.reshape(rows, LANES)
    return pl.pallas_call(
        functools.partial(_kernel, k=k, tile_rows=tile_rows),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(
                (tile_rows, LANES),
                lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (k, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((k, LANES), jnp.float32),
        scratch_shapes=[pltpu.VMEM((k, LANES), jnp.float32)],
    )(x2)


def supports_pallas_topk(n: int, k: int, tile_rows: int = 256) -> bool:
    """Shape gate: one full pass of equal tiles, k small enough for the
    bubble insert to stay cheap."""
    return (
        1 < k <= 128
        and n >= tile_rows * LANES
        and n % (tile_rows * LANES) == 0
    )
