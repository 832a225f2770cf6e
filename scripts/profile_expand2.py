"""Micro-profile of windowed_expand's internal pieces on the real chip,
plus a Mosaic support probe for jnp.cumsum inside a Pallas kernel."""

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
    from jax import lax

    n = 1 << 25
    cap = 1 << 26
    rng = np.random.default_rng(0)
    counts_np = np.full(n, 2, np.int32)
    counts = jnp.asarray(counts_np)
    price = jnp.asarray(rng.uniform(0, 100, n).astype(np.float32))
    qty = jnp.asarray(rng.integers(0, 32, n).astype(np.float32))

    def timeit(fn, reps=5):
        fn()
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[len(ts) // 2]

    # (a) cumsum over 2^25
    @jax.jit
    def cs(c):
        o = jnp.cumsum(c) - c
        return o[-1]

    print(f"cumsum_2^25     {timeit(lambda: int(cs(counts)))*1e3:8.1f} ms")

    offsets = jnp.cumsum(counts) - counts
    total = int(jnp.sum(counts))

    # (b) searchsorted 65K needles over 2^25
    from warpdb_tpu.ops.pallas_expand import (
        expand_block_owners, windowed_expand,
    )

    @jax.jit
    def sso(off):
        p_lo, p_last = expand_block_owners(off, cap, jnp.int32(total))
        return p_lo[-1] + p_last

    print(f"blockowners_sso {timeit(lambda: int(sso(offsets)))*1e3:8.1f} ms")

    # (c) byte-plane construction for 3 cols + offsets
    @jax.jit
    def planes_only(cols, off32):
        c_cols = len(cols) + 1
        n_probe = off32.shape[0]
        bits = jnp.stack(
            [lax.bitcast_convert_type(c, jnp.uint32).astype(jnp.int32)
             for c in (*cols, off32)],
            axis=0,
        )
        planes = jnp.concatenate(
            [((bits >> s) & 0xFF).astype(jnp.bfloat16) for s in (0, 8, 16, 24)],
            axis=0,
        ).reshape(4, c_cols, n_probe).transpose(1, 0, 2).reshape(
            4 * c_cols, n_probe)
        return planes.astype(jnp.float32).sum()

    lo = jnp.arange(n, dtype=jnp.int32) % 64
    print(f"byte_planes     {timeit(lambda: float(planes_only((price, qty, lo), offsets.astype(jnp.int32))))*1e3:8.1f} ms")

    # (d) the full windowed_expand (kernel + everything)
    @jax.jit
    def we(off, cols):
        pidx, off_r, taken = windowed_expand(off, cols, cap,
                                             total=jnp.int32(total))
        return taken[0][0]

    print(f"windowed_expand {timeit(lambda: float(we(offsets, (price, qty, lo))))*1e3:8.1f} ms")

    # (e) Mosaic probe: jnp.cumsum along the minor dim inside Pallas
    import functools

    import jax.experimental.pallas as pl

    def ck(x_ref, o_ref):
        o_ref[...] = jnp.cumsum(x_ref[...], axis=-1)

    x = jnp.ones((8, 1024), jnp.float32)
    try:
        out = pl.pallas_call(
            ck, out_shape=jax.ShapeDtypeStruct((8, 1024), jnp.float32)
        )(x)
        ok = bool(jnp.all(out[:, -1] == 1024.0))
        print(f"pallas cumsum minor-dim: OK exact={ok}")
    except Exception as e:
        print(f"pallas cumsum minor-dim: FAIL {type(e).__name__}: {str(e)[:150]}")

    # (f) i32 cumsum variant
    def ck2(x_ref, o_ref):
        o_ref[...] = jnp.cumsum(x_ref[...], axis=-1)

    xi = jnp.ones((8, 1024), jnp.int32)
    try:
        out = pl.pallas_call(
            ck2, out_shape=jax.ShapeDtypeStruct((8, 1024), jnp.int32)
        )(xi)
        ok = bool(jnp.all(out[:, -1] == 1024))
        print(f"pallas cumsum i32: OK exact={ok}")
    except Exception as e:
        print(f"pallas cumsum i32: FAIL {type(e).__name__}: {str(e)[:150]}")


if __name__ == "__main__":
    main()
