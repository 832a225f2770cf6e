"""Pallas kernel tests (interpret mode on CPU; compiled path is exercised
on real TPU hardware where available)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _on_cpu():
    return jax.default_backend() == "cpu"


@pytest.mark.parametrize("n,seed,thr", [(8192, 0, 50), (8192 * 3, 1, 20),
                                        (8192 * 2, 2, 95)])
def test_pallas_compact_interpret(n, seed, thr):
    from warpdb_tpu.ops.pallas_compact import pallas_compact

    rng = np.random.default_rng(seed)
    v = rng.uniform(0, 100, n).astype(np.float32)
    m = v > thr
    out, count = pallas_compact(
        jnp.asarray(v), jnp.asarray(m), interpret=_on_cpu()
    )
    out = np.asarray(out)
    c = int(count)
    assert c == m.sum()
    np.testing.assert_array_equal(out[:c], v[m])
    assert (out[c:] == 0).all()


def test_pallas_compact_all_none():
    from warpdb_tpu.ops.pallas_compact import pallas_compact

    v = np.arange(8192, dtype=np.float32)
    for mask in (np.ones(8192, bool), np.zeros(8192, bool)):
        out, count = pallas_compact(
            jnp.asarray(v), jnp.asarray(mask), interpret=_on_cpu()
        )
        c = int(count)
        assert c == mask.sum()
        np.testing.assert_array_equal(np.asarray(out)[:c], v[mask])
