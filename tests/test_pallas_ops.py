"""Pallas kernel tests (interpret mode on CPU; compiled path is exercised
on real TPU hardware where available)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _on_cpu():
    return jax.default_backend() == "cpu"


# --- streaming top-k kernel (compiled path; interpret mode cannot execute
# the data-dependent while_loop in reasonable time, so CPU runs skip) ------


@pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="needs compiled Mosaic kernel"
)
@pytest.mark.parametrize("case", ["random", "ascending", "duplicates"])
def test_pallas_topk_exact(case):
    from warpdb_tpu.ops.pallas_topk import pallas_topk_candidates

    rng = np.random.default_rng(7)
    n = 256 * 1024 * 2
    if case == "random":
        x = rng.uniform(-100, 100, n).astype(np.float32)
    elif case == "ascending":
        x = np.sort(rng.uniform(-100, 100, n).astype(np.float32))
    else:
        x = rng.choice(np.float32([1.0, 2.0, 3.0, 99.5]), n)
    k = 16
    cand = pallas_topk_candidates(jnp.asarray(x), k)
    got = np.sort(np.asarray(cand).reshape(-1))[::-1][:k]
    want = np.sort(x)[::-1][:k]
    np.testing.assert_array_equal(got, want)


def test_topk_values_pallas_route_matches_xla():
    # Route check: top_k_values gives identical results whichever stage-1
    # is selected (backend-dependent); compare against numpy.
    from warpdb_tpu.ops.sort import top_k_values

    rng = np.random.default_rng(8)
    n = 1 << 21
    v = rng.uniform(0, 1000, n).astype(np.float32)
    mask = v > 5.0
    got = np.asarray(
        jax.jit(lambda v, m: top_k_values(v, m, 32, False))(
            jnp.asarray(v), jnp.asarray(mask)
        )
    )
    want = np.sort(v[mask])[::-1][:32]
    np.testing.assert_array_equal(got[:32], want)


# --- MXU group histogram kernel (interpret mode on CPU) -----------------------


@pytest.mark.parametrize("num_slots,n", [(6000, 4096), (40_000, 8192)])
def test_pallas_group_counts_sums_interpret(num_slots, n):
    from warpdb_tpu.ops.pallas_group import pallas_group_counts_sums

    rng = np.random.default_rng(33)
    gid = rng.integers(0, num_slots, n).astype(np.int32)
    # Sprinkle invalid sentinel rows (masked upstream): out-of-range ids
    # must contribute nothing.
    glo = 128 if num_slots <= (1 << 14) else 256
    ghi = -(-num_slots // glo)
    gid[:: 17] = ghi * glo
    vals = rng.uniform(0, 100, n).astype(np.float32)
    counts, sums = pallas_group_counts_sums(
        jnp.asarray(gid), (jnp.asarray(vals),), num_slots,
        interpret=_on_cpu(),
    )
    counts = np.asarray(counts)
    sums = np.asarray(sums[0])
    valid = gid < num_slots
    want_counts = np.bincount(gid[valid], minlength=num_slots)
    want_sums = np.zeros(num_slots, np.float64)
    np.add.at(want_sums, gid[valid], vals[valid].astype(np.float64))
    np.testing.assert_array_equal(counts, want_counts)
    np.testing.assert_allclose(sums, want_sums, rtol=3e-6, atol=1e-3)


def test_midrange_inf_values_route_to_scatter_engine():
    """±inf values cannot ride the MXU one-hot scaling (0·inf = NaN
    would poison other slots) — the executor's finiteness gate must
    route them to the scatter engine, which folds them exactly."""
    import numpy as np

    from warpdb_tpu import WarpDB
    from warpdb_tpu.storage import HostTable

    rng = np.random.default_rng(5)
    n = 20_000
    k = rng.integers(0, 30_000, n).astype(np.float32)
    v = rng.uniform(0, 10, n).astype(np.float32)
    v[7] = np.inf
    db = WarpDB(HostTable.from_dict({"k": k, "v": v}))
    out = np.asarray(db.query_sql("SELECT SUM(v) FROM t GROUP BY k"))
    uniq = np.sort(np.unique(k))
    inf_slot = int(np.searchsorted(uniq, k[7]))
    assert out[inf_slot] == np.inf
    finite = np.delete(out, inf_slot)
    assert np.isfinite(finite).all()
