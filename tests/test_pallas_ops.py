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


# --- windowed sorted-gather kernel (expansion join; interpret on CPU) --------


def test_windowed_sorted_take_interpret():
    """Bit-exact gather at a nondecreasing index through the byte-plane
    MXU one-hot select (ops/pallas_expand): f32 specials (NaN, -inf,
    -0.0) and full-range int32 codes must reproduce EXACTLY."""
    import numpy as np

    import jax.numpy as jnp
    from warpdb_tpu.ops.pallas_expand import (
        spans_ok,
        supported,
        windowed_sorted_take,
    )

    rng = np.random.default_rng(3)
    n_src, n_idx = 4096, 8192
    idx = np.repeat(np.arange(n_src, dtype=np.int32), 2)  # fan-out 2
    vals_f = rng.normal(0, 1e10, n_src).astype(np.float32)
    vals_f[5], vals_f[7], vals_f[9] = np.nan, -np.inf, -0.0
    vals_i = rng.integers(-2**31, 2**31 - 1, n_src, dtype=np.int32)
    valid = np.ones(n_idx, bool)
    valid[-3:] = False
    assert supported(n_idx, n_src)
    assert bool(spans_ok(jnp.asarray(idx)))
    out = windowed_sorted_take(
        (jnp.asarray(vals_f), jnp.asarray(vals_i)),
        jnp.asarray(idx), jnp.asarray(valid),
        interpret=jax.default_backend() != "tpu",
    )
    got_f, got_i = np.asarray(out[0]), np.asarray(out[1])
    want_f = np.where(valid, vals_f[idx], 0).astype(np.float32)
    want_i = np.where(valid, vals_i[idx], 0)
    np.testing.assert_array_equal(
        got_f.view(np.uint32), want_f.view(np.uint32)
    )
    np.testing.assert_array_equal(got_i, want_i)

    # Variable fan-outs (still dense within each block) stay in
    # contract; a sparse index trips the span check.
    counts = rng.integers(1, 4, 3000)
    idx2 = np.repeat(np.arange(3000, dtype=np.int32), counts)
    idx2 = np.pad(idx2, (0, 1024 - len(idx2) % 1024), mode="edge")
    assert bool(spans_ok(jnp.asarray(idx2)))
    # Sparse: 1024 outputs spread across the whole 4096-row source —
    # the per-block span blows the 1024-row window contract.
    sparse = np.sort(rng.integers(0, n_src, 1024)).astype(np.int32)
    assert not bool(spans_ok(jnp.asarray(sparse)))


def test_expansion_join_matches_oracle_with_duplicate_build_keys():
    """The expansion join (duplicate build keys force the general
    sort-merge expansion; the eager rewrite is disabled) must match a
    NumPy oracle — on TPU the windowed kernel serves the probe gather
    via lax.cond, on CPU the general take does; both must agree with
    the oracle, pinning the shared contract."""
    import numpy as np

    from warpdb_tpu import WarpDB
    from warpdb_tpu.config import get_config
    from warpdb_tpu.storage import HostTable

    rng = np.random.default_rng(11)
    n = 8192
    k = rng.integers(0, 2048, n).astype(np.float32)
    v = rng.uniform(0, 100, n).astype(np.float32)
    w = rng.uniform(0, 1, 4096).astype(np.float32)
    wk = np.tile(np.arange(2048, dtype=np.float32), 2)
    db = WarpDB(HostTable.from_dict({"k": k, "v": v}))
    db.register_table("d", HostTable.from_dict({"k2": wk, "w": w}))
    get_config().eager_join_aggregation = False
    try:
        out = db.query_sql_table(
            "SELECT k, SUM(v * d.w) AS s FROM t JOIN d ON k = d.k2 "
            "GROUP BY k ORDER BY k ASC LIMIT 5"
        )
    finally:
        get_config().eager_join_aggregation = True
    # Oracle: per-key sum of v times BOTH matching dim weights.
    wsum = np.zeros(2048, np.float64)
    np.add.at(wsum, wk.astype(int), w.astype(np.float64))
    vsum = np.zeros(2048, np.float64)
    np.add.at(vsum, k.astype(int), v.astype(np.float64))
    want = vsum * wsum  # SUM over pairs factorises for this expression
    keys = np.sort(np.unique(k.astype(int)))[:5]
    np.testing.assert_allclose(out["k"], keys.astype(np.float32))
    np.testing.assert_allclose(
        out["s"], want[keys], rtol=2e-3,
    )


# --- uniform fan-out expansion kernel (interpret on CPU) ---------------------


@pytest.mark.parametrize("k", [2, 4, 8])
def test_uniform_expand_interpret(k):
    """Bit-exact constant-selection expansion (ops/pallas_expand.
    uniform_expand): out[r] = col[r // k], including f32 specials and
    full-range int32 codes, for every supported fan-out."""
    import numpy as np

    import jax.numpy as jnp
    from warpdb_tpu.ops.pallas_expand import (
        uniform_expand,
        uniform_expand_supported,
    )

    rng = np.random.default_rng(5)
    n_src = 4096
    cap = n_src * k // 2  # total < n_src*k: tail positions exist
    assert uniform_expand_supported(k, cap, n_src)
    assert not uniform_expand_supported(3, cap, n_src)
    assert not uniform_expand_supported(k, n_src * k * 2, n_src)
    vals_f = rng.normal(0, 1e10, n_src).astype(np.float32)
    vals_f[5], vals_f[7], vals_f[9] = np.nan, -np.inf, -0.0
    vals_i = rng.integers(-2**31, 2**31 - 1, n_src, dtype=np.int32)
    out = uniform_expand(
        (jnp.asarray(vals_f), jnp.asarray(vals_i)),
        k=k, capacity=cap,
        interpret=jax.default_backend() != "tpu",
    )
    r = np.arange(cap) // k
    np.testing.assert_array_equal(
        np.asarray(out[0]).view(np.uint32), vals_f[r].view(np.uint32)
    )
    np.testing.assert_array_equal(np.asarray(out[1]), vals_i[r])
