"""Pallas fused-resampler tests (interpret mode on CPU: semantics only;
the real-TPU compile/perf path is exercised by bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aesmc_tpu import resampling
from aesmc_tpu.ops import resample_pallas

KEY = jax.random.PRNGKey(0)


@pytest.mark.parametrize(
    "method", [m for m in resampling.METHODS if m != "residual"])
@pytest.mark.parametrize("shape", [(1, 3), (3, 100), (2, 1000)])
def test_exact_match_small(method, shape):
    """At small K the blocked cumsum accumulates in the same order, so
    indices are bit-identical to the XLA implementation (same PRNG)."""
    lw = jnp.asarray(
        np.random.RandomState(0).randn(*shape).astype(np.float32) * 2)
    ref = np.asarray(resampling._VARIANTS[method](lw, KEY))
    got = np.asarray(resample_pallas.sample_ancestral_index_pallas(
        lw, KEY, method=method, interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_residual_has_no_kernel_path():
    """Residual's query set is not a monotone position grid on the
    unmodified CDF, so the fused kernel refuses it (the engine router
    guards this too, resampling.py); documented in docs/API.md."""
    lw = jnp.zeros((2, 64))
    with pytest.raises(ValueError, match="residual.*no fused kernel"):
        resample_pallas.sample_ancestral_index_pallas(
            lw, KEY, method="residual", interpret=True)


def test_near_exact_large():
    """At K=10k float accumulation order differs; indices may shift by a
    slot or two at CDF bin edges, on a <0.5% fraction of entries."""
    lw = jnp.asarray(
        np.random.RandomState(0).randn(4, 10000).astype(np.float32) * 2)
    ref = np.asarray(resampling.systematic_indices(lw, KEY))
    got = np.asarray(resample_pallas.sample_ancestral_index_pallas(
        lw, KEY, interpret=True))
    mismatch = (ref != got).mean()
    assert mismatch < 0.005, mismatch
    assert np.abs(ref - got).max() <= 3


def test_degenerate_weights():
    """All mass on one particle: every index points at it."""
    lw = jnp.full((2, 256), -1e9).at[:, 17].set(0.0)
    got = np.asarray(resample_pallas.sample_ancestral_index_pallas(
        lw, KEY, interpret=True))
    np.testing.assert_array_equal(got, np.full((2, 256), 17))


def test_marginals():
    weight = np.array([0.2, 0.3, 0.5])
    num_trials = 4000
    lw = jnp.broadcast_to(jnp.log(jnp.asarray(weight)), (num_trials, 3))
    idx = np.asarray(resample_pallas.sample_ancestral_index_pallas(
        lw, KEY, interpret=True))
    emp = np.array([(idx == i).mean() for i in range(3)])
    np.testing.assert_allclose(emp, weight, atol=2e-2)


def test_too_many_particles_raises():
    lw = jnp.zeros((1, resample_pallas.LARGE_KERNEL_PARTICLES + 128))
    with pytest.raises(ValueError, match="shard the particle axis"):
        resample_pallas.sample_ancestral_index_pallas(lw, KEY)


class TestFusedGather:
    """resample_and_gather: indices + particle values in one merge pass,
    with a custom VJP matching take_along_axis's gradient."""

    def setup_method(self):
        resample_pallas.FORCE_INTERPRET = True

    def teardown_method(self):
        resample_pallas.FORCE_INTERPRET = False

    def test_forward_matches_gather(self):
        rng = np.random.RandomState(0)
        lw = jnp.asarray(rng.randn(3, 1024).astype(np.float32))
        cols = tuple(jnp.asarray(rng.randn(3, 1024).astype(np.float32))
                     for _ in range(2))
        pos = resample_pallas.resampling_positions(lw, KEY, "systematic")
        idx, gathered = resample_pallas.resample_and_gather(lw, pos, cols)
        for c, g in zip(cols, gathered):
            want = np.take_along_axis(np.asarray(c), np.asarray(idx),
                                      axis=1)
            np.testing.assert_array_equal(np.asarray(g), want)

    def test_vjp_matches_take_along_axis(self):
        rng = np.random.RandomState(1)
        lw = jnp.asarray(rng.randn(2, 512).astype(np.float32))
        col = jnp.asarray(rng.randn(2, 512).astype(np.float32))
        pos = resample_pallas.resampling_positions(lw, KEY, "systematic")
        cot = jnp.asarray(rng.randn(2, 512).astype(np.float32))

        def fused(c):
            _, gathered = resample_pallas.resample_and_gather(
                lw, pos, (c,))
            return jnp.sum(gathered[0] * cot)

        idx = resample_pallas.searchsorted_cdf_pallas(lw, pos)

        def reference(c):
            return jnp.sum(jnp.take_along_axis(c, idx, axis=1) * cot)

        g_fused = jax.grad(fused)(col)
        g_ref = jax.grad(reference)(col)
        np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                                   atol=1e-5)

    def test_engine_fused_path_matches_xla(self):
        """infer with implementation='pallas' (interpreted) must equal
        the 'xla' implementation bit-for-bit at small K."""
        from aesmc_tpu import inference, statistics
        from aesmc_tpu.models import lgssm
        initial = lgssm.Initial(0.0, 1.0)
        transition = lgssm.Transition.create(0.9, 1.0)
        emission = lgssm.Emission.create(1.0, 0.3)
        proposal = lgssm.Proposal.create(1.0, 1.0, KEY)
        _, obs = statistics.sample_from_prior(initial, transition, emission,
                                              8, 2, KEY)
        results = {}
        for impl in ("xla", "pallas"):
            results[impl] = inference.infer(
                "smc", obs, initial, transition, emission, proposal, 256,
                key=KEY, resampling_implementation=impl,
                return_log_marginal_likelihood=True)
        np.testing.assert_allclose(
            np.asarray(results["xla"]["log_marginal_likelihood"]),
            np.asarray(results["pallas"]["log_marginal_likelihood"]),
            rtol=2e-4)
        np.testing.assert_allclose(
            np.asarray(results["xla"]["latents"]),
            np.asarray(results["pallas"]["latents"]), atol=1e-5)

    def test_engine_noidx_route_matches_xla(self):
        """With no lineage/ancestor outputs requested, the pallas path
        runs the v5 systematic kernel with emit_idx=False (the headline
        bench configuration) - the log-ML must still match 'xla'."""
        from aesmc_tpu import inference, statistics
        from aesmc_tpu.models import lgssm
        initial = lgssm.Initial(0.0, 1.0)
        transition = lgssm.Transition.create(0.9, 1.0)
        emission = lgssm.Emission.create(1.0, 0.3)
        proposal = lgssm.Proposal.create(1.0, 1.0, KEY)
        _, obs = statistics.sample_from_prior(initial, transition,
                                              emission, 8, 2, KEY)
        results = {}
        for impl in ("xla", "pallas"):
            results[impl] = inference.infer(
                "smc", obs, initial, transition, emission, proposal, 256,
                key=KEY, resampling_implementation=impl,
                return_log_marginal_likelihood=True,
                return_latents=False, return_log_weight=False,
                return_ancestral_indices=False)
        np.testing.assert_allclose(
            np.asarray(results["xla"]["log_marginal_likelihood"]),
            np.asarray(results["pallas"]["log_marginal_likelihood"]),
            rtol=2e-4)


class TestLargeKPath:
    """K > MAX_KERNEL_PARTICLES: XLA CDF + chunked-position kernel with
    start-tile hints (thresholds shrunk here so the route runs at test
    sizes)."""

    def setup_method(self):
        resample_pallas.FORCE_INTERPRET = True
        self._max = resample_pallas.MAX_KERNEL_PARTICLES
        self._chunk = resample_pallas.LARGE_K_CHUNK
        resample_pallas.MAX_KERNEL_PARTICLES = 2048
        resample_pallas.LARGE_K_CHUNK = 1024

    def teardown_method(self):
        resample_pallas.FORCE_INTERPRET = False
        resample_pallas.MAX_KERNEL_PARTICLES = self._max
        resample_pallas.LARGE_K_CHUNK = self._chunk

    def test_matches_xla_exactly(self):
        from aesmc_tpu import resampling, state
        rng = np.random.RandomState(0)
        B, K = 2, 8192
        lw = jnp.asarray(rng.randn(B, K).astype(np.float32))
        value = {"x": jnp.asarray(rng.randn(B, K).astype(np.float32)),
                 "y": jnp.asarray(rng.randn(B, K, 2).astype(np.float32))}
        idx, out = resampling.sample_ancestral_index_and_resample(
            lw, KEY, value, method="systematic", implementation="pallas")
        # Same XLA cumsum on both sides -> bit-identical indices.
        np.testing.assert_array_equal(
            np.asarray(idx),
            np.asarray(resampling.systematic_indices(lw, KEY)))
        want = state.resample(value, idx)
        np.testing.assert_array_equal(np.asarray(out["x"]),
                                      np.asarray(want["x"]))
        np.testing.assert_array_equal(np.asarray(out["y"]),
                                      np.asarray(want["y"]))

    def test_gradients_flow(self):
        from aesmc_tpu import resampling
        rng = np.random.RandomState(1)
        B, K = 1, 4096
        lw = jnp.asarray(rng.randn(B, K).astype(np.float32))
        cot = jnp.asarray(rng.randn(B, K).astype(np.float32))

        def f(v):
            _, out = resampling.sample_ancestral_index_and_resample(
                lw, KEY, v, implementation="pallas")
            return jnp.sum(out * cot)

        v0 = jnp.asarray(rng.randn(B, K).astype(np.float32))
        g = jax.grad(f)(v0)
        idx = resampling.systematic_indices(lw, KEY)
        g_ref = jax.grad(lambda v: jnp.sum(
            jnp.take_along_axis(v, idx, 1) * cot))(v0)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                                   atol=1e-5)


def test_hbm_resident_mode_interpret():
    """HBM-resident inputs (DMA'd once into scratch) must match host
    searchsorted exactly in interpret mode."""
    rng = np.random.RandomState(0)
    B, Kc, C = 2, 4096, 4
    w = rng.rand(B, Kc).astype(np.float32)
    cdf = np.cumsum(w, 1)
    cdf = cdf / cdf[:, -1:]
    pos = np.sort(rng.rand(B, Kc).astype(np.float32), axis=1)
    want = np.clip(np.stack([
        np.searchsorted(cdf[b], pos[b], side="right") for b in range(B)]),
        0, Kc - 1)
    v = rng.randn(B, Kc).astype(np.float32)
    idx, gathered = resample_pallas.searchsorted_sorted_cdf_pallas(
        jnp.asarray(cdf), jnp.asarray(pos), (jnp.asarray(v),), chunks=C,
        hbm_resident=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(idx), want)
    np.testing.assert_array_equal(np.asarray(gathered[0]),
                                  np.take_along_axis(v, want, 1))


class TestWindowKernels:
    """v5 window kernels (round 2): systematic (in-kernel positions) and
    sorted modes, emit_idx on/off. Exactness contract identical to v1."""

    @pytest.mark.parametrize("emit_idx", [True, False])
    @pytest.mark.parametrize("mode", ["systematic", "sorted"])
    def test_exact_vs_xla(self, emit_idx, mode):
        from aesmc_tpu import resampling as R
        logw = jax.random.normal(jax.random.PRNGKey(0), (3, 1000)) * 3.0
        v = jax.random.normal(jax.random.PRNGKey(1), (3, 1000))
        cdf = R._normalized_cumsum(logw)
        if mode == "systematic":
            u = jax.random.uniform(jax.random.PRNGKey(2), (3, 1),
                                   dtype=jnp.float32)
            pos = jnp.minimum(
                (u + jnp.arange(1000, dtype=jnp.float32)) / 1000,
                jnp.nextafter(jnp.float32(1.0), jnp.float32(0.0)))
            idx, (g,) = resample_pallas.systematic_search_gather_pallas(
                cdf, u, 1000, (v,), emit_idx=emit_idx, interpret=True)
        else:
            pos = R.resampling_positions(logw, jax.random.PRNGKey(2),
                                         "stratified")
            idx, (g,) = resample_pallas.sorted_search_gather_pallas(
                cdf, pos, (v,), emit_idx=emit_idx, interpret=True)
        idx_ref = jnp.clip(
            jax.vmap(lambda c, p: jnp.searchsorted(c, p, side="right"))(
                cdf, pos), 0, 999)
        if emit_idx:
            np.testing.assert_array_equal(np.asarray(idx),
                                          np.asarray(idx_ref))
        else:
            assert idx is None
        ref_g = jnp.take_along_axis(v, idx_ref, axis=1)
        np.testing.assert_array_equal(np.asarray(g), np.asarray(ref_g))


class TestV5HbmWindowKernels:
    """v5-HBM chunked layout (round 3, the 2M-8M regime shrunk to test
    scale): CDF-side arrays DMA'd once per batch row into persistent
    scratch, positions/outputs chunked over a (B, chunks) grid. Same
    exactness contract as the VMEM v5 kernels."""

    def _cdf(self, B, K, scale=1.0, seed=0):
        rng = np.random.RandomState(seed)
        logw = (rng.randn(B, K) * scale).astype(np.float32)
        cdf = np.asarray(resampling._normalized_cumsum(
            jnp.asarray(logw)))
        return logw, cdf

    def test_systematic_hbm_chunks_interpret(self):
        B, K, C = 2, 4096, 4
        logw, cdf = self._cdf(B, K)
        rng = np.random.RandomState(1)
        u = rng.rand(B, 1).astype(np.float32)
        v = rng.randn(B, K).astype(np.float32)
        pos = np.minimum((u + np.arange(K, dtype=np.float32)) / K,
                         np.float32(resample_pallas._BELOW_ONE))
        want = np.clip(np.stack([
            np.searchsorted(cdf[b], pos[b], side="right")
            for b in range(B)]), 0, K - 1)
        idx, (g,) = resample_pallas.systematic_search_gather_pallas(
            jnp.asarray(cdf), jnp.asarray(u), K, (jnp.asarray(v),),
            interpret=True, hbm_chunks=C)
        np.testing.assert_array_equal(np.asarray(idx), want)
        np.testing.assert_array_equal(np.asarray(g),
                                      np.take_along_axis(v, want, 1))

    def test_systematic_hbm_no_idx_interpret(self):
        B, K, C = 2, 4096, 2
        logw, cdf = self._cdf(B, K, seed=3)
        rng = np.random.RandomState(4)
        u = rng.rand(B, 1).astype(np.float32)
        v = rng.randn(B, K).astype(np.float32)
        pos = np.minimum((u + np.arange(K, dtype=np.float32)) / K,
                         np.float32(resample_pallas._BELOW_ONE))
        want = np.clip(np.stack([
            np.searchsorted(cdf[b], pos[b], side="right")
            for b in range(B)]), 0, K - 1)
        idx, (g,) = resample_pallas.systematic_search_gather_pallas(
            jnp.asarray(cdf), jnp.asarray(u), K, (jnp.asarray(v),),
            emit_idx=False, interpret=True, hbm_chunks=C)
        assert idx is None
        np.testing.assert_array_equal(np.asarray(g),
                                      np.take_along_axis(v, want, 1))

    def test_sorted_hbm_chunks_interpret(self):
        B, K, C = 2, 4096, 4
        logw, cdf = self._cdf(B, K, seed=5)
        rng = np.random.RandomState(6)
        pos = np.sort(rng.rand(B, K).astype(np.float32), axis=1)
        v = rng.randn(B, K).astype(np.float32)
        want = np.clip(np.stack([
            np.searchsorted(cdf[b], pos[b], side="right")
            for b in range(B)]), 0, K - 1)
        idx, (g,) = resample_pallas.sorted_search_gather_pallas(
            jnp.asarray(cdf), jnp.asarray(pos), (jnp.asarray(v),),
            interpret=True, hbm_chunks=C)
        np.testing.assert_array_equal(np.asarray(idx), want)
        np.testing.assert_array_equal(np.asarray(g),
                                      np.take_along_axis(v, want, 1))

    def test_degenerate_weights_cross_chunk_windows_interpret(self):
        # All mass on one particle: every chunk's windows collapse onto
        # the same CDF rows; the DMA'd scratch must serve all chunks.
        B, K, C = 1, 4096, 4
        logw = np.full((B, K), -1e9, np.float32)
        logw[:, 77] = 0.0
        cdf = np.asarray(resampling._normalized_cumsum(
            jnp.asarray(logw)))
        u = np.full((B, 1), 0.25, np.float32)
        v = np.random.RandomState(7).randn(B, K).astype(np.float32)
        idx, (g,) = resample_pallas.systematic_search_gather_pallas(
            jnp.asarray(cdf), jnp.asarray(u), K, (jnp.asarray(v),),
            interpret=True, hbm_chunks=C)
        np.testing.assert_array_equal(np.asarray(idx),
                                      np.full((B, K), 77))
        np.testing.assert_array_equal(
            np.asarray(g), np.broadcast_to(v[:, 77:78], (B, K)))

    def test_range_sum_hbm_chunks_interpret(self):
        # Transposed-merge backward in the chunked HBM layout: exact
        # segmented sums with integer cotangents.
        B, K, C = 2, 4096, 4
        logw, cdf = self._cdf(B, K, seed=8)
        rng = np.random.RandomState(9)
        u = rng.rand(B, 1).astype(np.float32)
        pos = np.minimum((u + np.arange(K, dtype=np.float32)) / K,
                         np.float32(resample_pallas._BELOW_ONE))
        idx = np.clip(np.stack([
            np.searchsorted(cdf[b], pos[b], side="right")
            for b in range(B)]), 0, K - 1)
        gint = np.round(rng.randn(B, K) * 3).astype(np.float32)
        want = np.stack([np.bincount(idx[b], weights=gint[b],
                                     minlength=K) for b in range(B)])
        (got,) = resample_pallas.gather_backward_pallas(
            jnp.asarray(cdf), jnp.asarray(pos), [jnp.asarray(gint)],
            chunks=C, hbm_resident=True, interpret=True)
        np.testing.assert_array_equal(np.asarray(got),
                                      want.astype(np.float32))


def test_resample_and_gather_emit_idx_false_interpret():
    # Soft-training path: the sorted fused gather without index
    # emission must return idx=None and identical gathered values.
    resample_pallas.FORCE_INTERPRET = True
    try:
        rng = np.random.RandomState(2)
        lw = jnp.asarray(rng.randn(2, 256).astype(np.float32))
        pos = np.sort(rng.rand(2, 256).astype(np.float32), axis=1)
        v = jnp.asarray(rng.randn(2, 256).astype(np.float32))
        idx_t, (g_t,) = resample_pallas.resample_and_gather(
            lw, jnp.asarray(pos), (v,))
        idx_f, (g_f,) = resample_pallas.resample_and_gather(
            lw, jnp.asarray(pos), (v,), emit_idx=False)
        assert idx_f is None
        np.testing.assert_array_equal(np.asarray(g_t), np.asarray(g_f))
        # gradient path with emit_idx=False
        g = jax.grad(lambda vv: jnp.sum(resample_pallas.resample_and_gather(
            lw, jnp.asarray(pos), (vv,), emit_idx=False)[1][0]))(v)
        g_ref = jax.grad(lambda vv: jnp.sum(jnp.take_along_axis(
            vv, jnp.asarray(idx_t), 1)))(v)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                                   atol=1e-6)
    finally:
        resample_pallas.FORCE_INTERPRET = False


class TestV5HbmWindowed:
    """Round-4 windowed-scratch v5-HBM layout: a sliding [base,
    base+cap) CDF-row window replaces the whole-row scratch (which
    collapses at 8M particles, 96 MB VMEM). Tiny explicit caps force
    many re-bases at test sizes; results must be bit-identical to the
    unwindowed kernels."""

    def _cdf(self, B, K, scale=1.0, seed=0):
        rng = np.random.RandomState(seed)
        logw = (rng.randn(B, K) * scale).astype(np.float32)
        cdf = np.asarray(resampling._normalized_cumsum(jnp.asarray(logw)))
        return logw, cdf

    def test_systematic_windowed_interpret(self):
        B, K, C = 2, 4096, 4
        logw, cdf = self._cdf(B, K)
        rng = np.random.RandomState(1)
        u = rng.rand(B, 1).astype(np.float32)
        v = rng.randn(B, K).astype(np.float32)
        pos = np.minimum((u + np.arange(K, dtype=np.float32)) / K,
                         np.float32(resample_pallas._BELOW_ONE))
        want = np.clip(np.stack([
            np.searchsorted(cdf[b], pos[b], side="right")
            for b in range(B)]), 0, K - 1)
        idx, (g,) = resample_pallas.systematic_search_gather_pallas(
            jnp.asarray(cdf), jnp.asarray(u), K, (jnp.asarray(v),),
            interpret=True, hbm_chunks=C, hbm_windowed=8)
        np.testing.assert_array_equal(np.asarray(idx), want)
        np.testing.assert_array_equal(np.asarray(g),
                                      np.take_along_axis(v, want, 1))

    def test_sorted_windowed_interpret(self):
        B, K, C = 2, 4096, 4
        logw, cdf = self._cdf(B, K, seed=5)
        rng = np.random.RandomState(6)
        pos = np.sort(rng.rand(B, K).astype(np.float32), axis=1)
        v = rng.randn(B, K).astype(np.float32)
        want = np.clip(np.stack([
            np.searchsorted(cdf[b], pos[b], side="right")
            for b in range(B)]), 0, K - 1)
        idx, (g,) = resample_pallas.sorted_search_gather_pallas(
            jnp.asarray(cdf), jnp.asarray(pos), (jnp.asarray(v),),
            interpret=True, hbm_chunks=C, hbm_windowed=8)
        np.testing.assert_array_equal(np.asarray(idx), want)
        np.testing.assert_array_equal(np.asarray(g),
                                      np.take_along_axis(v, want, 1))

    def test_degenerate_weights_windowed_interpret(self):
        # All mass on one particle: every chunk re-bases BACKWARD onto
        # the same early CDF rows after the extension loop runs off the
        # window - exercises both re-base directions.
        B, K, C = 1, 4096, 4
        logw = np.full((B, K), -1e9, np.float32)
        logw[:, 77] = 0.0
        cdf = np.asarray(resampling._normalized_cumsum(jnp.asarray(logw)))
        u = np.full((B, 1), 0.25, np.float32)
        v = np.random.RandomState(7).randn(B, K).astype(np.float32)
        idx, (g,) = resample_pallas.systematic_search_gather_pallas(
            jnp.asarray(cdf), jnp.asarray(u), K, (jnp.asarray(v),),
            interpret=True, hbm_chunks=C, hbm_windowed=8)
        np.testing.assert_array_equal(np.asarray(idx),
                                      np.full((B, K), 77))
        np.testing.assert_array_equal(
            np.asarray(g), np.broadcast_to(v[:, 77:78], (B, K)))

    def test_range_sum_windowed_interpret(self):
        B, K, C = 2, 4096, 4
        logw, cdf = self._cdf(B, K, seed=8)
        rng = np.random.RandomState(9)
        u = rng.rand(B, 1).astype(np.float32)
        pos = np.minimum((u + np.arange(K, dtype=np.float32)) / K,
                         np.float32(resample_pallas._BELOW_ONE))
        idx = np.clip(np.stack([
            np.searchsorted(cdf[b], pos[b], side="right")
            for b in range(B)]), 0, K - 1)
        gint = np.round(rng.randn(B, K) * 3).astype(np.float32)
        want = np.stack([np.bincount(idx[b], weights=gint[b],
                                     minlength=K) for b in range(B)])
        lower = np.concatenate([np.zeros_like(cdf[:, :1]), cdf[:, :-1]], 1)
        upper = np.concatenate([cdf[:, :-1],
                                np.full_like(cdf[:, :1], 2.0)], 1)
        _, (got,) = resample_pallas.range_sum_pallas(
            jnp.asarray(pos), jnp.asarray(lower), jnp.asarray(upper),
            [jnp.asarray(gint)], interpret=True, hbm_chunks=C,
            hbm_windowed=8)
        np.testing.assert_array_equal(np.asarray(got),
                                      want.astype(np.float32))

    def test_auto_cap_covers_row_and_requires_hbm(self):
        rc = 1024
        cap = resample_pallas._windowed_cap_rows(rc, 16)
        assert cap % resample_pallas.MERGE_ROWS == 0
        assert 4 * (rc // 16) <= cap <= rc
        with pytest.raises(ValueError, match="hbm_windowed"):
            resample_pallas.systematic_search_gather_pallas(
                jnp.zeros((1, 256)), jnp.zeros((1, 1)), 256,
                (jnp.zeros((1, 256)),), interpret=True, hbm_windowed=8)
