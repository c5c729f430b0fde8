"""Resampler tests: shapes/dtype, statistical marginals against target
weights (reference test_inference.py:43-84), gradient detachment, NaN
guard, and variant coverage."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aesmc_tpu import resampling
from aesmc_tpu.ops import resample_pallas

KEY = jax.random.PRNGKey(0)


class TestShapes:
    @pytest.mark.parametrize("shape", [(2, 3), (1, 2), (2, 1)])
    @pytest.mark.parametrize("method", resampling.METHODS)
    def test_dimensions_and_dtype(self, shape, method):
        logw = jnp.asarray(np.random.rand(*shape))
        idx = resampling.sample_ancestral_index(logw, KEY, method=method)
        assert idx.shape == shape
        assert idx.dtype == jnp.int32
        assert (np.asarray(idx) >= 0).all()
        assert (np.asarray(idx) < shape[1]).all()

    def test_bad_rank_raises(self):
        with pytest.raises(ValueError):
            resampling.sample_ancestral_index(jnp.zeros((3,)), KEY)

    def test_bad_method_raises(self):
        with pytest.raises(ValueError):
            resampling.sample_ancestral_index(jnp.zeros((1, 3)), KEY,
                                              method="bogus")

    def test_nan_guard(self):
        logw = jnp.asarray([[0.0, jnp.nan, 1.0]])
        with pytest.raises(FloatingPointError):
            resampling.sample_ancestral_index(logw, KEY)


class TestMarginals:
    """Empirical resampling marginals ~ normalized weights, atol 1e-2 over
    10k trials (reference test_inference.py:64-84)."""

    @pytest.mark.parametrize("method", resampling.METHODS)
    def test_sampler(self, method):
        weight = np.array([0.2, 0.3, 0.5])
        num_trials = 10000
        logw = jnp.broadcast_to(jnp.log(jnp.asarray(weight)),
                                (num_trials, 3))
        idx = np.asarray(resampling.sample_ancestral_index(
            logw, KEY, method=method))
        empirical = np.array([
            (idx == i).sum() / (num_trials * len(weight))
            for i in range(len(weight))])
        np.testing.assert_allclose(empirical, weight, atol=1e-2)

    def test_systematic_offspring_bound(self):
        # Systematic resampling: offspring counts differ from K*w by < 1.
        weight = np.array([0.1, 0.2, 0.3, 0.4])
        k = len(weight)
        logw = jnp.log(jnp.asarray(weight))[None]
        for seed in range(20):
            idx = np.asarray(resampling.systematic_indices(
                logw, jax.random.PRNGKey(seed)))[0]
            counts = np.bincount(idx, minlength=k)
            assert np.all(np.abs(counts - k * weight) < 1.0 + 1e-6)


class TestGradients:
    def test_indices_detached(self):
        def f(logw):
            idx = resampling.sample_ancestral_index(logw, KEY)
            return jnp.sum(idx.astype(jnp.float32))
        g = jax.grad(f)(jnp.asarray([[0.1, 0.2, 0.7]]))
        np.testing.assert_array_equal(np.asarray(g), np.zeros((1, 3)))

    def test_soft_resampling_differentiable(self):
        def f(logw):
            _, corrected = resampling.soft_indices_and_weights(
                logw, KEY, alpha=0.5)
            return jnp.sum(corrected)
        g = jax.grad(f)(jnp.asarray([[0.1, 0.2, 0.7]]))
        assert np.abs(np.asarray(g)).sum() > 0


class TestSoftResampling:
    def test_alpha_one_matches_weights(self):
        # alpha=1: q == w, so corrected log-weights are all ~0 (uniform).
        logw = jnp.log(jnp.asarray([[0.2, 0.3, 0.5]]))
        _, corrected = resampling.soft_indices_and_weights(
            logw, KEY, alpha=1.0)
        np.testing.assert_allclose(np.asarray(corrected),
                                   np.zeros((1, 3)), atol=1e-5)

    def test_marginals_unbiased(self):
        # E[w(a)/q(a) * 1(a=i)] = w_i for the mixture proposal q.
        weight = np.array([0.1, 0.2, 0.7])
        num_trials = 20000
        logw = jnp.broadcast_to(jnp.log(jnp.asarray(weight)),
                                (num_trials, 3))
        idx, corrected = resampling.soft_indices_and_weights(
            logw, KEY, alpha=0.5)
        idx, ratio = np.asarray(idx), np.exp(np.asarray(corrected))
        est = np.array([(ratio * (idx == i)).sum() / (num_trials * 3)
                        for i in range(3)])
        np.testing.assert_allclose(est, weight, atol=2e-2)


class TestUnderJit:
    def test_jit_and_scan_compatible(self):
        @jax.jit
        def f(logw, key):
            return resampling.sample_ancestral_index(logw, key)
        logw = jnp.asarray(np.random.randn(4, 8))
        idx = f(logw, KEY)
        assert idx.shape == (4, 8)


class TestDenseOneHotPath:
    """Small-K dense resampling: one compare matrix yields both the
    ancestor indices and a one-hot MXU gather whose VJP is a matmul
    transpose (no scatter - the XLA scatter-add backward dominated the
    small-K training step on TPU). Must be EXACTLY equal to the XLA
    searchsorted + take_along_axis path (same PRNG stream)."""

    @pytest.mark.parametrize("method",
                             ["systematic", "stratified", "multinomial"])
    def test_exact_vs_xla_path(self, method):
        logw = jax.random.normal(KEY, (5, 64)) * 2.0
        value = jax.random.normal(jax.random.PRNGKey(9), (5, 64, 3))
        k2 = jax.random.PRNGKey(11)
        idx_ref = resampling.sample_ancestral_index(
            logw, k2, method=method, implementation="xla")
        pos = resampling.resampling_positions(logw, k2, method)
        idx_d, gathered = resampling.dense_indices_and_gather(
            jax.lax.stop_gradient(logw), pos, value)
        np.testing.assert_array_equal(np.asarray(idx_ref),
                                      np.asarray(idx_d))
        ref_g = jnp.take_along_axis(value, idx_ref[:, :, None], axis=1)
        np.testing.assert_array_equal(np.asarray(ref_g),
                                      np.asarray(gathered))

    def test_fused_entry_routes_dense_and_matches(self):
        logw = jax.random.normal(KEY, (4, 50))
        value = {"x": jax.random.normal(jax.random.PRNGKey(2), (4, 50)),
                 "y": jax.random.normal(jax.random.PRNGKey(3), (4, 50, 2))}
        idx1, g1 = resampling.sample_ancestral_index_and_resample(
            logw, KEY, value, implementation="xla")
        idx2 = resampling.sample_ancestral_index(logw, KEY,
                                                 implementation="xla")
        np.testing.assert_array_equal(np.asarray(idx1), np.asarray(idx2))
        for k, leaf in value.items():
            expanded = idx2.reshape(idx2.shape + (1,) * (leaf.ndim - 2))
            ref = jnp.take_along_axis(leaf, expanded, axis=1)
            np.testing.assert_array_equal(np.asarray(g1[k]),
                                          np.asarray(ref))

    def test_gradients_match_take_along_axis(self):
        logw = jax.random.normal(KEY, (3, 32))
        value = jax.random.normal(jax.random.PRNGKey(5), (3, 32))
        pos = resampling.resampling_positions(logw, KEY, "systematic")

        def f_dense(v):
            _, g = resampling.dense_indices_and_gather(
                jax.lax.stop_gradient(logw), pos, v)
            return jnp.sum(jnp.sin(g))

        def f_taa(v):
            idx = resampling.sample_ancestral_index(
                logw, KEY, implementation="xla")
            return jnp.sum(jnp.sin(jnp.take_along_axis(v, idx, axis=1)))

        gd = jax.grad(f_dense)(value)
        gt = jax.grad(f_taa)(value)
        np.testing.assert_allclose(np.asarray(gd), np.asarray(gt),
                                   atol=1e-6)

    def test_no_scatter_in_backward_hlo(self):
        logw = jax.random.normal(KEY, (3, 32))
        value = jax.random.normal(jax.random.PRNGKey(5), (3, 32))

        def f(v):
            _, g = resampling.sample_ancestral_index_and_resample(
                logw, KEY, v, implementation="xla")
            return jnp.sum(g ** 2)

        hlo = jax.jit(jax.grad(f)).lower(value).as_text()
        assert "scatter" not in hlo


class TestCdfInvariants:
    """The bin-edge contract every implementation relies on: monotone
    CDF ending at exactly 1.0, positions strictly below 1.0 (at huge K
    the f32 systematic grid otherwise rounds its top positions to 1.0,
    leaving the last output slot with no strictly-greater CDF entry)."""

    def test_cdf_monotone_and_pinned(self):
        logw = jax.random.normal(KEY, (3, 4096)) * 5.0
        cum = np.asarray(resampling._normalized_cumsum(logw))
        assert (np.diff(cum, axis=1) >= 0).all()
        np.testing.assert_array_equal(cum[:, -1], np.ones(3))

    @pytest.mark.parametrize("method",
                             ["systematic", "stratified", "multinomial"])
    def test_positions_strictly_below_one(self, method):
        logw = jnp.zeros((2, 1 << 14))
        pos = np.asarray(resampling.resampling_positions(logw, KEY, method))
        assert (pos < 1.0).all()
        assert (np.diff(pos, axis=1) >= 0).all()

    def test_boundary_position_selects_last_particle(self):
        # A position at nextafter(1.0) must gather the last real
        # particle through the dense one-hot path (crossing == count).
        logw = jnp.zeros((1, 64))
        pos = jnp.full((1, 64), np.nextafter(np.float32(1.0),
                                             np.float32(0.0)))
        value = jnp.arange(64.0)[None, :]
        idx, g = resampling.dense_indices_and_gather(logw, pos, value)
        np.testing.assert_array_equal(np.asarray(idx),
                                      np.full((1, 64), 63))
        np.testing.assert_array_equal(np.asarray(g),
                                      np.full((1, 64), 63.0))


class TestFusedSoftResampling:
    """soft_resample_and_gather: the pallas-fused path must match the
    unfused soft_indices_and_weights + XLA gather bit-for-bit in indices
    and to float tolerance in corrected weights, values and gradients."""

    def setup_method(self):
        resample_pallas.FORCE_INTERPRET = True

    def teardown_method(self):
        resample_pallas.FORCE_INTERPRET = False

    def test_matches_unfused(self):
        key = jax.random.PRNGKey(3)
        logw = jax.random.normal(key, (3, 512)) * 2.0
        value = {"x": jax.random.normal(jax.random.PRNGKey(4), (3, 512)),
                 "y": jax.random.normal(jax.random.PRNGKey(5),
                                        (3, 512, 2))}
        kk = jax.random.PRNGKey(6)
        idx_f, corr_f, val_f = resampling.soft_resample_and_gather(
            logw, kk, value, alpha=0.5, implementation="pallas")
        idx_u, corr_u = resampling.soft_indices_and_weights(
            logw, kk, alpha=0.5)
        val_u = resampling.resample_particles(value, idx_u)
        np.testing.assert_array_equal(np.asarray(idx_f), np.asarray(idx_u))
        np.testing.assert_allclose(np.asarray(corr_f), np.asarray(corr_u),
                                   atol=1e-6)
        for k in value:
            np.testing.assert_allclose(np.asarray(val_f[k]),
                                       np.asarray(val_u[k]), atol=1e-6)

    def test_gradients_match_unfused(self):
        key = jax.random.PRNGKey(7)
        logw = jax.random.normal(key, (2, 256))
        value = jax.random.normal(jax.random.PRNGKey(8), (2, 256))
        kk = jax.random.PRNGKey(9)

        def fused(lw):
            _, corr, val = resampling.soft_resample_and_gather(
                lw, kk, value, alpha=0.5, implementation="pallas")
            return jnp.sum(corr ** 2) + jnp.sum(val)

        def unfused(lw):
            idx, corr = resampling.soft_indices_and_weights(
                lw, kk, alpha=0.5)
            val = resampling.resample_particles(value, idx)
            return jnp.sum(corr ** 2) + jnp.sum(val)

        gf = jax.grad(fused)(logw)
        gu = jax.grad(unfused)(logw)
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gu),
                                   atol=1e-5, rtol=1e-5)

    def test_xla_fallback_path(self):
        key = jax.random.PRNGKey(10)
        logw = jax.random.normal(key, (2, 64))
        value = jax.random.normal(jax.random.PRNGKey(11), (2, 64))
        idx, corr, val = resampling.soft_resample_and_gather(
            logw, jax.random.PRNGKey(12), value, alpha=0.7,
            implementation="xla")
        idx_u, corr_u = resampling.soft_indices_and_weights(
            logw, jax.random.PRNGKey(12), alpha=0.7)
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_u))
        np.testing.assert_allclose(np.asarray(corr), np.asarray(corr_u),
                                   atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(val),
            np.asarray(jnp.take_along_axis(value, idx_u, axis=1)),
            atol=1e-6)


class TestMultiColumnFusedPath:
    """Round-2: MAX_FUSED_COLUMNS raised to 12 so 10-dim latent models
    (lgssm_nd-sized) keep the single fused kernel."""

    def setup_method(self):
        resample_pallas.FORCE_INTERPRET = True

    def teardown_method(self):
        resample_pallas.FORCE_INTERPRET = False

    def test_ten_column_fused_matches_xla(self):
        key = jax.random.PRNGKey(0)
        logw = jax.random.normal(key, (2, 512))
        value = jax.random.normal(jax.random.PRNGKey(1), (2, 512, 10))
        idx, out = resampling.sample_ancestral_index_and_resample(
            logw, jax.random.PRNGKey(2), value, implementation="pallas")
        idx_x = resampling.sample_ancestral_index(
            logw, jax.random.PRNGKey(2), implementation="xla")
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_x))
        ref = jnp.take_along_axis(value, idx_x[:, :, None], axis=1)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_fused_soft_positions_clamped_like_unfused():
    """Round-2 review fix: the fused soft path must clamp its multinomial
    positions strictly below 1.0 exactly like resampling_positions, or a
    position rounding to 1.0 selects a zero-weight tail particle that
    the unfused path does not (alpha=1, -inf weight tail)."""
    resample_pallas.FORCE_INTERPRET = True
    try:
        lw = jax.random.normal(jax.random.PRNGKey(2), (2, 512))
        lw = lw.at[:, -40:].set(-jnp.inf)
        v = jax.random.normal(jax.random.PRNGKey(3), (2, 512))
        kk = jax.random.PRNGKey(4)
        i_f, c_f, _ = resampling.soft_resample_and_gather(
            lw, kk, v, alpha=1.0, implementation="pallas")
        i_u, c_u = resampling.soft_indices_and_weights(lw, kk, alpha=1.0)
        np.testing.assert_array_equal(np.asarray(i_f), np.asarray(i_u))
        np.testing.assert_allclose(np.asarray(c_f), np.asarray(c_u),
                                   atol=1e-6)
    finally:
        resample_pallas.FORCE_INTERPRET = False


def test_resolve_implementation_memory_guard():
    # B-invariant K=512 time crossover, PLUS the dense-mask memory
    # guard: shapes whose per-step [B, K, K] compare mask exceeds 64 MB
    # route to the kernel even below K=512 (measured OOM at B=128,
    # K=512, T=200 - benchmarks/BENCH_NOTES.md round 3).
    from unittest import mock
    from aesmc_tpu import resampling as R
    from aesmc_tpu.ops import resample_pallas as rp
    with mock.patch.object(jax, "default_backend", return_value="tpu"), \
            mock.patch.object(rp, "AVAILABLE", True):
        assert R.resolve_implementation((10, 256), "systematic",
                                        "auto") == "xla"
        assert R.resolve_implementation((10, 512), "systematic",
                                        "auto") == "pallas"
        # 4 * 512 * 256^2 = 128 MB > 64 MB -> kernel despite K < 512.
        assert R.resolve_implementation((512, 256), "systematic",
                                        "auto") == "pallas"
        # 4 * 128 * 256^2 = 33 MB -> dense still wins.
        assert R.resolve_implementation((128, 256), "systematic",
                                        "auto") == "xla"


class TestResidual:
    """Residual resampling (Liu & Chen 1998) specifics."""

    def test_floor_guarantee(self):
        """Defining property: every particle gets AT LEAST
        floor(K * w_i) offspring, deterministically, every draw."""
        weight = np.array([0.05, 0.12, 0.4, 0.28, 0.15])
        k = 20
        w = np.tile(weight, 4)
        w /= w.sum()
        logw = jnp.log(jnp.asarray(w))[None]
        floors = np.floor(k * w)
        for seed in range(25):
            idx = np.asarray(resampling.residual_indices(
                logw, jax.random.PRNGKey(seed)))[0]
            counts = np.bincount(idx, minlength=k)
            assert np.all(counts >= floors), (counts, floors)

    def test_counts_sum_to_k(self):
        logw = jax.random.normal(jax.random.PRNGKey(3), (4, 33))
        idx = np.asarray(resampling.residual_indices(logw, KEY))
        for b in range(4):
            assert np.bincount(idx[b], minlength=33).sum() == 33

    def test_sorted(self):
        logw = jax.random.normal(jax.random.PRNGKey(4), (3, 50))
        idx = np.asarray(resampling.residual_indices(logw, KEY))
        assert np.all(np.diff(idx, axis=1) >= 0)

    def test_lower_offspring_variance_than_multinomial(self):
        """Var(N_i) = Var over the residual block only - strictly below
        multinomial's K w(1-w) in aggregate."""
        weight = np.array([0.45, 0.3, 0.15, 0.07, 0.03])
        logw = jnp.broadcast_to(jnp.log(jnp.asarray(weight)), (4000, 5))
        counts = {}
        for method in ("residual", "multinomial"):
            idx = np.asarray(resampling.sample_ancestral_index(
                logw, KEY, method=method))
            counts[method] = np.stack(
                [np.bincount(row, minlength=5) for row in idx])
        var_res = counts["residual"].var(axis=0).sum()
        var_mult = counts["multinomial"].var(axis=0).sum()
        assert var_res < 0.6 * var_mult, (var_res, var_mult)

    def test_uniform_weights_identity_counts(self):
        """Exact-multiple weights: zero residual, fully deterministic -
        every particle exactly once."""
        logw = jnp.zeros((2, 16))
        for seed in range(5):
            idx = np.asarray(resampling.residual_indices(
                logw, jax.random.PRNGKey(seed)))
            np.testing.assert_array_equal(
                idx, np.broadcast_to(np.arange(16), (2, 16)))

    def test_pallas_rejected(self):
        logw = jnp.zeros((1, 8))
        with pytest.raises(ValueError, match="residual"):
            resampling.sample_ancestral_index(logw, KEY,
                                              method="residual",
                                              implementation="pallas")
        with pytest.raises(ValueError, match="residual"):
            resampling.sample_ancestral_index_and_resample(
                logw, KEY, jnp.zeros((1, 8)), method="residual",
                implementation="pallas")

    def test_engine_integration_kalman(self):
        """infer(resampling_method='residual') on the LGSSM with the
        optimal proposal: log-Z within MC tolerance of exact Kalman."""
        from aesmc_tpu import inference, statistics
        from aesmc_tpu.models import kalman, lgssm

        a, q, em, r0 = 0.9, 1.0, 1.0, 0.25
        initial = lgssm.Initial(0.0, 1.0)
        transition = lgssm.Transition.create(a, np.sqrt(q))
        emission = lgssm.Emission.create(em, np.sqrt(r0))
        prec_t = 1.0 / q + em ** 2 / r0
        prec_0 = 1.0 + em ** 2 / r0
        proposal = lgssm.Proposal(
            lin_0_weight=jnp.asarray((em / r0) / prec_0),
            lin_0_bias=jnp.asarray(0.0),
            lin_t_weight=jnp.asarray([(a / q) / prec_t,
                                      (em / r0) / prec_t]),
            lin_t_bias=jnp.asarray(0.0),
            scale_0=float(np.sqrt(1.0 / prec_0)),
            scale_t=float(np.sqrt(1.0 / prec_t)))
        _, obs = statistics.sample_from_prior(
            initial, transition, emission, 20, 2, jax.random.PRNGKey(8))
        out = inference.infer(
            "smc", obs, initial, transition, emission, proposal, 2048,
            key=jax.random.PRNGKey(9), resampling_method="residual",
            return_log_marginal_likelihood=True)
        params = kalman.KalmanParams(0.0, 1.0, a, 0.0, q, em, 0.0, r0)
        lz = np.asarray(out["log_marginal_likelihood"])
        for b in range(2):
            exact = kalman.kalman_filter(
                np.asarray(obs[:, b], np.float64), params)[-1]
            assert abs(lz[b] - exact) < 0.1, (b, lz[b], exact)


class TestWideStatePallasRoute:
    """WIDE states (> MAX_FUSED_COLUMNS feature columns, e.g. VRNN
    latents [B, K, 64]) on the pallas implementation: round-4 fix for a
    measured 8x cliff (BENCH_NOTES round-4 MFU) - the gather routes to
    one XLA take_along row-gather instead of per-column merge kernels.
    Must match the xla implementation exactly and stay differentiable
    in the gathered values (the per-column kernel had no VJP)."""

    def setup_method(self):
        resample_pallas.FORCE_INTERPRET = True

    def teardown_method(self):
        resample_pallas.FORCE_INTERPRET = False

    def test_matches_xla_and_differentiable(self):
        key = jax.random.PRNGKey(0)
        logw = jax.random.normal(key, (2, 512)) * 2.0
        value = {"z": jax.random.normal(jax.random.PRNGKey(1),
                                        (2, 512, 64)),
                 "s": jax.random.normal(jax.random.PRNGKey(2),
                                        (2, 512))}
        kk = jax.random.PRNGKey(3)
        idx_p, val_p = resampling.sample_ancestral_index_and_resample(
            logw, kk, value, method="systematic",
            implementation="pallas")
        idx_x = resampling.sample_ancestral_index(
            logw, kk, method="systematic", implementation="xla")
        np.testing.assert_array_equal(np.asarray(idx_p),
                                      np.asarray(idx_x))
        np.testing.assert_array_equal(
            np.asarray(val_p["z"]),
            np.asarray(jnp.take_along_axis(value["z"],
                                           idx_x[:, :, None], axis=1)))
        np.testing.assert_array_equal(
            np.asarray(val_p["s"]),
            np.asarray(jnp.take_along_axis(value["s"], idx_x, axis=1)))

        cot = jax.random.normal(jax.random.PRNGKey(4), (2, 512, 64))

        def through_engine(v):
            _, out = resampling.sample_ancestral_index_and_resample(
                logw, kk, {"z": v}, method="systematic",
                implementation="pallas")
            return jnp.sum(out["z"] * cot)

        def reference(v):
            return jnp.sum(
                jnp.take_along_axis(v, idx_x[:, :, None], axis=1) * cot)

        g_eng = jax.grad(through_engine)(value["z"])
        g_ref = jax.grad(reference)(value["z"])
        np.testing.assert_allclose(np.asarray(g_eng), np.asarray(g_ref),
                                   atol=1e-6, rtol=1e-6)


class TestIntegerFusedTransport:
    """Round-5 discrete-path fix (VERDICT r4 #1): integer particles ride
    the fused resample+gather kernel via exact f32 transport (one column
    for <=16-bit dtypes, a lo/hi 16-bit column pair for 32-bit) instead
    of silently bypassing it to the XLA gather. All comparisons are
    BIT-exact: the kernel moves values by masked f32 sums with exactly
    one nonzero term, and every transported value is an integer
    representable in f32."""

    def setup_method(self):
        resample_pallas.FORCE_INTERPRET = True

    def teardown_method(self):
        resample_pallas.FORCE_INTERPRET = False

    def test_split_columns_roundtrip_bit_exact(self):
        """Identity 'gather': encode -> rebuild reproduces every leaf
        exactly, including int32 extremes beyond f32's 2^24 integer
        range (transported as two 16-bit halves)."""
        value = {
            "i32": jnp.asarray(
                [-(2 ** 31), 2 ** 31 - 1, 123_456_789, -1, 0, 7,
                 -65_536, 65_535], jnp.int32).reshape(1, 8),
            "u32": jnp.asarray(
                [0, 2 ** 32 - 1, 2 ** 24 + 1, 65_535, 5, 1, 2, 3],
                jnp.uint32).reshape(1, 8),
            "i8": jnp.arange(-4, 4, dtype=jnp.int8).reshape(1, 8),
            "i16": jnp.asarray(
                [-32_768, 32_767, 0, 1, -1, 100, -100, 7],
                jnp.int16).reshape(1, 8),
            "b": jnp.asarray([True, False] * 4).reshape(1, 8),
            "f": jnp.linspace(-1.0, 1.0, 8).reshape(1, 8),
        }
        cols, rebuild = resampling._split_columns(value)
        assert cols is not None
        # 32-bit leaves cost two columns each, the rest one.
        assert len(cols) == 2 + 2 + 1 + 1 + 1 + 1
        out = rebuild(list(cols))
        for name in value:
            assert out[name].dtype == value[name].dtype, name
            np.testing.assert_array_equal(np.asarray(out[name]),
                                          np.asarray(value[name]), name)

    def test_int64_still_rejected(self):
        cols, rebuild = resampling._split_columns(
            {"x": jnp.zeros((1, 8), jnp.int32).astype(jnp.int64)
             if jax.config.jax_enable_x64 else
             jnp.zeros((1, 8), jnp.float16)})
        # Either an int64 leaf (x64 mode) or any other unlisted dtype
        # keeps the (None, None) no-fusion contract... f16 IS a float,
        # so only assert in x64 mode.
        if jax.config.jax_enable_x64:
            assert cols is None and rebuild is None

    @pytest.mark.parametrize("method", ["systematic", "multinomial"])
    def test_fused_int32_matches_xla_take_along(self, method):
        """End-to-end through sample_ancestral_index_and_resample: a
        mixed float + int32 pytree on the fused pallas path returns the
        same indices as the xla implementation and gathers the int
        leaf exactly (incl. negative values)."""
        key = jax.random.PRNGKey(0)
        logw = jax.random.normal(key, (2, 512)) * 2.0
        disc = jax.random.randint(jax.random.PRNGKey(1), (2, 512),
                                  -(2 ** 20), 2 ** 20, dtype=jnp.int32)
        value = {"disc": disc,
                 "x": jax.random.normal(jax.random.PRNGKey(2), (2, 512))}
        kk = jax.random.PRNGKey(3)
        idx_p, out = resampling.sample_ancestral_index_and_resample(
            logw, kk, value, method=method, implementation="pallas")
        idx_x = resampling.sample_ancestral_index(
            logw, kk, method=method, implementation="xla")
        np.testing.assert_array_equal(np.asarray(idx_p), np.asarray(idx_x))
        assert out["disc"].dtype == jnp.int32
        np.testing.assert_array_equal(
            np.asarray(out["disc"]),
            np.asarray(jnp.take_along_axis(disc, idx_x, axis=1)))
        np.testing.assert_array_equal(
            np.asarray(out["x"]),
            np.asarray(jnp.take_along_axis(value["x"], idx_x, axis=1)))

    def test_sorted_gather_int32_and_int8(self):
        """resample_particles on the pallas path: integer leaves ride
        gather_sorted_pallas through the same exact transport."""
        k = 512
        disc32 = jax.random.randint(jax.random.PRNGKey(1), (2, k),
                                    -(2 ** 30), 2 ** 30, dtype=jnp.int32)
        disc8 = jax.random.randint(jax.random.PRNGKey(2), (2, k),
                                   -128, 128, dtype=jnp.int32
                                   ).astype(jnp.int8)
        idx = jnp.sort(jax.random.randint(jax.random.PRNGKey(3), (2, k),
                                          0, k, dtype=jnp.int32), axis=1)
        out = resampling.resample_particles(
            {"a": disc32, "b": disc8}, idx, implementation="pallas")
        assert out["a"].dtype == jnp.int32 and out["b"].dtype == jnp.int8
        np.testing.assert_array_equal(
            np.asarray(out["a"]),
            np.asarray(jnp.take_along_axis(disc32, idx, axis=1)))
        np.testing.assert_array_equal(
            np.asarray(out["b"]),
            np.asarray(jnp.take_along_axis(disc8, idx, axis=1)))
