"""Resampler tests: shapes/dtype, statistical marginals against target
weights (reference test_inference.py:43-84), gradient detachment, NaN
guard, and variant coverage."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aesmc_tpu import resampling

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
