"""Posterior-statistics tests; mirrors /root/reference/test/test_statistics.py:
exact-value empirical expectation, ESS incl. shift invariance at +-1e6,
plus sample_from_prior moments against the exact Kalman prior."""

import jax
import jax.numpy as jnp
import numpy as np

from aesmc_tpu import statistics
from aesmc_tpu.models import lgssm

KEY = jax.random.PRNGKey(0)


class TestEmpiricalExpectation:
    def test_shapes(self):
        value = jnp.asarray(np.random.randn(3, 4, 5))
        logw = jnp.asarray(np.random.randn(3, 4))
        out = statistics.empirical_expectation(value, logw, lambda x: x)
        assert out.shape == (3, 5)

    def test_exact_values(self):
        # Hand-weighted sum (reference test_statistics.py:32-42).
        value = jnp.asarray([[1.0, 2.0], [3.0, 4.0]])   # [B=2, K=2]
        logw = jnp.log(jnp.asarray([[0.25, 0.75], [0.5, 0.5]]))
        out = statistics.empirical_expectation(value, logw, lambda x: x)
        expected = np.array([0.25 * 1 + 0.75 * 2, 0.5 * 3 + 0.5 * 4])
        np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)

    def test_nonlinear_f(self):
        value = jnp.asarray([[1.0, 2.0]])
        logw = jnp.log(jnp.asarray([[0.5, 0.5]]))
        out = statistics.empirical_expectation(value, logw, lambda x: x ** 2)
        np.testing.assert_allclose(np.asarray(out), [2.5], atol=1e-5)


class TestEmpiricalMeanVariance:
    def test_against_numpy(self):
        rng = np.random.RandomState(0)
        value = rng.randn(2, 100)
        logw = rng.randn(2, 100)
        w = np.exp(logw - logw.max(1, keepdims=True))
        w = w / w.sum(1, keepdims=True)
        mean = statistics.empirical_mean(jnp.asarray(value),
                                         jnp.asarray(logw))
        var = statistics.empirical_variance(jnp.asarray(value),
                                            jnp.asarray(logw))
        np.testing.assert_allclose(np.asarray(mean), (w * value).sum(1),
                                   atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(var),
            (w * value ** 2).sum(1) - ((w * value).sum(1)) ** 2, atol=1e-4)

    def test_trailing_dims(self):
        value = jnp.asarray(np.random.randn(2, 3, 4, 5))
        logw = jnp.asarray(np.random.randn(2, 3))
        assert statistics.empirical_mean(value, logw).shape == (2, 4, 5)


class TestEss:
    def test_uniform_weights(self):
        logw = jnp.zeros((2, 50))
        np.testing.assert_allclose(np.asarray(statistics.ess(logw)),
                                   [50.0, 50.0], rtol=1e-4)

    def test_degenerate_weights(self):
        logw = jnp.asarray([[0.0, -1e9, -1e9]])
        np.testing.assert_allclose(np.asarray(statistics.ess(logw)), [1.0],
                                   rtol=1e-4)

    def test_shift_invariance_f64(self):
        # Reference test_statistics.py:71-115 verbatim: ESS of
        # [0.2, 0.3, 0.5] invariant to +-1e6 log-weight shifts; the
        # reference computes in float64 (torch.from_numpy), so does this.
        with jax.enable_x64(True):
            normalized_weight = np.array([0.2, 0.3, 0.5])
            expected = 1.0 / np.sum(normalized_weight ** 2)
            for shift in (np.log(0.47), 1e6, -1e6):
                logw = jnp.asarray(np.log(normalized_weight) + shift)
                np.testing.assert_allclose(
                    float(statistics.ess(logw)), expected, atol=1e-7)

    def test_shift_invariance_f32(self):
        # In f32, use an exactly-representable shift (adding 1e6 rounds
        # the inputs themselves to a 0.0625 grid).
        logw = jnp.asarray(np.random.randn(3, 20).astype(np.float32))
        base = np.asarray(statistics.ess(logw))
        for shift in (64.0, -64.0):
            shifted = np.asarray(statistics.ess(logw + shift))
            np.testing.assert_allclose(shifted, base, rtol=1e-3)

    def test_1d_input(self):
        logw = jnp.zeros((10,))
        np.testing.assert_allclose(float(statistics.ess(logw)), 10.0,
                                   rtol=1e-4)


class TestSampleFromPrior:
    def test_shapes(self):
        initial = lgssm.Initial(0.0, 1.0)
        transition = lgssm.Transition.create(0.9, 1.0)
        emission = lgssm.Emission.create(1.0, 0.1)
        latents, obs = statistics.sample_from_prior(
            initial, transition, emission, 7, 5, KEY)
        assert latents.shape == (7, 5)
        assert obs.shape == (7, 5)

    def test_single_timestep_no_transition(self):
        initial = lgssm.Initial(0.0, 1.0)
        emission = lgssm.Emission.create(1.0, 0.1)
        latents, obs = statistics.sample_from_prior(
            initial, None, emission, 1, 5, KEY)
        assert latents.shape == (1, 5)
        assert obs.shape == (1, 5)

    def test_prior_moments_match_kalman(self):
        # Marginal prior moments of x_t: m_t = a m_{t-1},
        # v_t = a^2 v_{t-1} + q.
        a, q0, q = 0.9, 1.0, 0.5
        initial = lgssm.Initial(0.0, np.sqrt(q0))
        transition = lgssm.Transition.create(a, np.sqrt(q))
        emission = lgssm.Emission.create(1.0, 0.01)
        T, B = 5, 20000
        latents, _ = statistics.sample_from_prior(
            initial, transition, emission, T, B, KEY)
        latents = np.asarray(latents)
        v = q0
        for t in range(T):
            if t > 0:
                v = a * a * v + q
            np.testing.assert_allclose(latents[t].mean(), 0.0,
                                       atol=5 * np.sqrt(v / B))
            np.testing.assert_allclose(latents[t].var(), v, rtol=0.1)


def test_sequence_statistics_match_per_step():
    key = jax.random.PRNGKey(0)
    vals = jax.random.normal(key, (5, 2, 64))
    logw = jax.random.normal(jax.random.PRNGKey(1), (2, 64))
    ms = statistics.empirical_mean_sequence(vals, logw)
    vs = statistics.empirical_variance_sequence(vals, logw)
    assert ms.shape == (5, 2) and vs.shape == (5, 2)
    for t in range(5):
        np.testing.assert_allclose(
            np.asarray(ms[t]),
            np.asarray(statistics.empirical_mean(vals[t], logw)),
            rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(vs[t]),
            np.asarray(statistics.empirical_variance(vals[t], logw)),
            rtol=1e-5, atol=1e-6)
