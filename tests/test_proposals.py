"""Auto-linearized EKF/UKF proposals (aesmc_tpu.proposals, beyond
parity): exactness on linear models (EKF == the locally-optimal
proposal), engine integration, and variance reduction vs bootstrap on
a nonlinear model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import struct

from aesmc_tpu import distributions as dists
from aesmc_tpu import inference, proposals, statistics
from aesmc_tpu.models import kalman, lgssm
from aesmc_tpu.state import BatchShapeMode

KEY = jax.random.PRNGKey(0)

A, QS, C, RS = 0.9, 1.0, 1.3, 0.5   # transition/emission mult+scale


def _scalar_proposal(linearization):
    return proposals.ekf_proposal(
        transition_mean=lambda x: A * x, transition_cov=QS ** 2,
        emission_mean=lambda x: C * x, emission_cov=RS ** 2,
        initial_mean=0.0, initial_cov=1.0,
        linearization=linearization)


class TestLinearExactness:
    """On linear models the EKF (and UKF) conditional IS the exact
    locally-optimal proposal — closed form available."""

    @pytest.mark.parametrize("linearization",
                             ["extended", "unscented"])
    def test_time_t_matches_optimal_closed_form(self, linearization):
        prop = _scalar_proposal(linearization)
        B, K, T = 2, 5, 4
        x_prev = jax.random.normal(KEY, (B, K))
        obs = jax.random.normal(jax.random.PRNGKey(1), (T, B))
        d = prop(previous_latents=[x_prev], time=2, observations=obs)
        var_opt = 1.0 / (1.0 / QS ** 2 + C ** 2 / RS ** 2)
        loc_opt = var_opt * (A * x_prev / QS ** 2 +
                             C * obs[2][:, None] / RS ** 2)
        np.testing.assert_allclose(np.asarray(d.loc),
                                   np.asarray(loc_opt), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(d.scale),
                                   np.sqrt(var_opt), rtol=1e-5)
        assert d.batch_shape_mode == BatchShapeMode.FULLY_EXPANDED

    @pytest.mark.parametrize("linearization",
                             ["extended", "unscented"])
    def test_time_0_matches_optimal_closed_form(self, linearization):
        prop = _scalar_proposal(linearization)
        obs = jax.random.normal(KEY, (3, 4))
        d = prop(time=0, observations=obs)
        var_opt = 1.0 / (1.0 + C ** 2 / RS ** 2)
        loc_opt = var_opt * C * obs[0] / RS ** 2
        np.testing.assert_allclose(np.asarray(d.loc),
                                   np.asarray(loc_opt), rtol=1e-5)
        assert d.batch_shape_mode == BatchShapeMode.BATCH_EXPANDED

    def test_vector_mode_matches_numpy_formula(self):
        rng = np.random.default_rng(0)
        a = np.array([[0.9, 0.1], [0.0, 0.7]])
        q = np.array([[0.5, 0.1], [0.1, 0.4]])
        c = np.array([[1.0, 0.5]])
        r = np.array([[0.09]])
        prop = proposals.ekf_proposal(
            transition_mean=lambda x: jnp.asarray(a) @ x,
            transition_cov=jnp.asarray(q),
            emission_mean=lambda x: jnp.asarray(c) @ x,
            emission_cov=jnp.asarray(r),
            initial_mean=jnp.zeros(2), initial_cov=jnp.eye(2))
        B, K = 2, 3
        x_prev = jnp.asarray(rng.standard_normal((B, K, 2)))
        obs = jnp.asarray(rng.standard_normal((4, B, 1)))
        d = prop(previous_latents=[x_prev], time=1, observations=obs)
        # Closed form per particle.
        s = c @ q @ c.T + r
        gain = q @ c.T @ np.linalg.inv(s)
        cov_opt = q - gain @ s @ gain.T
        for b in range(B):
            for k in range(K):
                m = a @ np.asarray(x_prev)[b, k]
                loc_opt = m + gain @ (np.asarray(obs)[1, b] - c @ m)
                np.testing.assert_allclose(np.asarray(d.loc)[b, k],
                                           loc_opt, rtol=1e-4)
                got_cov = (np.asarray(d.scale_tril)[b, k] @
                           np.asarray(d.scale_tril)[b, k].T)
                np.testing.assert_allclose(got_cov, cov_opt,
                                           rtol=1e-4, atol=1e-6)

    def test_unscented_matches_extended_on_linear(self):
        # Sigma points are exact for linear g: identical proposals.
        pe = _scalar_proposal("extended")
        pu = _scalar_proposal("unscented")
        x_prev = jax.random.normal(KEY, (2, 8))
        obs = jax.random.normal(jax.random.PRNGKey(3), (3, 2))
        de = pe(previous_latents=[x_prev], time=1, observations=obs)
        du = pu(previous_latents=[x_prev], time=1, observations=obs)
        np.testing.assert_allclose(np.asarray(de.loc),
                                   np.asarray(du.loc), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(de.scale),
                                   np.asarray(du.scale), rtol=1e-5)

    def test_validation(self):
        with pytest.raises(ValueError, match="linearization"):
            proposals.ekf_proposal(lambda x: x, 1.0, lambda x: x, 1.0,
                                   0.0, 1.0, linearization="bogus")


class TestEngineIntegration:
    def test_lgssm_smc_with_ekf_proposal_matches_kalman(self):
        T, B = 30, 2
        initial = lgssm.Initial(0.0, 1.0)
        transition = lgssm.Transition.create(A, QS)
        emission = lgssm.Emission.create(C, RS)
        _, obs = statistics.sample_from_prior(
            initial, transition, emission, T, B, KEY)
        prop = _scalar_proposal("extended")
        out = inference.infer(
            "smc", obs, initial, transition, emission, prop, 1024,
            key=jax.random.PRNGKey(5),
            return_log_marginal_likelihood=True, return_latents=False)
        for b in range(B):
            exact = kalman.kalman_filter(
                np.asarray(obs)[:, b], kalman.KalmanParams(
                    0.0, 1.0, A, 0.0, QS ** 2, C, 0.0, RS ** 2))[4]
            got = float(out["log_marginal_likelihood"][b])
            assert abs(got - exact) < 0.5, (got, exact)

    def test_variance_reduction_vs_bootstrap(self):
        T, B = 25, 1
        initial = lgssm.Initial(0.0, 1.0)
        transition = lgssm.Transition.create(A, QS)
        emission = lgssm.Emission.create(C, 0.3)   # informative obs
        _, obs = statistics.sample_from_prior(
            initial, transition, emission, T, B, KEY)
        ekf = proposals.ekf_proposal(
            lambda x: A * x, QS ** 2, lambda x: C * x, 0.09, 0.0, 1.0)

        def bootstrap(previous_latents=None, time=None,
                      observations=None):
            if previous_latents is None:
                return initial()
            return transition(previous_latents=previous_latents,
                              time=time)

        def lzs(proposal):
            vals = []
            for seed in range(6):
                out = inference.infer(
                    "smc", obs, initial, transition, emission,
                    proposal, 64, key=jax.random.PRNGKey(seed),
                    return_log_marginal_likelihood=True,
                    return_latents=False)
                vals.append(float(out["log_marginal_likelihood"][0]))
            return np.asarray(vals)

        std_ekf = lzs(ekf).std()
        std_boot = lzs(bootstrap).std()
        assert std_ekf < std_boot, (std_ekf, std_boot)


@struct.dataclass
class NlInitial:
    def __call__(self):
        return dists.Normal(0.0, 1.0)


@struct.dataclass
class NlTransition:
    def __call__(self, previous_latents=None, time=None,
                 previous_observations=None):
        x = previous_latents[-1]
        return dists.Normal(
            0.5 * x + 2.0 * jnp.tanh(x), 1.0,
            batch_shape_mode=BatchShapeMode.FULLY_EXPANDED)


@struct.dataclass
class NlEmission:
    """Mildly nonlinear (g' in [0.8, 1.2]) but SHARP (scale 0.1):
    bootstrap collapses against the informative observation while one
    linearization step is near-exact."""

    def __call__(self, latents=None, time=None,
                 previous_observations=None):
        x = latents[-1]
        return dists.Normal(
            x + 0.2 * jnp.sin(x), 0.1,
            batch_shape_mode=BatchShapeMode.FULLY_EXPANDED)


class TestNonlinearModel:
    @pytest.mark.parametrize("linearization",
                             ["extended", "unscented"])
    def test_beats_bootstrap_ess_and_logz(self, linearization):
        # Measured (10 seeds, K=64): EKF ESS 55.4, UKF 56.2, bootstrap
        # 7.8; log-Z mean -22.8/-22.4 vs -24.3 (the estimator is
        # downward-biased, so higher mean = tighter), std 0.49/0.22 vs
        # 0.80.
        T, B, K = 20, 1, 64
        initial, transition, emission = (NlInitial(), NlTransition(),
                                         NlEmission())
        _, obs = statistics.sample_from_prior(
            initial, transition, emission, T, B, KEY)
        prop = proposals.ekf_proposal(
            transition_mean=lambda x: 0.5 * x + 2.0 * jnp.tanh(x),
            transition_cov=1.0,
            emission_mean=lambda x: x + 0.2 * jnp.sin(x),
            emission_cov=0.01, initial_mean=0.0, initial_cov=1.0,
            linearization=linearization)

        def bootstrap(previous_latents=None, time=None,
                      observations=None):
            if previous_latents is None:
                return initial()
            return transition(previous_latents=previous_latents,
                              time=time)

        def stats(proposal):
            run = jax.jit(lambda k: inference.infer(
                "smc", obs, initial, transition, emission, proposal,
                K, key=k, return_log_marginal_likelihood=True,
                return_log_weights=True))
            lz = np.asarray([
                float(run(jax.random.PRNGKey(s))[
                    "log_marginal_likelihood"][0])
                for s in range(5)])
            lw = np.asarray(run(KEY)["log_weights"])      # [T, B, K]
            w = np.exp(lw - lw.max(axis=2, keepdims=True))
            w /= w.sum(axis=2, keepdims=True)
            return (1.0 / (w ** 2).sum(axis=2)).mean(), lz

        ess_p, lz_p = stats(prop)
        ess_b, lz_b = stats(bootstrap)
        assert np.isfinite(lz_p).all() and np.isfinite(lz_b).all()
        assert ess_p > 4.0 * ess_b, (ess_p, ess_b)
        assert lz_p.mean() > lz_b.mean(), (lz_p.mean(), lz_b.mean())
