"""SMC^2 (aesmc_tpu.smc2, beyond parity): online parameter inference
validated against the exact Kalman-grid parameter posterior and the
exact prior-marginalized model evidence on the LGSSM oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats as sps

from aesmc_tpu import smc2, statistics
from aesmc_tpu.models import kalman, lgssm

KEY = jax.random.PRNGKey(0)


def _lgssm_theta_problem(T=25, B=1, true_mult=0.8, emission_scale=0.5,
                         seed=11):
    """LGSSM with unknown transition multiplier, near-optimal proposal
    (same setup as the PMMH oracle test)."""
    initial = lgssm.Initial(0.0, 1.0)
    emission = lgssm.Emission.create(1.0, emission_scale)
    sig = float(np.sqrt(1.0 / (1.0 + 1.0 / emission_scale ** 2)))
    proposal = lgssm.Proposal(
        lin_0_weight=jnp.asarray(0.8), lin_0_bias=jnp.asarray(0.0),
        lin_t_weight=jnp.asarray([0.2 * true_mult, 0.8]),
        lin_t_bias=jnp.asarray(0.0), scale_0=sig, scale_t=sig)
    _, obs = statistics.sample_from_prior(
        initial, lgssm.Transition.create(true_mult, 1.0), emission,
        T, B, jax.random.PRNGKey(seed))

    def build(theta):
        return (initial, lgssm.Transition(mult=theta["mult"], scale=1.0),
                emission, proposal)

    def log_prior(theta):
        return -0.5 * theta["mult"] ** 2              # N(0, 1)

    return obs, build, log_prior, emission_scale


def _exact_grid_posterior(obs, emission_scale, lo=-2.5, hi=2.5, n=501):
    """Exact p(mult | y) and log p(y) under the N(0,1) prior by
    quadrature over the Kalman likelihood."""
    grid = np.linspace(lo, hi, n)
    obs_np = np.asarray(obs)
    log_lik = np.array([
        sum(kalman.kalman_filter(
            obs_np[:, b], kalman.KalmanParams(
                0.0, 1.0, float(m), 0.0, 1.0, 1.0, 0.0,
                emission_scale ** 2))[4]
            for b in range(obs_np.shape[1]))
        for m in grid])
    log_prior = sps.norm.logpdf(grid)
    log_joint = log_lik + log_prior
    # Evidence: trapezoid over the grid.
    dm = grid[1] - grid[0]
    mx = log_joint.max()
    log_evidence = mx + np.log(np.trapezoid(np.exp(log_joint - mx),
                                            dx=dm))
    w = np.exp(log_joint - log_joint.max())
    w /= w.sum()
    mean = float((grid * w).sum())
    std = float(np.sqrt(((grid - mean) ** 2 * w).sum()))
    return mean, std, float(log_evidence)


def _weighted_moments(vals, log_w):
    w = np.exp(np.asarray(log_w) - np.max(np.asarray(log_w)))
    w /= w.sum()
    vals = np.asarray(vals)
    mean = float((vals * w).sum())
    std = float(np.sqrt(((vals - mean) ** 2 * w).sum()))
    return mean, std


class TestSmc2Oracle:
    def test_theta_posterior_and_evidence_match_kalman_grid(self):
        obs, build, log_prior, es = _lgssm_theta_problem()
        M = 384
        theta0 = {"mult": jax.random.normal(jax.random.PRNGKey(3),
                                            (M,))}
        out = smc2.smc2(obs, build, theta0, log_prior,
                        num_particles=64, key=jax.random.PRNGKey(7),
                        ess_threshold=0.5, num_moves=2, step_size=0.2)
        exact_mean, exact_std, exact_lz = _exact_grid_posterior(obs, es)

        mean, std = _weighted_moments(out["theta"]["mult"],
                                      out["log_theta_weight"])
        assert abs(mean - exact_mean) < max(3 * exact_std / np.sqrt(M),
                                            0.05), \
            (mean, exact_mean, exact_std)
        assert 0.5 < std / exact_std < 2.0, (std, exact_std)
        # Evidence: the SMC^2 estimator is unbiased in Z; log-Z noise
        # at M=384 should be within a couple of nats.
        assert abs(float(out["log_evidence"]) - exact_lz) < 2.0, \
            (float(out["log_evidence"]), exact_lz)
        # The cloud must have rejuvenated at least once on T=25 (prior
        # cloud degenerates fast) and accepted some moves.
        assert int(out["num_rejuvenations"]) >= 1
        assert float(out["acceptance_rate"]) > 0.02

    def test_no_rejuvenation_is_pure_importance_sampling(self):
        # ess_threshold=0: reweighting only. The theta cloud never
        # moves, so the result must equal prior-cloud importance
        # sampling with per-theta SMC evidence estimates.
        obs, build, log_prior, es = _lgssm_theta_problem(T=6)
        M = 32
        theta0 = {"mult": jax.random.normal(jax.random.PRNGKey(5),
                                            (M,))}
        out = smc2.smc2(obs, build, theta0, log_prior,
                        num_particles=32, key=jax.random.PRNGKey(9),
                        ess_threshold=0.0)
        assert int(out["num_rejuvenations"]) == 0
        assert float(out["acceptance_rate"]) == 0.0
        np.testing.assert_allclose(np.asarray(out["theta"]["mult"]),
                                   np.asarray(theta0["mult"]))
        # Weights must equal the summed inner cumulative evidence.
        np.testing.assert_allclose(
            np.asarray(out["log_theta_weight"]),
            np.asarray(out["inner_log_marginal_likelihood"]).sum(1),
            rtol=1e-5)


class TestSmc2Structure:
    def test_shapes_history_and_ess_path(self):
        obs, build, log_prior, es = _lgssm_theta_problem(T=7, B=2)
        M, K = 16, 8
        theta0 = {"mult": jax.random.normal(KEY, (M,))}
        out = smc2.smc2(obs, build, theta0, log_prior, num_particles=K,
                        key=KEY, return_history=True)
        assert out["theta"]["mult"].shape == (M,)
        assert out["log_theta_weight"].shape == (M,)
        assert out["inner_log_marginal_likelihood"].shape == (M, 2)
        assert out["ess_path"].shape == (7,)
        assert out["theta_history"]["mult"].shape == (7, M)
        assert out["log_theta_weight_history"].shape == (7, M)
        ess = np.asarray(out["ess_path"])
        assert np.all(ess >= 1.0 - 1e-4) and np.all(ess <= M + 1e-4)
        assert np.isfinite(float(out["log_evidence"]))

    def test_jittable(self):
        obs, build, log_prior, es = _lgssm_theta_problem(T=5)
        theta0 = {"mult": jax.random.normal(KEY, (8,))}

        @jax.jit
        def run(key):
            return smc2.smc2(obs, build, theta0, log_prior,
                             num_particles=8, key=key)["log_evidence"]

        a = run(jax.random.PRNGKey(0))
        b = run(jax.random.PRNGKey(0))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_validation_errors(self):
        obs, build, log_prior, es = _lgssm_theta_problem(T=3)
        with pytest.raises(ValueError, match="num_theta"):
            smc2.smc2(obs, build,
                      {"mult": jnp.zeros((1,))}, log_prior,
                      num_particles=4)
        with pytest.raises(ValueError, match="ess_threshold"):
            smc2.smc2(obs, build,
                      {"mult": jnp.zeros((4,))}, log_prior,
                      num_particles=4, ess_threshold=1.5)

    def test_t1_sequence(self):
        obs, build, log_prior, es = _lgssm_theta_problem(T=1)
        theta0 = {"mult": jax.random.normal(KEY, (8,))}
        out = smc2.smc2(obs, build, theta0, log_prior, num_particles=8,
                        key=KEY)
        assert out["ess_path"].shape == (1,)
        assert np.isfinite(float(out["log_evidence"]))
