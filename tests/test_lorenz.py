"""Lorenz-96 chaotic SSM (aesmc_tpu.models.lorenz).

No closed-form oracle exists for a chaotic nonlinear model, so the
validation strategy is: (a) exact integrator checks (RK4 vs dense Euler
reference; the symmetric fixed point), (b) filter tracking (posterior
mean follows the true trajectory far inside the prior spread), (c) the
auto-built assimilation proposal beats the bootstrap proposal in
evidence tightness and ESS - the property that motivates the module.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aesmc_tpu import inference, statistics
from aesmc_tpu.models import lorenz

KEY = jax.random.PRNGKey(0)


class TestIntegrator:
    def test_rk4_step_converged_at_dt(self):
        """One RK4 step at dt agrees with 10 composed RK4 steps at
        dt/10 - the truncation error at the default dt=0.05 is ~4e-3
        on O(10) states (the DA-standard step size), far inside the
        q=0.5 process noise."""
        x0 = jax.random.normal(KEY, (6,)) + 8.0
        dt = 0.05
        coarse = lorenz.rk4_step(x0, dt)
        fine = x0
        for _ in range(10):
            fine = lorenz.rk4_step(fine, dt / 10)
        np.testing.assert_allclose(np.asarray(coarse), np.asarray(fine),
                                   atol=0.02)

    def test_fixed_point(self):
        """x = F * 1 is an equilibrium of the drift."""
        x = jnp.full((8,), 8.0)
        np.testing.assert_allclose(
            np.asarray(lorenz.lorenz96_drift(x)), np.zeros(8), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(lorenz.rk4_step(x)), np.asarray(x), atol=1e-6)

    def test_chaotic_divergence(self):
        """Nearby trajectories separate (positive Lyapunov exponent at
        F=8) - the property that makes this a filtering benchmark."""
        x = jax.random.normal(KEY, (8,)) + 8.0
        y = x + 1e-5
        for _ in range(200):
            x = lorenz.rk4_step(x)
            y = lorenz.rk4_step(y)
        assert float(jnp.max(jnp.abs(x - y))) > 0.1


class TestFilter:
    def _data(self, T, B, comps, seed=1):
        key = jax.random.PRNGKey(seed)
        initial, transition, emission, _ = comps
        latents, obs = statistics.sample_from_prior(
            initial, transition, emission, T, B, key)
        return latents, obs

    def test_bootstrap_filter_tracks_state(self):
        T, B, K = 15, 2, 512
        comps = lorenz.make_model(dim=8, emission_scale=0.5,
                                  proposal="bootstrap")
        latents, obs = self._data(T, B, comps)
        out = inference.infer(
            "smc", obs, *comps, K, key=KEY,
            return_log_marginal_likelihood=True, return_latents=False,
            return_log_weight=True)
        assert np.isfinite(np.asarray(out["log_marginal_likelihood"])).all()
        post_mean = statistics.empirical_mean(
            out["last_latent"], out["log_weight"])      # [B, D]
        truth = np.asarray(
            jax.tree_util.tree_map(lambda x: x[-1], latents))
        rmse = np.sqrt(np.mean((np.asarray(post_mean) - truth) ** 2))
        # Prior spread at T=15 is O(attractor scale ~ 3-5); a working
        # filter with r=0.5 full observation tracks much tighter.
        assert rmse < 1.0, rmse

    def test_assimilation_proposal_beats_bootstrap(self):
        T, B, K, seeds = 12, 2, 128, 3
        boot = lorenz.make_model(dim=8, emission_scale=0.7,
                                 proposal="bootstrap")
        assim = lorenz.make_model(dim=8, emission_scale=0.7,
                                  proposal="assimilation")
        _, obs = self._data(T, B, boot, seed=2)

        def lml_and_ess(comps, key):
            out = inference.infer(
                "smc", obs, *comps, K, key=key,
                return_log_marginal_likelihood=True,
                return_latents=False, return_log_weight=True)
            lw = out["log_weight"]
            ess = jnp.exp(2 * jax.nn.logsumexp(lw, axis=1) -
                          jax.nn.logsumexp(2 * lw, axis=1))
            return (float(jnp.mean(out["log_marginal_likelihood"])),
                    float(jnp.mean(ess)))

        b_lml, a_lml, b_ess, a_ess = [], [], [], []
        for s in range(seeds):
            k = jax.random.PRNGKey(100 + s)
            l, e = lml_and_ess(boot, k)
            b_lml.append(l)
            b_ess.append(e)
            l, e = lml_and_ess(assim, k)
            a_lml.append(l)
            a_ess.append(e)
        # The auto proposal gives a tighter (higher) evidence bound and
        # healthier weights.
        assert np.mean(a_lml) > np.mean(b_lml) + 1.0, (a_lml, b_lml)
        assert np.mean(a_ess) > np.mean(b_ess), (a_ess, b_ess)

    def test_partial_observation(self):
        """Observing every other component still filters (the classic
        hard setting); shapes follow obs_indices."""
        comps = lorenz.make_model(dim=8, obs_indices=range(0, 8, 2),
                                  emission_scale=0.5)
        latents, obs = self._data(10, 2, comps, seed=3)
        assert np.asarray(obs).shape == (10, 2, 4)
        out = inference.infer(
            "smc", obs, *comps, 256, key=KEY,
            return_log_marginal_likelihood=True, return_latents=False)
        assert np.isfinite(
            np.asarray(out["log_marginal_likelihood"])).all()
        assert np.asarray(
            jax.tree_util.tree_leaves(out["last_latent"])[0]).shape == \
            (2, 256, 8)

    def test_proposal_variants_agree_on_linear_emission(self):
        """The emission operator is linear and the propagated prior
        diagonal, so the closed-form diagonal update, the EKF
        (jacfwd) and the UKF (sigma points) proposals all coincide."""
        initial, transition, emission, _ = lorenz.make_model(dim=6)
        _, obs = self._data(8, 1, (initial, transition, emission, None),
                            seed=4)
        out = {}
        for lin in ("diagonal", "extended", "unscented"):
            prop = lorenz.assimilation_proposal(initial, transition,
                                                emission,
                                                linearization=lin)
            res = inference.infer(
                "smc", obs, initial, transition, emission, prop, 64,
                key=KEY, return_log_marginal_likelihood=True,
                return_latents=False)
            out[lin] = np.asarray(res["log_marginal_likelihood"])
        np.testing.assert_allclose(out["diagonal"], out["extended"],
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(out["extended"], out["unscented"],
                                   rtol=2e-4, atol=2e-4)

    def test_diagonal_proposal_partial_observation(self):
        """Closed-form proposal under partial observation: shapes and
        agreement with the generic path."""
        initial, transition, emission, _ = lorenz.make_model(
            dim=6, obs_indices=(0, 3))
        _, obs = self._data(6, 2, (initial, transition, emission, None),
                            seed=5)
        out = {}
        for lin in ("diagonal", "extended"):
            prop = lorenz.assimilation_proposal(initial, transition,
                                                emission,
                                                linearization=lin)
            res = inference.infer(
                "smc", obs, initial, transition, emission, prop, 32,
                key=KEY, return_log_marginal_likelihood=True,
                return_latents=False)
            out[lin] = np.asarray(res["log_marginal_likelihood"])
        np.testing.assert_allclose(out["diagonal"], out["extended"],
                                   rtol=2e-4, atol=2e-4)

    def test_validation(self):
        with pytest.raises(ValueError, match="proposal"):
            lorenz.make_model(proposal="bogus")
