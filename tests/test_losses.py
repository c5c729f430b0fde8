"""Objective tests: validation, estimator identities, gradient flow."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aesmc_tpu import losses, statistics
from aesmc_tpu.models import gaussian, lgssm

KEY = jax.random.PRNGKey(0)


def _lgssm_setup(T=10, B=4):
    initial = lgssm.Initial(0.0, 1.0)
    transition = lgssm.Transition.create(0.9, 1.0)
    emission = lgssm.Emission.create(1.0, 0.1)
    proposal = lgssm.Proposal.create(1.0, 1.0, KEY)
    _, obs = statistics.sample_from_prior(initial, transition, emission,
                                          T, B, KEY)
    return obs, initial, transition, emission, proposal


class TestGetLoss:
    def test_bad_algorithm_raises(self):
        obs, *comps = _lgssm_setup()
        with pytest.raises(ValueError, match="algorithm"):
            losses.get_loss(obs, 8, "bogus", *comps, key=KEY)

    @pytest.mark.parametrize("algorithm", ["iwae", "aesmc"])
    def test_scalar_finite(self, algorithm):
        obs, *comps = _lgssm_setup()
        loss = losses.get_loss(obs, 8, algorithm, *comps, key=KEY)
        assert loss.shape == ()
        assert np.isfinite(float(loss))

    def test_iwae_equals_aesmc_single_timestep(self):
        # For T=1 the SMC and IS estimators coincide exactly.
        prior = gaussian.Prior.create(0.0, 1.0)
        lik = gaussian.Likelihood.create(1.0)
        q = gaussian.InferenceNetwork.create(0.5, 0.0, 0.8)
        obs = jnp.asarray(np.random.randn(1, 6))
        iwae = losses.get_loss(obs, 4, "iwae", prior, None, lik, q, key=KEY)
        aesmc = losses.get_loss(obs, 4, "aesmc", prior, None, lik, q,
                                key=KEY)
        np.testing.assert_allclose(float(iwae), float(aesmc), rtol=1e-5)

    def test_more_particles_tightens_bound(self):
        # E[IWAE ELBO] is nondecreasing in K; with many particles the
        # ordering holds with overwhelming probability.
        obs, *comps = _lgssm_setup(T=5, B=32)
        loss_small = losses.get_loss(obs, 2, "iwae", *comps, key=KEY)
        loss_large = losses.get_loss(obs, 256, "iwae", *comps, key=KEY)
        assert float(loss_large) < float(loss_small)

    def test_gradients_flow_to_all_components(self):
        obs, initial, transition, emission, proposal = _lgssm_setup()

        def loss_fn(components):
            return losses.get_loss(obs, 8, "aesmc", initial, components[0],
                                   components[1], components[2], key=KEY)

        grads = jax.grad(loss_fn)((transition, emission, proposal))
        g_leaves = jax.tree_util.tree_leaves(grads)
        assert all(np.all(np.isfinite(np.asarray(g))) for g in g_leaves)
        assert any(np.abs(np.asarray(g)).sum() > 0 for g in g_leaves)

    def test_loss_is_jittable(self):
        obs, *comps = _lgssm_setup()

        @jax.jit
        def f(obs, key):
            return losses.get_loss(obs, 8, "aesmc", *comps, key=key)

        assert np.isfinite(float(f(obs, KEY)))

    def test_elbo_estimates_log_marginal(self):
        # On the conjugate-Gaussian model with the optimal proposal, the
        # IWAE bound is tight: loss == -E[log p(y)] exactly.
        prior_mean, prior_std, obs_std = 0.3, 1.0, 0.7
        prior = gaussian.Prior.create(prior_mean, prior_std)
        lik = gaussian.Likelihood.create(obs_std)
        mult, offset, pstd = gaussian.get_proposal_params(
            prior_mean, prior_std, obs_std)
        q = gaussian.InferenceNetwork.create(mult, offset, pstd)
        ys = np.random.RandomState(0).randn(1, 512).astype(np.float32)
        loss = losses.get_loss(jnp.asarray(ys), 8, "iwae", prior, None,
                               lik, q, key=KEY)
        # log p(y) under N(prior_mean, prior_std^2 + obs_std^2)
        var = prior_std ** 2 + obs_std ** 2
        logp = -0.5 * ((ys[0] - prior_mean) ** 2 / var +
                       np.log(2 * np.pi * var))
        np.testing.assert_allclose(float(loss), -logp.mean(), rtol=1e-3)
