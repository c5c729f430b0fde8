"""Tests for the localized (block) particle filter (aesmc_tpu/blockpf.py).

Tiers: exact reduction (one block == the bootstrap SMC engine,
bit-exact ancestors/latents/log-Z under matched keys), statistical
oracle (localization beats the curse of dimensionality on Lorenz-96 -
measured 13x RMSE reduction at D=16, K=128), and unit contracts.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aesmc_tpu import blockpf, inference, statistics
from aesmc_tpu import distributions as dists
from aesmc_tpu.models import lorenz


def _lorenz_setup(dim=16, T=20, K=128, obs_every=1, seed=3):
    obs_idx = tuple(range(0, dim, obs_every))
    initial, transition, emission, prop = lorenz.make_model(
        dim=dim, obs_indices=obs_idx, emission_scale=0.5,
        transition_scale=0.4, proposal="bootstrap")
    latents, obs = statistics.sample_from_prior(
        initial, transition, emission, T, 1, jax.random.PRNGKey(seed))
    truth = np.asarray(latents)[:, 0]
    return (initial, transition, emission, prop, obs, truth, obs_idx)


class TestExactReduction:
    def test_single_block_is_the_bootstrap_engine(self):
        initial, transition, emission, prop, obs, _, obs_idx = \
            _lorenz_setup(dim=8, T=10, K=64)
        key = jax.random.PRNGKey(0)
        out = jax.jit(lambda k: blockpf.block_pf(
            obs, initial, transition, emission, 64,
            blockpf.contiguous_blocks(8, 8), key=k, obs_indices=obs_idx,
            return_log_marginal_likelihood=True,
            return_ancestral_indices=True))(key)
        ref = jax.jit(lambda k: inference.infer(
            "smc", obs, initial, transition, emission, prop, 64, key=k,
            return_log_marginal_likelihood=True,
            return_ancestral_indices=True, return_original_latents=True,
            return_latents=False))(key)
        np.testing.assert_array_equal(
            np.asarray(out["ancestral_indices"][:, 0]),
            np.asarray(ref["ancestral_indices"]))
        np.testing.assert_allclose(
            np.asarray(out["latents"]),
            np.asarray(ref["original_latents"]), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(out["log_marginal_likelihood"]),
            np.asarray(ref["log_marginal_likelihood"]), atol=1e-4)


class TestLocalizationBeatsDimensionality:
    def test_block4_beats_plain_pf_on_lorenz96(self):
        dim, T, K = 16, 20, 128
        initial, transition, emission, _, obs, truth, obs_idx = \
            _lorenz_setup(dim=dim, T=T, K=K)

        def rmse(block_size, seed):
            blocks = blockpf.contiguous_blocks(dim, block_size)
            out = jax.jit(lambda k: blockpf.block_pf(
                obs, initial, transition, emission, K, blocks,
                key=k, obs_indices=obs_idx, return_log_weights=True))(
                    jax.random.PRNGKey(seed))
            m = np.asarray(blockpf.block_filtered_mean(
                out["latents"], out["log_weights"], blocks))[:, 0]
            return np.sqrt(np.mean((m[T // 2:] - truth[T // 2:]) ** 2))

        plain = np.mean([rmse(dim, s) for s in range(3)])
        local = np.mean([rmse(4, s) for s in range(3)])
        # Measured: plain ~5.2, block-4 ~0.39 (13x). Threshold is lax.
        assert local < 0.5 * plain, (local, plain)
        assert local < 1.0, local


class TestContracts:
    def test_contiguous_blocks_remainder(self):
        assert blockpf.contiguous_blocks(7, 3) == \
            ((0, 1, 2), (3, 4, 5), (6,))

    def test_bad_partition_raises(self):
        initial, transition, emission, _, obs, _, obs_idx = \
            _lorenz_setup(dim=8, T=3, K=8)
        with pytest.raises(ValueError, match="partition"):
            blockpf.block_pf(obs, initial, transition, emission, 8,
                             ((0, 1), (2, 3)), key=jax.random.PRNGKey(0),
                             obs_indices=obs_idx)

    def test_obs_indices_length_mismatch_raises(self):
        initial, transition, emission, _, obs, _, _ = \
            _lorenz_setup(dim=8, T=3, K=8)
        with pytest.raises(ValueError, match="obs_indices"):
            blockpf.block_pf(obs, initial, transition, emission, 8,
                             blockpf.contiguous_blocks(8, 4),
                             key=jax.random.PRNGKey(0),
                             obs_indices=(0, 2))

    def test_non_diag_emission_raises(self):
        initial, transition, emission, _, obs, _, obs_idx = \
            _lorenz_setup(dim=8, T=3, K=8)

        class WeirdEmission:
            def __call__(self, latents=None, time=None,
                         previous_observations=None):
                return dists.Normal(latents[-1][..., 0], 1.0)

        with pytest.raises(TypeError, match="MultivariateNormalDiag"):
            blockpf.block_pf(obs, initial, transition, WeirdEmission(), 8,
                             blockpf.contiguous_blocks(8, 4),
                             key=jax.random.PRNGKey(0),
                             obs_indices=obs_idx)

    def test_partial_observation_runs(self):
        dim = 8
        initial, transition, emission, _, obs, _, obs_idx = \
            _lorenz_setup(dim=dim, T=6, K=32, obs_every=2)
        out = blockpf.block_pf(
            obs, initial, transition, emission, 32,
            blockpf.contiguous_blocks(dim, 4), key=jax.random.PRNGKey(0),
            obs_indices=obs_idx, return_log_marginal_likelihood=True,
            return_log_weights=True, return_ancestral_indices=True)
        assert out["latents"].shape == (6, 1, 32, dim)
        assert out["log_weights"].shape == (6, 1, 32, 2)
        assert out["ancestral_indices"].shape == (5, 2, 1, 32)
        assert np.isfinite(
            np.asarray(out["log_marginal_likelihood"])).all()

    def test_single_timestep(self):
        initial, transition, emission, _, obs, _, obs_idx = \
            _lorenz_setup(dim=8, T=1, K=16)
        out = blockpf.block_pf(
            obs, initial, transition, emission, 16,
            blockpf.contiguous_blocks(8, 4), key=jax.random.PRNGKey(0),
            obs_indices=obs_idx, return_log_marginal_likelihood=True)
        assert out["log_marginal_likelihood"].shape == (1,)
        assert np.isfinite(
            np.asarray(out["log_marginal_likelihood"])).all()

    def test_block_filtered_mean_manual(self):
        # 1 batch, 2 particles, 3 dims in blocks (0,1) | (2,).
        latent = jnp.asarray([[[1.0, 2.0, 3.0], [5.0, 6.0, 7.0]]])
        logw = jnp.log(jnp.asarray([[[0.25, 0.9], [0.75, 0.1]]]))
        m = np.asarray(blockpf.block_filtered_mean(
            latent, logw, ((0, 1), (2,))))[0]
        np.testing.assert_allclose(
            m, [0.25 * 1 + 0.75 * 5, 0.25 * 2 + 0.75 * 6,
                0.9 * 3 + 0.1 * 7], rtol=1e-6)
