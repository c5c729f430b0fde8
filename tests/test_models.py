"""Model-family tests: N-dim LGSSM, stochastic volatility, bouncing ball
(BASELINE.json configs 2-4) - generative rollouts, inference, losses,
gradient flow, and short-training sanity."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from aesmc_tpu import inference, losses, statistics, train
from aesmc_tpu.models import bouncing_ball, lgssm_nd, stochastic_volatility

KEY = jax.random.PRNGKey(0)


class TestLgssmNd:
    def test_rollout_and_inference(self):
        dim = 4
        initial, transition, emission, proposal = lgssm_nd.make_model(
            dim=dim, key=KEY)
        latents, obs = statistics.sample_from_prior(
            initial, transition, emission, 10, 3, KEY)
        assert latents.shape == (10, 3, dim)
        assert obs.shape == (10, 3, dim)
        result = inference.infer(
            "smc", obs, initial, transition, emission, proposal, 16,
            key=KEY, resampling_method="multinomial",
            return_log_marginal_likelihood=True)
        assert result["log_marginal_likelihood"].shape == (3,)
        assert np.isfinite(np.asarray(
            result["log_marginal_likelihood"])).all()
        assert result["latents"].shape == (10, 3, 16, dim)

    def test_gradients(self):
        initial, transition, emission, proposal = lgssm_nd.make_model(
            dim=3, key=KEY)
        _, obs = statistics.sample_from_prior(
            initial, transition, emission, 6, 2, KEY)

        def loss_fn(tr):
            return losses.get_loss(obs, 8, "aesmc", initial, tr, emission,
                                   proposal, key=KEY)

        g = jax.grad(loss_fn)(transition)
        assert np.isfinite(np.asarray(g.matrix)).all()
        assert np.abs(np.asarray(g.matrix)).sum() > 0
        # stop_gradient on the noise scale: no gradient flows.
        np.testing.assert_array_equal(np.asarray(g.scale),
                                      np.zeros_like(g.scale))

    def test_spectral_radius(self):
        _, transition, _, _ = lgssm_nd.make_model(dim=5, key=KEY,
                                                  spectral_radius=0.8)
        eig = np.max(np.abs(np.linalg.eigvals(np.asarray(
            transition.matrix))))
        np.testing.assert_allclose(eig, 0.8, rtol=1e-4)


class TestStochasticVolatility:
    def test_rollout_statistics(self):
        initial, transition, emission, _ = stochastic_volatility.make_model(
            mu=-1.0, phi=0.9, sigma=0.3, beta=0.5)
        latents, obs = statistics.sample_from_prior(
            initial, transition, emission, 50, 2000, KEY)
        latents = np.asarray(latents)
        # Stationary AR(1): mean mu, var sigma^2/(1-phi^2).
        np.testing.assert_allclose(latents.mean(), -1.0, atol=0.05)
        np.testing.assert_allclose(latents.var(), 0.3 ** 2 / (1 - 0.81),
                                   rtol=0.15)

    @pytest.mark.parametrize("method", ["systematic", "stratified"])
    def test_smc_runs(self, method):
        comps = stochastic_volatility.make_model()
        _, obs = statistics.sample_from_prior(comps[0], comps[1], comps[2],
                                              30, 4, KEY)
        result = inference.infer(
            "smc", obs, *comps, num_particles=64, key=KEY,
            resampling_method=method, return_log_marginal_likelihood=True)
        assert np.isfinite(np.asarray(
            result["log_marginal_likelihood"])).all()

    def test_iwae_vs_aesmc_comparison(self):
        # BASELINE config 3: IWAE vs AESMC objective comparison runs.
        comps = stochastic_volatility.make_model()
        _, obs = statistics.sample_from_prior(comps[0], comps[1], comps[2],
                                              20, 8, KEY)
        vals = {}
        for algorithm in ("iwae", "aesmc"):
            vals[algorithm] = float(losses.get_loss(
                obs, 32, algorithm, *comps, key=KEY))
        assert all(np.isfinite(v) for v in vals.values())


class TestBouncingBall:
    def test_reflection(self):
        p = jnp.asarray([-0.3, 0.2, 1.4, 2.3, -1.2])
        out = np.asarray(bouncing_ball.reflect(p))
        np.testing.assert_allclose(out, [0.3, 0.2, 0.6, 0.3, 0.8],
                                   atol=1e-6)
        assert (out >= 0).all() and (out <= 1).all()

    def test_render(self):
        frames = bouncing_ball.render(jnp.asarray([0.0, 0.5, 1.0]),
                                      num_pixels=16)
        assert frames.shape == (3, 16)
        peaks = np.argmax(np.asarray(frames), axis=-1)
        np.testing.assert_array_equal(peaks, [0, 7, 15])

    def test_rollout_and_inference_64_steps(self):
        comps = bouncing_ball.make_model(KEY, num_pixels=16, hidden=32)
        latents, obs = statistics.sample_from_prior(
            comps[0], comps[1], comps[2], 64, 2, KEY)
        assert latents.shape == (64, 2, 2)
        assert obs.shape == (64, 2, 16)
        result = inference.infer(
            "smc", obs, *comps, num_particles=32, key=KEY,
            return_log_marginal_likelihood=True)
        assert np.isfinite(np.asarray(
            result["log_marginal_likelihood"])).all()

    def test_training_improves_elbo(self):
        comps = bouncing_ball.make_model(KEY, num_pixels=16, hidden=32)
        initial, transition, emission, proposal = comps
        dl = train.get_synthetic_dataloader(initial, transition, emission,
                                            16, 8, KEY)
        losses_seen = []

        def cb(e, i, loss, *c):
            losses_seen.append(float(loss))

        train.train(dl, 16, "aesmc", *comps, num_epochs=1,
                    num_iterations_per_epoch=40,
                    optimizer=optax.adam(3e-3), callback=cb, key=KEY)
        assert np.mean(losses_seen[-10:]) < np.mean(losses_seen[:10])


class TestCheckpoint:
    def test_save_restore_roundtrip(self, tmp_path):
        from aesmc_tpu import checkpoint
        comps = stochastic_volatility.make_model()
        opt = optax.adam(1e-3)
        state = checkpoint.TrainState(
            components=comps, opt_state=opt.init(comps), key=KEY, step=7)
        checkpoint.save(tmp_path / "ckpt", state)
        template = checkpoint.TrainState(
            components=stochastic_volatility.make_model(),
            opt_state=opt.init(comps), key=jax.random.PRNGKey(1), step=0)
        restored = checkpoint.restore(tmp_path / "ckpt", template)
        assert restored.step == 7
        orig = jax.tree_util.tree_leaves(state.components)
        back = jax.tree_util.tree_leaves(restored.components)
        for a, b in zip(orig, back):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
