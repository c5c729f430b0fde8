"""Training-loop tests: the reference's end-to-end autoencoder convergence
(/root/reference/test/test_losses.py) with *numeric* assertions (the
reference only eyeballs plots; SURVEY.md S4 tier 3), callback contract,
synthetic dataloader, and dict-observation support."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from aesmc_tpu import distributions as dists
from aesmc_tpu import losses, state, statistics, train
from aesmc_tpu.models import gaussian, lgssm
from aesmc_tpu.state import BatchShapeMode

KEY = jax.random.PRNGKey(0)


class TestSyntheticDataloader:
    def test_shapes_and_freshness(self):
        dl = train.get_synthetic_dataloader(
            lgssm.Initial(0.0, 1.0), lgssm.Transition.create(0.9, 1.0),
            lgssm.Emission.create(1.0, 0.1), 6, 4, KEY)
        it = iter(dl)
        a, b = next(it), next(it)
        assert a.shape == (6, 4)
        assert not np.allclose(np.asarray(a), np.asarray(b))


class TestGetChainedParams:
    def test_collects_leaves(self):
        params = train.get_chained_params(
            lgssm.Transition.create(0.9, 1.0), None,
            lgssm.Proposal.create(1.0, 1.0))
        assert params is not None
        assert len(params) == 5  # mult + 4 proposal arrays

    def test_none_when_empty(self):
        assert train.get_chained_params(None, lgssm.Initial(0.0, 1.0)) \
            is None


class TestCallback:
    def test_contract(self):
        dl = train.get_synthetic_dataloader(
            gaussian.Prior.create(0.0, 1.0), None,
            gaussian.Likelihood.create(1.0), 1, 4, KEY)
        calls = []

        def callback(epoch_idx, it_idx, loss, initial, transition, emission,
                     proposal):
            calls.append((epoch_idx, it_idx, float(loss)))
            assert isinstance(initial, gaussian.Prior)
            assert transition is None

        train.train(dl, 2, "iwae", gaussian.Prior.create(1.0, 1.0), None,
                    gaussian.Likelihood.create(1.0),
                    gaussian.InferenceNetwork.create(1.0, 0.0, 1.0),
                    num_epochs=2, num_iterations_per_epoch=3,
                    callback=callback, key=KEY)
        assert [c[:2] for c in calls] == [
            (0, 0), (0, 1), (0, 2), (1, 0), (1, 1), (1, 2)]


class TestGaussianConvergence:
    """Reference test_losses.py:11-80 with actual numeric assertions."""

    def test_iwae_training_converges(self):
        true_prior_mean, prior_std, true_obs_std = 0.0, 1.0, 1.0
        dl = train.get_synthetic_dataloader(
            gaussian.Prior.create(true_prior_mean, prior_std), None,
            gaussian.Likelihood.create(true_obs_std), 1, 100, KEY)
        stats_cb = gaussian.TrainingStats(verbose=False)
        comps = train.train(
            dl, 4, "iwae",
            gaussian.Prior.create(1.5, prior_std),
            None,
            gaussian.Likelihood.create(0.6),
            gaussian.InferenceNetwork.create(1.5, 1.5, 1.5),
            num_epochs=1, num_iterations_per_epoch=500,
            optimizer=optax.adam(2e-2), callback=stats_cb,
            key=jax.random.PRNGKey(7))
        prior, _, lik, q = comps
        q_mult, q_bias, q_std = gaussian.get_proposal_params(
            true_prior_mean, prior_std, true_obs_std)
        assert abs(float(prior.mean) - true_prior_mean) < 0.25
        assert abs(float(jnp.exp(lik.log_std)) - true_obs_std) < 0.25
        assert abs(float(q.mult) - q_mult) < 0.25
        assert abs(float(q.bias) - q_bias) < 0.25
        assert abs(float(jnp.exp(q.log_std)) - q_std) < 0.25
        # Loss decreased.
        first = np.mean(stats_cb.loss_history[:20])
        last = np.mean(stats_cb.loss_history[-20:])
        assert last < first


class TestLgssmTraining:
    """Reference test_losses.py:82-151, shortened: parameters move toward
    the truth under both objectives."""

    @pytest.mark.parametrize("algorithm", ["iwae", "aesmc"])
    def test_param_recovery(self, algorithm):
        initial_loc, initial_scale = 0.0, 1.0
        true_a, a0 = 0.9, 0.0
        transition_scale = 1.0
        true_c, c0 = 1.0, 0.0
        emission_scale = 0.1
        T, B, K, iters = 20, 16, 50, 150

        scale_0, scale_t = lgssm.optimal_proposal_scales(
            initial_scale, transition_scale, true_c, emission_scale)
        dl = train.get_synthetic_dataloader(
            lgssm.Initial(initial_loc, initial_scale),
            lgssm.Transition.create(true_a, transition_scale),
            lgssm.Emission.create(true_c, emission_scale), T, B, KEY)
        comps = train.train(
            dl, K, algorithm,
            lgssm.Initial(initial_loc, initial_scale),
            lgssm.Transition.create(a0, transition_scale),
            lgssm.Emission.create(c0, emission_scale),
            lgssm.Proposal.create(scale_0, scale_t, KEY),
            num_epochs=1, num_iterations_per_epoch=iters,
            optimizer=optax.adam(5e-2), key=jax.random.PRNGKey(3))
        _, transition, emission, _ = comps
        err0 = np.linalg.norm([a0 - true_a, c0 - true_c])
        err = np.linalg.norm([float(transition.mult) - true_a,
                              float(emission.mult) - true_c])
        assert err < 0.5 * err0, (err, err0)


class TestDictObservations:
    """Factorized (pytree) observation spaces end to end - the reference
    acknowledges its own dataloader is broken for dicts (train.py:54)."""

    class DictEmission:
        def __call__(self, latents=None, time=None,
                     previous_observations=None):
            x = latents[-1]
            return {
                "a": dists.Normal(x, 0.5,
                                  batch_shape_mode=(
                                      BatchShapeMode.FULLY_EXPANDED)),
                "b": dists.Normal(2.0 * x, 0.3,
                                  batch_shape_mode=(
                                      BatchShapeMode.FULLY_EXPANDED)),
            }

    class DictProposal:
        def __call__(self, previous_latents=None, time=None,
                     observations=None):
            if time == 0:
                obs = observations[0]
                return dists.Normal(
                    0.5 * obs["a"], 1.0,
                    batch_shape_mode=BatchShapeMode.BATCH_EXPANDED)
            prev = previous_latents[-1]
            obs = observations[time]
            return dists.Normal(
                0.9 * prev + 0.1 * obs["a"][:, None], 1.0,
                batch_shape_mode=BatchShapeMode.FULLY_EXPANDED)

    def test_end_to_end(self):
        initial = lgssm.Initial(0.0, 1.0)
        transition = lgssm.Transition.create(0.9, 1.0)
        emission = self.DictEmission()
        latents, obs = statistics.sample_from_prior(
            initial, transition, emission, 5, 3, KEY)
        assert set(obs.keys()) == {"a", "b"}
        assert obs["a"].shape == (5, 3)

        from aesmc_tpu import inference
        result = inference.infer(
            "smc", obs, initial, transition, emission, self.DictProposal(),
            num_particles=8, key=KEY, return_log_marginal_likelihood=True)
        assert result["log_marginal_likelihood"].shape == (3,)
        assert np.isfinite(np.asarray(
            result["log_marginal_likelihood"])).all()
        assert result["latents"].shape == (5, 3, 8)


class TestMetricsStep:
    def test_with_metrics(self):
        import optax as _optax
        from aesmc_tpu import train as _train
        from aesmc_tpu.models import lgssm as _lgssm
        from aesmc_tpu import statistics as _stats
        initial = _lgssm.Initial(0.0, 1.0)
        transition = _lgssm.Transition.create(0.9, 1.0)
        emission = _lgssm.Emission.create(1.0, 0.2)
        proposal = _lgssm.Proposal.create(1.0, 1.0, KEY)
        _, obs = _stats.sample_from_prior(initial, transition, emission,
                                          6, 4, KEY)
        opt = _optax.adam(1e-2)
        comps = (initial, transition, emission, proposal)
        step = _train.make_train_step(16, "aesmc", opt, with_metrics=True)
        comps, _, loss, metrics = step(comps, opt.init(comps), obs, KEY)
        assert set(metrics) == {"elbo", "ess", "grad_norm"}
        assert np.isfinite(float(metrics["ess"]))
        assert 1.0 <= float(metrics["ess"]) <= 16.0
        assert float(metrics["grad_norm"]) > 0
        np.testing.assert_allclose(float(loss), -float(metrics["elbo"]),
                                   rtol=1e-6)


class TestTrainCheckpointing:
    def test_checkpoint_and_resume(self, tmp_path):
        from aesmc_tpu.models import lgssm as _lgssm
        initial = _lgssm.Initial(0.0, 1.0)
        dl = train.get_synthetic_dataloader(
            initial, _lgssm.Transition.create(0.9, 1.0),
            _lgssm.Emission.create(1.0, 0.2), 5, 4, KEY)
        ckpt_dir = tmp_path / "run1"
        comps = train.train(
            dl, 8, "aesmc", initial, _lgssm.Transition.create(0.0, 1.0),
            _lgssm.Emission.create(0.5, 0.2),
            _lgssm.Proposal.create(1.0, 1.0, KEY),
            num_epochs=1, num_iterations_per_epoch=5, key=KEY,
            checkpoint_dir=ckpt_dir)
        assert ckpt_dir.exists()
        # Resume: parameters continue from the saved state.
        comps2 = train.train(
            dl, 8, "aesmc", initial, _lgssm.Transition.create(0.0, 1.0),
            _lgssm.Emission.create(0.5, 0.2),
            _lgssm.Proposal.create(1.0, 1.0, KEY),
            num_epochs=1, num_iterations_per_epoch=0, key=KEY,
            checkpoint_dir=ckpt_dir, resume=True)
        np.testing.assert_allclose(float(comps2[1].mult),
                                   float(comps[1].mult), rtol=1e-6)


class TestTrainOnDevice:
    def test_fused_loop_learns(self):
        from aesmc_tpu.models import lgssm as _lgssm
        gen = (_lgssm.Initial(0.0, 1.0),
               _lgssm.Transition.create(0.9, 1.0),
               _lgssm.Emission.create(1.0, 0.1))
        blocks = []
        comps, hist = train.train_on_device(
            _lgssm.Initial(0.0, 1.0),
            _lgssm.Transition.create(0.0, 1.0),
            _lgssm.Emission.create(0.3, 0.1),
            _lgssm.Proposal.create(1.0, 1.0, KEY),
            num_particles=32, algorithm="aesmc",
            generative_components=gen, num_timesteps=10, batch_size=8,
            num_steps=120, optimizer=optax.adam(5e-2), key=KEY,
            steps_per_call=50,
            callback=lambda i, l, c: blocks.append((i, l)))
        assert hist.shape == (120,)
        assert [b[0] for b in blocks] == [50, 100, 120]
        # Parameters moved toward the truth.
        assert abs(float(comps[1].mult) - 0.9) < 0.45
        assert float(jnp.mean(hist[-30:])) < float(jnp.mean(hist[:30]))
