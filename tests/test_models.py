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
        # Frozen noise scale is a static aux field, not a pytree leaf:
        # no optimizer (including adamw's weight decay) can touch it.
        assert g.scale is None
        assert transition.scale is None
        assert isinstance(transition.frozen_scale, tuple)

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


class TestVrnn:
    """FIVO-style VRNN: shared causal GRU bound per batch."""

    def _model(self):
        from aesmc_tpu.models import vrnn
        return vrnn, vrnn.make_model(latent_dim=3, hidden_dim=8,
                                     obs_dim=4, key=KEY)

    def test_generate_shapes_and_causality(self):
        vrnn, (initial, encoder, transition, emission, proposal) = \
            self._model()
        latents, obs = vrnn.generate(encoder, initial, transition,
                                     emission, 10, 5, KEY)
        assert latents.shape == (10, 5, 3)
        assert obs.shape == (10, 5, 4)
        # causality: h_t must not depend on y_{>=t}
        h = encoder.encode(obs)
        obs2 = obs.at[5:].set(0.0)
        h2 = encoder.encode(obs2)
        np.testing.assert_allclose(np.asarray(h[:6]), np.asarray(h2[:6]),
                                   atol=1e-6)
        assert not np.allclose(np.asarray(h[7:]), np.asarray(h2[7:]))

    def test_loss_and_shared_gradients(self):
        vrnn, (initial, encoder, transition, emission, proposal) = \
            self._model()
        _, obs = vrnn.generate(encoder, initial, transition, emission,
                               8, 4, KEY)
        params = (encoder, transition, emission, proposal)

        def loss_fn(p):
            enc, tr, em, pr = p
            return vrnn.vrnn_loss(obs, 16, "aesmc", initial, enc, tr, em,
                                  pr, key=KEY)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        assert np.isfinite(float(loss))
        leaves = jax.tree_util.tree_leaves(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
        # The GRU (grads[0]) receives gradient through all its consumers.
        assert float(optax.global_norm(grads[0])) > 0

    def test_training_improves(self):
        vrnn, (initial, encoder, transition, emission, proposal) = \
            self._model()
        params = (encoder, transition, emission, proposal)
        opt = optax.adam(3e-3)
        opt_state = opt.init(params)

        def loss_fn(p, obs, key):
            enc, tr, em, pr = p
            return vrnn.vrnn_loss(obs, 8, "aesmc", initial, enc, tr, em,
                                  pr, key=key)

        @jax.jit
        def step(params, opt_state, obs, key):
            loss, grads = jax.value_and_grad(loss_fn)(params, obs, key)
            updates, opt_state = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        key = KEY
        hist = []
        for _ in range(30):
            key, k1, k2 = jax.random.split(key, 3)
            _, obs = vrnn.generate(encoder, initial, transition, emission,
                                   10, 8, k1)
            params, opt_state, loss = step(params, opt_state, obs, k2)
            hist.append(float(loss))
        assert np.mean(hist[-5:]) < np.mean(hist[:5])

    def test_iwae_variant(self):
        vrnn, (initial, encoder, transition, emission, proposal) = \
            self._model()
        _, obs = vrnn.generate(encoder, initial, transition, emission,
                               8, 4, KEY)
        loss = vrnn.vrnn_loss(obs, 16, "iwae", initial, encoder, transition,
                              emission, proposal, key=KEY)
        assert np.isfinite(float(loss))


class TestDeterministicDistribution:
    def test_point_mass(self):
        from aesmc_tpu import distributions as dists
        d = dists.Deterministic(jnp.asarray([[1.0, 2.0]]), event_ndims=1)
        assert d.batch_shape == (1,)
        assert d.event_shape == (2,)
        s = d.sample(KEY, (3,))
        assert s.shape == (3, 1, 2)
        np.testing.assert_array_equal(np.asarray(s[0]),
                                      np.array([[1.0, 2.0]]))
        lp = d.log_prob(jnp.zeros((4, 1, 2)))
        np.testing.assert_array_equal(np.asarray(lp), np.zeros((4, 1)))

    def test_rsample_gradient_identity(self):
        from aesmc_tpu import distributions as dists
        g = jax.grad(lambda x: jnp.sum(
            dists.Deterministic(x).rsample(KEY)))(jnp.ones((3,)))
        np.testing.assert_array_equal(np.asarray(g), np.ones(3))


class TestKalmanNdOracle:
    """BASELINE config 2 quality gate: the N-dim LGSSM's SMC posteriors
    must match the exact matrix Kalman filter/smoother."""

    def test_nd_reduces_to_scalar(self):
        from aesmc_tpu.models import kalman, kalman_nd
        rng = np.random.RandomState(0)
        y = rng.randn(30)
        p1 = kalman.KalmanParams(0.3, 1.2, 0.9, 0.0, 0.5, 1.1, 0.0, 0.4)
        pn = kalman_nd.KalmanNdParams(
            initial_mean=np.array([0.3]), initial_cov=np.array([[1.2]]),
            transition_matrix=np.array([[0.9]]),
            transition_cov=np.array([[0.5]]),
            emission_matrix=np.array([[1.1]]),
            emission_cov=np.array([[0.4]]))
        m1, v1 = kalman.kalman_smoother(y, p1)
        mn, vn = kalman_nd.kalman_smoother_nd(y[:, None], pn)
        np.testing.assert_allclose(mn[:, 0], m1, rtol=1e-10)
        np.testing.assert_allclose(vn[:, 0, 0], v1, rtol=1e-10)
        lml1 = kalman.kalman_filter(y, p1)[4]
        lmln = kalman_nd.kalman_filter_nd(y[:, None], pn)[4]
        np.testing.assert_allclose(lmln, lml1, rtol=1e-10)

    def test_smc_filtering_matches_kalman_nd(self):
        from aesmc_tpu.models import kalman_nd, lgssm_nd
        dim, T, K = 4, 30, 2000
        initial, transition, emission, _ = lgssm_nd.make_model(
            dim=dim, key=KEY, transition_scale=0.7, emission_scale=0.3)
        _, obs = statistics.sample_from_prior(
            initial, transition, emission, T, 1, KEY)

        class Bootstrap:
            """Proposal = model dynamics (an untrained amortized proposal
            in 4-D degenerates the weights; bootstrap is the canonical
            consistent baseline)."""

            def __call__(self, previous_latents=None, time=None,
                         observations=None):
                if time == 0:
                    return initial()
                return transition(previous_latents=previous_latents,
                                  time=time)

        proposal = Bootstrap()
        params = kalman_nd.KalmanNdParams(
            initial_mean=np.zeros(dim), initial_cov=np.eye(dim),
            transition_matrix=np.asarray(transition.matrix),
            transition_cov=np.diag(np.asarray(transition.noise_scale) ** 2),
            emission_matrix=np.asarray(emission.matrix),
            emission_cov=np.diag(np.asarray(emission.noise_scale) ** 2))
        km, kv, _, _, exact_lml = kalman_nd.kalman_filter_nd(
            np.asarray(obs[:, 0]), params)

        result = inference.infer(
            "smc", obs, initial, transition, emission, proposal, K,
            key=jax.random.PRNGKey(5), return_log_weights=True,
            return_original_latents=True,
            return_log_marginal_likelihood=True)
        # FILTERING means: per-step weights on pre-lineage latents.
        means = np.stack([
            np.asarray(statistics.empirical_mean(
                result["original_latents"][t], result["log_weights"][t]))[0]
            for t in range(T)])
        rmse = np.sqrt(np.mean((means - km) ** 2))
        scale = np.sqrt(np.mean(km ** 2)) + 1e-9
        assert rmse / scale < 0.15, (rmse, scale)
        est_lml = float(result["log_marginal_likelihood"][0])
        np.testing.assert_allclose(est_lml, exact_lml, rtol=0.05)


class TestMixedPrecision:
    """compute_dtype='bfloat16': bf16 matmul inputs + f32 MXU
    accumulation on the deep models' nets; params, gradients and all
    log-weight arithmetic stay f32."""

    def test_vrnn_bf16_close_to_f32_and_grads_f32(self):
        from aesmc_tpu.models import vrnn
        key = jax.random.PRNGKey(4)
        comps32 = vrnn.make_model(latent_dim=3, hidden_dim=8, obs_dim=5,
                                  key=key, mlp_hidden=16)
        comps16 = vrnn.make_model(latent_dim=3, hidden_dim=8, obs_dim=5,
                                  key=key, mlp_hidden=16,
                                  compute_dtype="bfloat16")
        initial, encoder, transition, emission, proposal = comps32
        _, obs = vrnn.generate(encoder, initial, transition, emission,
                               10, 4, jax.random.PRNGKey(1))
        # Same weights (compute_dtype is a static field, not a leaf).
        l32, l16 = [], []
        for comps, acc in ((comps32, l32), (comps16, l16)):
            ini, enc, tr, em, pr = comps

            def loss_fn(enc_, tr_, em_, pr_):
                return vrnn.vrnn_loss(obs, 16, "aesmc", ini, enc_, tr_,
                                      em_, pr_, key=jax.random.PRNGKey(2))

            loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3))(
                enc, tr, em, pr)
            acc.append(float(loss))
            for g in jax.tree_util.tree_leaves(grads):
                assert g.dtype == jnp.float32
                assert np.isfinite(np.asarray(g)).all()
        # bf16 nets perturb the proposal samples, so losses differ -
        # but both estimate the same ELBO of nearby models.
        assert abs(l32[0] - l16[0]) < 0.15 * abs(l32[0]) + 2.0, (l32, l16)

    def test_bouncing_ball_bf16_runs(self):
        from aesmc_tpu import losses
        comps = bouncing_ball.make_model(KEY, num_pixels=16, hidden=32,
                                         compute_dtype="bfloat16")
        initial, transition, emission, proposal = comps
        _, obs = statistics.sample_from_prior(
            initial, transition, emission, 6, 3, KEY)
        loss = losses.get_loss(obs, 8, "aesmc", initial, transition,
                               emission, proposal, key=KEY)
        assert np.isfinite(float(loss))

    def test_mixed_dot_accumulates_f32(self):
        from aesmc_tpu.utils import mixed_dot
        x = jnp.ones((4, 256)) * 0.1
        w = jnp.ones((256, 8)) * 0.1
        out = mixed_dot(x, w, "bfloat16")
        assert out.dtype == jnp.float32
        # bf16 INPUT rounding only (0.1 -> ~0.10009765); f32
        # accumulation keeps the 256-term sum at ~1e-3 relative, far
        # tighter than bf16 accumulation would (~1e-2).
        np.testing.assert_allclose(np.asarray(out), 2.56, rtol=5e-3)
