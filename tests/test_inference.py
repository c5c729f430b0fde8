"""Inference-engine tests: hand-traced lineage reconstruction, the Kalman
oracle (the reference's signature test: SMC/IS posteriors vs the exact
smoother on a noisy sine fit by EM, /root/reference/test/test_inference.py),
and input validation."""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aesmc_tpu import distributions as dists
from aesmc_tpu import inference, statistics
from aesmc_tpu.models import kalman

KEY = jax.random.PRNGKey(0)


class TestGetResampledLatents:
    def test_hand_traced_value(self):
        # Exact scenario of /root/reference/test/test_inference.py:13-40.
        latents = [
            jnp.asarray([[1.0, 2.0, 3.0]]),
            jnp.asarray([[4.0, 5.0, 6.0]]),
            jnp.asarray([[7.0, 8.0, 9.0]]),
            jnp.asarray([[10.0, 11.0, 12.0]]),
        ]
        ancestral_indices = [
            jnp.asarray([[0, 2, 1]]),
            jnp.asarray([[2, 0, 0]]),
            jnp.asarray([[1, 2, 0]]),
        ]
        true_resampled = np.array([
            [[1.0, 1.0, 2.0]],
            [[4.0, 4.0, 6.0]],
            [[8.0, 9.0, 7.0]],
            [[10.0, 11.0, 12.0]],
        ])
        out = inference.get_resampled_latents(latents, ancestral_indices)
        np.testing.assert_array_equal(np.asarray(out), true_resampled)

    def test_single_timestep(self):
        latents = jnp.asarray(np.random.randn(1, 2, 3))
        out = inference.get_resampled_latents(latents, [])
        np.testing.assert_array_equal(np.asarray(out), np.asarray(latents))

    def test_length_mismatch_raises(self):
        latents = jnp.asarray(np.random.randn(3, 1, 2))
        with pytest.raises(AssertionError):
            inference.get_resampled_latents(
                latents, jnp.zeros((1, 1, 2), dtype=jnp.int32))

    def test_pytree_latents(self):
        latents = {"x": jnp.asarray([[[1.0, 2.0]], [[3.0, 4.0]]])}
        anc = jnp.asarray([[[1, 1]]])
        out = inference.get_resampled_latents(latents, anc)
        np.testing.assert_array_equal(
            np.asarray(out["x"]), np.array([[[2.0, 2.0]], [[3.0, 4.0]]]))


class TestValidation:
    def _run(self, **kwargs):
        from aesmc_tpu.models import lgssm
        obs = jnp.zeros((3, 2))
        return inference.infer(
            observations=obs,
            initial=lgssm.Initial(0.0, 1.0),
            transition=lgssm.Transition.create(0.9, 1.0),
            emission=lgssm.Emission.create(1.0, 0.1),
            proposal=lgssm.Proposal.create(1.0, 1.0),
            num_particles=4, key=KEY, **kwargs)

    def test_bad_algorithm(self):
        with pytest.raises(ValueError, match="is or smc"):
            self._run(inference_algorithm="bogus")

    def test_is_with_original_latents(self):
        with pytest.raises(ValueError, match="original_latents"):
            self._run(inference_algorithm="is", return_original_latents=True)

    def test_is_with_ancestral_indices(self):
        with pytest.raises(ValueError, match="ancestral_indices"):
            self._run(inference_algorithm="is",
                      return_ancestral_indices=True)

    def test_return_flags(self):
        r = self._run(inference_algorithm="smc",
                      return_log_marginal_likelihood=True,
                      return_original_latents=True,
                      return_log_weights=True,
                      return_ancestral_indices=True)
        assert r["log_marginal_likelihood"].shape == (2,)
        assert r["latents"].shape == (3, 2, 4)
        assert r["original_latents"].shape == (3, 2, 4)
        assert r["log_weight"].shape == (2, 4)
        assert r["log_weights"].shape == (3, 2, 4)
        assert r["ancestral_indices"].shape == (2, 2, 4)
        assert r["last_latent"].shape == (2, 4)

    def test_none_when_not_requested(self):
        r = self._run(inference_algorithm="smc")
        assert r["log_marginal_likelihood"] is None
        assert r["original_latents"] is None
        assert r["log_weights"] is None
        assert r["ancestral_indices"] is None
        assert r["latents"] is not None
        assert r["log_weight"] is not None


# ---------------------------------------------------------------------------
# Kalman oracle (reference test_inference.py:85-375): reference-style plain
# callables (not pytrees - engine must accept both), inferred batch-shape
# modes (ambiguity warnings expected), EM-fitted params on a noisy sine.
# ---------------------------------------------------------------------------

class Initial:
    def __init__(self, mean, variance):
        self.mean, self.variance = mean, variance

    def __call__(self):
        return dists.Normal(self.mean, np.sqrt(self.variance))


class Transition:
    def __init__(self, mult, variance, offset):
        self.mult, self.variance, self.offset = mult, variance, offset

    def __call__(self, previous_latents=None, time=None,
                 previous_observations=None):
        return dists.Normal(previous_latents[-1] * self.mult + self.offset,
                            np.sqrt(self.variance))


class Emission:
    def __init__(self, mult, variance, offset):
        self.mult, self.variance, self.offset = mult, variance, offset

    def __call__(self, latents=None, time=None, previous_observations=None):
        return dists.Normal(latents[-1] * self.mult + self.offset,
                            np.sqrt(self.variance))


class Proposal:
    """Bootstrap proposal == model dynamics, with a reference-style
    `if time == 0` branch."""

    def __init__(self, initial_mean, initial_variance, mult, variance,
                 offset):
        self.initial_mean = initial_mean
        self.initial_variance = initial_variance
        self.mult, self.variance, self.offset = mult, variance, offset

    def __call__(self, previous_latents=None, time=None, observations=None):
        if time == 0:
            return dists.Normal(self.initial_mean,
                                np.sqrt(self.initial_variance))
        else:
            return dists.Normal(
                previous_latents[-1] * self.mult + self.offset,
                np.sqrt(self.variance))


@pytest.fixture(scope="module")
def kalman_setup():
    rng = np.random.RandomState(0)
    num_timesteps = 100
    x = np.linspace(0, 3 * np.pi, num_timesteps)
    observations = 40 * (np.sin(x) + 0.2 * rng.randn(num_timesteps))

    init = kalman.KalmanParams(
        initial_mean=0.0, initial_variance=1.0,
        transition_mult=1.0, transition_offset=0.0,
        transition_variance=0.01,
        emission_mult=1.0, emission_offset=0.0, emission_variance=1.0)
    fitted = kalman.kalman_em(observations, init, num_iterations=10)
    smoothed_means, smoothed_variances = kalman.kalman_smoother(
        observations, fitted)

    obs = jnp.asarray(observations, dtype=jnp.float32)[:, None]  # [T, B=1]
    components = dict(
        initial=Initial(fitted.initial_mean, fitted.initial_variance),
        transition=Transition(fitted.transition_mult,
                              fitted.transition_variance,
                              fitted.transition_offset),
        emission=Emission(fitted.emission_mult, fitted.emission_variance,
                          fitted.emission_offset),
        proposal=Proposal(fitted.initial_mean, fitted.initial_variance,
                          fitted.transition_mult, fitted.transition_variance,
                          fitted.transition_offset))
    return obs, components, smoothed_means, smoothed_variances


def _posterior_moments(result):
    latents = result["latents"]          # [T, B=1, K]
    logw = result["log_weight"]          # [B=1, K]
    means = np.array([
        float(statistics.empirical_mean(latents[t], logw)[0])
        for t in range(latents.shape[0])])
    variances = np.array([
        float(statistics.empirical_variance(latents[t], logw)[0])
        for t in range(latents.shape[0])])
    return means, variances


class TestKalmanOracle:
    num_particles = 1000

    def test_em_fits_reasonably(self, kalman_setup):
        _, _, smoothed_means, _ = kalman_setup
        # EM-smoothed means must track the underlying sine.
        x = np.linspace(0, 3 * np.pi, 100)
        clean = 40 * np.sin(x)
        rmse = np.sqrt(np.mean((smoothed_means - clean) ** 2))
        assert rmse < 10.0

    def test_is(self, kalman_setup):
        obs, components, km, kv = kalman_setup
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)
            result = inference.infer(
                inference_algorithm="is", observations=obs,
                num_particles=self.num_particles, key=jax.random.PRNGKey(1),
                **components)
        means, variances = _posterior_moments(result)
        rmse = np.sqrt(np.mean((km - means) ** 2))
        var_rel_err = np.mean(np.abs(kv - variances) / kv)
        # IS is expected to be bad (reference test_inference.py:286-288).
        assert rmse < 20
        assert var_rel_err <= 2

    def test_smc(self, kalman_setup):
        obs, components, km, kv = kalman_setup
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)
            result = inference.infer(
                inference_algorithm="smc", observations=obs,
                num_particles=self.num_particles, key=jax.random.PRNGKey(1),
                **components)
        means, variances = _posterior_moments(result)
        rmse = np.sqrt(np.mean((km - means) ** 2))
        var_rel_err = np.mean(np.abs(kv - variances) / kv)
        # SMC is expected to be good (reference test_inference.py:373-375).
        assert rmse < 2
        assert var_rel_err < 0.5

    @pytest.mark.parametrize("method", ["stratified", "multinomial"])
    def test_smc_other_resamplers(self, kalman_setup, method):
        obs, components, km, kv = kalman_setup
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)
            result = inference.infer(
                inference_algorithm="smc", observations=obs,
                num_particles=self.num_particles, key=jax.random.PRNGKey(2),
                resampling_method=method, **components)
        means, variances = _posterior_moments(result)
        rmse = np.sqrt(np.mean((km - means) ** 2))
        var_rel_err = np.mean(np.abs(kv - variances) / kv)
        assert rmse < 2
        assert var_rel_err < 0.5

    def test_log_marginal_likelihood_matches_kalman(self, kalman_setup):
        obs, components, _, _ = kalman_setup
        # Exact log Z from the Kalman filter vs the SMC estimate.
        rng = np.random.RandomState(0)
        x = np.linspace(0, 3 * np.pi, 100)
        observations = np.asarray(obs[:, 0])
        params = kalman.KalmanParams(
            initial_mean=components["initial"].mean,
            initial_variance=components["initial"].variance,
            transition_mult=components["transition"].mult,
            transition_offset=components["transition"].offset,
            transition_variance=components["transition"].variance,
            emission_mult=components["emission"].mult,
            emission_offset=components["emission"].offset,
            emission_variance=components["emission"].variance)
        _, _, _, _, exact_lml = kalman.kalman_filter(observations, params)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)
            result = inference.infer(
                inference_algorithm="smc", observations=obs,
                num_particles=self.num_particles, key=jax.random.PRNGKey(3),
                return_log_marginal_likelihood=True, **components)
        est = float(result["log_marginal_likelihood"][0])
        # SMC log-Z estimates are consistent; 1000 particles on T=100
        # with a bootstrap proposal land within a few nats.
        assert abs(est - exact_lml) / abs(exact_lml) < 0.05


class TestObservationSequence:
    def test_indexing(self):
        stacked = jnp.arange(12.0).reshape(3, 4)
        seq = inference.ObservationSequence(stacked)
        assert len(seq) == 3
        np.testing.assert_array_equal(np.asarray(seq[1]),
                                      np.arange(4.0) + 4)
        # Traced index
        idx = jnp.asarray(2)
        np.testing.assert_array_equal(np.asarray(seq[idx]),
                                      np.arange(4.0) + 8)

    def test_time_index_semantics(self):
        t = inference.TimeIndex(jnp.asarray(3))
        assert not (t == 0)
        assert t != 0
        assert int(np.asarray(t + 1)) == 4
        assert int(np.asarray(1 + t)) == 4
        assert int(np.asarray(t - 1)) == 2

    def test_time_index_nonzero_compare_usable_in_jnp(self):
        # time == t for t >= 1 is a traced boolean usable in jnp ops
        # after an explicit jnp.asarray (JAX 0.9 dropped implicit
        # __jax_array__ abstractification), and via the boolean
        # operators, which delegate directly.
        t = inference.TimeIndex(jnp.asarray(3))
        picked = jnp.where(jnp.asarray(t == 3), 1.0, 0.0)
        assert float(picked) == 1.0
        picked = jnp.where(jnp.asarray(t == 2), 1.0, 0.0)
        assert float(picked) == 0.0
        assert bool(jax.lax.cond(jnp.asarray(t == 3),
                                 lambda: True, lambda: False))
        assert bool(np.asarray(~(t == 2)))
        assert bool(np.asarray((t == 3) & True))

    def test_time_index_nonzero_compare_in_if_raises_hint(self):
        # ...but a Python `if` branch gets the targeted contract error
        # (reference models port `if time == k:` branches; the generic
        # TracerBoolConversionError gave no pointer at the TimeIndex
        # contract).
        t = inference.TimeIndex(jnp.asarray(3))
        with pytest.raises(TypeError, match="TimeIndex"):
            if t == 1:
                pass
        with pytest.raises(TypeError, match="hoisted"):
            bool(t != 2)


class TestAdaptiveResampling:
    """ESS-adaptive SMC: frac -> inf reduces to always-resample (AESMC
    estimator); frac -> 0 never resamples and the log-Z estimator equals
    the IS/IWAE estimator exactly."""

    def _components(self):
        from aesmc_tpu.models import lgssm
        from aesmc_tpu import statistics
        initial = lgssm.Initial(0.0, 1.0)
        transition = lgssm.Transition.create(0.9, 1.0)
        emission = lgssm.Emission.create(1.0, 0.3)
        proposal = lgssm.Proposal.create(1.0, 1.0, KEY)
        _, obs = statistics.sample_from_prior(initial, transition, emission,
                                              15, 4, KEY)
        return obs, dict(initial=initial, transition=transition,
                         emission=emission, proposal=proposal)

    def test_huge_threshold_equals_always(self):
        obs, comps = self._components()
        a = inference.infer("smc", obs, num_particles=32, key=KEY,
                            return_log_marginal_likelihood=True, **comps)
        b = inference.infer("smc", obs, num_particles=32, key=KEY,
                            resampling_criterion=1e9,
                            return_log_marginal_likelihood=True, **comps)
        np.testing.assert_allclose(
            np.asarray(a["log_marginal_likelihood"]),
            np.asarray(b["log_marginal_likelihood"]), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(a["latents"]),
                                   np.asarray(b["latents"]), atol=1e-6)

    def test_zero_threshold_equals_is(self):
        obs, comps = self._components()
        a = inference.infer("is", obs, num_particles=32, key=KEY,
                            return_log_marginal_likelihood=True, **comps)
        b = inference.infer("smc", obs, num_particles=32, key=KEY,
                            resampling_criterion=0.0,
                            return_log_marginal_likelihood=True, **comps)
        np.testing.assert_allclose(
            np.asarray(a["log_marginal_likelihood"]),
            np.asarray(b["log_marginal_likelihood"]), rtol=1e-4)

    def test_adaptive_estimator_consistent(self):
        # The adaptive log-Z estimate should land near the exact log-Z.
        from aesmc_tpu.models import kalman
        obs, comps = self._components()
        obs_np = np.asarray(obs)
        exact = np.array([
            kalman.kalman_filter(
                obs_np[:, b],
                kalman.KalmanParams(0.0, 1.0, 0.9, 0.0, 1.0,
                                    1.0, 0.0, 0.3 ** 2))[4]
            for b in range(obs_np.shape[1])])
        est = inference.infer(
            "smc", obs, num_particles=2048, key=KEY,
            resampling_criterion=0.5,
            return_log_marginal_likelihood=True,
            **comps)["log_marginal_likelihood"]
        np.testing.assert_allclose(np.asarray(est), exact, rtol=0.05)

    def test_adaptive_training_works(self):
        from aesmc_tpu import losses
        obs, comps = self._components()

        def loss_fn(tr):
            return losses.get_loss(
                obs, 16, "aesmc", comps["initial"], tr, comps["emission"],
                comps["proposal"], key=KEY, resampling_criterion=0.5)

        g = jax.grad(loss_fn)(comps["transition"])
        assert np.isfinite(float(g.mult))
        assert abs(float(g.mult)) > 0


class TestRemat:
    def test_remat_matches_and_differentiates(self):
        from aesmc_tpu import losses
        from aesmc_tpu.models import lgssm
        initial = lgssm.Initial(0.0, 1.0)
        transition = lgssm.Transition.create(0.9, 1.0)
        emission = lgssm.Emission.create(1.0, 0.3)
        proposal = lgssm.Proposal.create(1.0, 1.0, KEY)
        _, obs = statistics.sample_from_prior(initial, transition, emission,
                                              12, 3, KEY)
        a = inference.infer("smc", obs, initial, transition, emission,
                            proposal, 16, key=KEY,
                            return_log_marginal_likelihood=True)
        b = inference.infer("smc", obs, initial, transition, emission,
                            proposal, 16, key=KEY, remat=True,
                            return_log_marginal_likelihood=True)
        np.testing.assert_allclose(np.asarray(a["log_marginal_likelihood"]),
                                   np.asarray(b["log_marginal_likelihood"]),
                                   rtol=1e-5)

        def loss_fn(tr, remat):
            r = inference.infer("smc", obs, initial, tr, emission, proposal,
                                16, key=KEY, remat=remat,
                                return_log_marginal_likelihood=True,
                                return_latents=False)
            return -jnp.mean(r["log_marginal_likelihood"])

        g_plain = jax.grad(lambda t: loss_fn(t, False))(transition)
        g_remat = jax.grad(lambda t: loss_fn(t, True))(transition)
        np.testing.assert_allclose(float(g_plain.mult),
                                   float(g_remat.mult), rtol=1e-4)


class TestSoftResampling:
    """Engine-integrated differentiable resampling (method='soft')."""

    def _components(self):
        from aesmc_tpu.models import lgssm
        initial = lgssm.Initial(0.0, 1.0)
        transition = lgssm.Transition.create(0.9, 1.0)
        emission = lgssm.Emission.create(1.0, 0.3)
        proposal = lgssm.Proposal.create(1.0, 1.0, KEY)
        _, obs = statistics.sample_from_prior(initial, transition, emission,
                                              12, 4, KEY)
        return obs, dict(initial=initial, transition=transition,
                         emission=emission, proposal=proposal)

    def test_alpha_one_equals_multinomial(self):
        obs, comps = self._components()
        a = inference.infer("smc", obs, num_particles=64, key=KEY,
                            resampling_method="multinomial",
                            return_log_marginal_likelihood=True, **comps)
        b = inference.infer("smc", obs, num_particles=64, key=KEY,
                            resampling_method="soft",
                            soft_resampling_alpha=1.0,
                            return_log_marginal_likelihood=True, **comps)
        np.testing.assert_allclose(
            np.asarray(a["log_marginal_likelihood"]),
            np.asarray(b["log_marginal_likelihood"]), rtol=1e-4)

    def test_estimator_consistent_with_exact_lml(self):
        from aesmc_tpu.models import kalman
        obs, comps = self._components()
        obs_np = np.asarray(obs)
        exact = np.array([
            kalman.kalman_filter(
                obs_np[:, b],
                kalman.KalmanParams(0.0, 1.0, 0.9, 0.0, 1.0,
                                    1.0, 0.0, 0.3 ** 2))[4]
            for b in range(obs_np.shape[1])])
        est = inference.infer(
            "smc", obs, num_particles=2048, key=KEY,
            resampling_method="soft", soft_resampling_alpha=0.5,
            return_log_marginal_likelihood=True,
            **comps)["log_marginal_likelihood"]
        np.testing.assert_allclose(np.asarray(est), exact, rtol=0.05)

    def test_weight_gradients_flow(self):
        # The point of soft resampling: d loss / d transition params gets
        # a contribution THROUGH the resampling weights.
        from aesmc_tpu import losses
        obs, comps = self._components()

        def loss_fn(tr, method):
            return losses.get_loss(
                obs, 32, "aesmc", comps["initial"], tr, comps["emission"],
                comps["proposal"], key=KEY, resampling_method=method)

        g_soft = jax.grad(lambda t: loss_fn(t, "soft"))(comps["transition"])
        assert np.isfinite(float(g_soft.mult))
        assert abs(float(g_soft.mult)) > 0

    def test_soft_plus_adaptive_raises(self):
        obs, comps = self._components()
        with pytest.raises(ValueError, match="soft resampling"):
            inference.infer("smc", obs, num_particles=8, key=KEY,
                            resampling_method="soft",
                            resampling_criterion=0.5, **comps)


class TestLongSequence:
    def test_t2000_scales_linearly(self):
        # The reference's history resampling is O(T^2) (inference.py:
        # 102-104); this engine must handle T=2000 quickly and under
        # remat, gradients included.
        import time
        from aesmc_tpu import losses
        from aesmc_tpu.models import lgssm
        initial = lgssm.Initial(0.0, 1.0)
        transition = lgssm.Transition.create(0.9, 1.0)
        emission = lgssm.Emission.create(1.0, 0.3)
        proposal = lgssm.Proposal.create(1.0, 1.0, KEY)
        _, obs = statistics.sample_from_prior(initial, transition, emission,
                                              2000, 2, KEY)

        grad_fn = jax.jit(jax.grad(lambda tr: losses.get_loss(
            obs, 8, "aesmc", initial, tr, emission, proposal, key=KEY,
            remat=True)))
        g = grad_fn(transition)
        assert np.isfinite(float(g.mult))
        t0 = time.perf_counter()
        float(grad_fn(transition).mult)
        assert time.perf_counter() - t0 < 10.0


class TestAutoregressiveObservations:
    """Models whose dynamics consume previous observations - the engine
    passes a length-1 list whose [-1] entry is y_{t-1}, matching the
    reference's observations[:time] contract
    (/root/reference/aesmc/inference.py:20-46)."""

    class ArEmission:
        def __call__(self, latents=None, time=None,
                     previous_observations=None):
            from aesmc_tpu.state import BatchShapeMode
            loc = latents[-1]
            if previous_observations is not None and time != 0:
                prev_obs = jnp.asarray(previous_observations[-1])
                # [B] during inference, [B, 1] during generative rollout.
                prev_obs = prev_obs.reshape(prev_obs.shape[0], -1)
                loc = loc + 0.5 * prev_obs
            return dists.Normal(
                loc, 0.3, batch_shape_mode=BatchShapeMode.FULLY_EXPANDED)

    def test_rollout_and_inference(self):
        from aesmc_tpu.models import lgssm
        initial = lgssm.Initial(0.0, 1.0)
        transition = lgssm.Transition.create(0.9, 1.0)
        emission = self.ArEmission()
        proposal = lgssm.Proposal.create(1.0, 1.0, KEY)
        latents, obs = statistics.sample_from_prior(
            initial, transition, emission, 10, 3, KEY)
        assert obs.shape == (10, 3)
        result = inference.infer(
            "smc", obs, initial, transition, emission, proposal, 16,
            key=KEY, return_log_marginal_likelihood=True)
        assert np.isfinite(np.asarray(
            result["log_marginal_likelihood"])).all()


class TestShapeErrors:
    def test_incompatible_log_prob_shapes_raise(self):
        from aesmc_tpu import state as astate
        d = dists.Normal(jnp.zeros((2, 3, 4, 5)), 1.0)
        with pytest.raises(RuntimeError, match="Incompatible"):
            astate.log_prob(d, jnp.zeros((2, 3)))

    def test_resample_shape_mismatch_asserts(self):
        from aesmc_tpu import state as astate
        with pytest.raises(AssertionError):
            astate.resample(jnp.zeros((2, 5)), jnp.zeros((2, 4), jnp.int32))


class TestObservationSlicing:
    def test_static_slice(self):
        stacked = jnp.arange(12.0).reshape(4, 3)
        seq = inference.ObservationSequence(stacked)
        sub = seq[:2]
        assert isinstance(sub, inference.ObservationSequence)
        assert len(sub) == 2
        np.testing.assert_array_equal(np.asarray(sub[1]),
                                      np.asarray(stacked[1]))

    def test_traced_slice_raises(self):
        seq = inference.ObservationSequence(jnp.zeros((4, 3)))
        t = inference.TimeIndex(jnp.asarray(2))
        with pytest.raises(TypeError, match="Python-int bounds"):
            seq[:t]


class TestOTResampling:
    """Engine-integrated ensemble-transport resampling (method='ot',
    round 2): particles transported by entropy-regularized Sinkhorn,
    weights reset to uniform, gradients flow through the transport."""

    def _components(self):
        from aesmc_tpu.models import lgssm
        initial = lgssm.Initial(0.0, 1.0)
        transition = lgssm.Transition.create(0.9, 1.0)
        emission = lgssm.Emission.create(1.0, 0.3)
        proposal = lgssm.Proposal.create(1.0, 1.0, KEY)
        _, obs = statistics.sample_from_prior(initial, transition,
                                              emission, 12, 4, KEY)
        return obs, dict(initial=initial, transition=transition,
                         emission=emission, proposal=proposal)

    def test_estimator_close_to_exact_lml(self):
        from aesmc_tpu.models import kalman
        obs, comps = self._components()
        obs_np = np.asarray(obs)
        exact = np.array([
            kalman.kalman_filter(
                obs_np[:, b],
                kalman.KalmanParams(0.0, 1.0, 0.9, 0.0, 1.0,
                                    1.0, 0.0, 0.3 ** 2))[4]
            for b in range(obs_np.shape[1])])
        est = inference.infer(
            "smc", obs, num_particles=1024, key=KEY,
            resampling_method="ot", ot_epsilon=0.25,
            ot_num_iterations=30,
            return_log_marginal_likelihood=True, return_latents=False,
            return_log_weight=False,
            **comps)["log_marginal_likelihood"]
        assert np.isfinite(np.asarray(est)).all()
        # OT resampling is biased but consistent-ish; stay loose.
        np.testing.assert_allclose(np.asarray(est), exact, rtol=0.10)

    def test_gradients_flow_through_transport(self):
        from aesmc_tpu import losses
        obs, comps = self._components()

        def loss_fn(tr):
            return losses.get_loss(
                obs, 32, "aesmc", comps["initial"], tr,
                comps["emission"], comps["proposal"], key=KEY,
                resampling_method="ot", ot_num_iterations=10)

        g = jax.grad(loss_fn)(comps["transition"])
        assert np.isfinite(float(g.mult))
        assert abs(float(g.mult)) > 0

    def test_invalid_combinations_raise(self):
        obs, comps = self._components()
        with pytest.raises(ValueError, match="transports particles"):
            inference.infer("smc", obs, num_particles=8, key=KEY,
                            resampling_method="ot", **comps)
        with pytest.raises(ValueError, match="history_window"):
            inference.infer("smc", obs, num_particles=8, key=KEY,
                            resampling_method="ot", history_window=2,
                            return_latents=False,
                            return_log_weight=False,
                            return_log_marginal_likelihood=True, **comps)
        with pytest.raises(ValueError, match="ESS-adaptive"):
            inference.infer("smc", obs, num_particles=8, key=KEY,
                            resampling_method="ot",
                            resampling_criterion=0.5,
                            return_latents=False,
                            return_log_weight=False,
                            return_log_marginal_likelihood=True, **comps)

    def test_original_latents_available(self):
        obs, comps = self._components()
        out = inference.infer(
            "smc", obs, num_particles=16, key=KEY,
            resampling_method="ot", ot_num_iterations=5,
            return_latents=False, return_original_latents=True,
            return_log_weight=True,
            return_log_marginal_likelihood=True, **comps)
        assert out["original_latents"].shape == (12, 4, 16)
        assert np.isfinite(np.asarray(out["original_latents"])).all()


def test_adaptive_mixed_rows_select_correctly():
    """Round-2 fused-adaptive path: rows above the ESS threshold keep
    identity ancestry and their particles; rows below resample - checked
    directly via the ancestors/weights outputs on a batch engineered to
    mix both cases in one step."""
    from aesmc_tpu.models import lgssm
    initial = lgssm.Initial(0.0, 1.0)
    transition = lgssm.Transition.create(0.9, 1.0)
    # Row 0: huge emission noise -> near-uniform weights -> high ESS
    # (keeps); row 1: tiny noise -> degenerate weights -> low ESS
    # (resamples). Same shared scale can't do both, so instead engineer
    # via observations: outlier observations concentrate the weights.
    emission = lgssm.Emission.create(1.0, 0.3)
    proposal = lgssm.Proposal.create(1.0, 1.0, KEY)
    T, B, K = 3, 2, 64
    _, obs = statistics.sample_from_prior(initial, transition, emission,
                                          T, B, KEY)
    obs = jnp.asarray(obs).at[:, 1].set(25.0)   # row 1: far outliers
    out = inference.infer(
        "smc", obs, initial, transition, emission, proposal, K, key=KEY,
        resampling_criterion=0.2, return_ancestral_indices=True,
        return_log_weights=True,
        return_log_marginal_likelihood=True)
    anc = np.asarray(out["ancestral_indices"])       # [T-1, B, K]
    lw = np.asarray(out["log_weights"])              # [T, B, K]
    identity = np.arange(K)
    ess = np.exp(2 * jax.nn.logsumexp(jnp.asarray(lw), axis=2) -
                 jax.nn.logsumexp(2 * jnp.asarray(lw), axis=2))
    mixed_steps = 0
    for t in range(T - 1):
        for b in range(B):
            if ess[t, b] >= 0.2 * K:
                np.testing.assert_array_equal(anc[t, b], identity)
            else:
                assert not np.array_equal(anc[t, b], identity)
                mixed_steps += 1
    # the construction must actually exercise BOTH branches
    assert 0 < mixed_steps < (T - 1) * B, (mixed_steps, ess)
