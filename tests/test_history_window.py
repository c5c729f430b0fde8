"""Tier-2 (non-Markov) component contract: `history_window=W`.

The engine carries a W-deep buffer of original latents/observations and
hands components length-W lists, restoring the reference's full-history
capability (/root/reference/aesmc/inference.py:20-46,102-104) without
its O(T^2) regathers. Checks:

- an AR(2) model (transition reads previous_latents[-2]) run through
  `infer(history_window=2)` matches a hand-rolled eager Python-loop
  particle filter (same primitives, same keys) to ~1e-6;
- on a Markov model, W=2 reproduces W=1 exactly (same PRNG schedule);
- `sample_from_prior(history_window=2)` matches its own hand-rolled
  loop;
- windowed 'is' mode runs and matches the hand loop too.
"""

import jax
import jax.numpy as jnp
import numpy as np

from aesmc_tpu import distributions as dists
from aesmc_tpu import inference, resampling, state, statistics
from aesmc_tpu.state import BatchShapeMode

KEY = jax.random.PRNGKey(3)
T, B, K = 12, 3, 32


class Ar2Initial:
    def __call__(self):
        return dists.Normal(0.0, 1.0)


class Ar2Transition:
    """x_t = 0.6 x_{t-1} + 0.3 x_{t-2} + N(0, 0.8) - reads [-2]."""

    def __call__(self, previous_latents=None, time=None,
                 previous_observations=None):
        loc = 0.6 * previous_latents[-1] + 0.3 * previous_latents[-2]
        return dists.Normal(loc, 0.8,
                            batch_shape_mode=BatchShapeMode.FULLY_EXPANDED)


class Ar2Emission:
    def __call__(self, latents=None, time=None, previous_observations=None):
        return dists.Normal(latents[-1], 0.3,
                            batch_shape_mode=BatchShapeMode.FULLY_EXPANDED)


class Ar2Proposal:
    def __call__(self, previous_latents=None, time=None, observations=None):
        if time == 0:
            return dists.Normal(0.4 * observations[0], 1.0,
                                batch_shape_mode=BatchShapeMode.BATCH_EXPANDED)
        obs_t = observations[time]
        loc = (0.5 * previous_latents[-1] + 0.2 * previous_latents[-2] +
               0.3 * obs_t[:, None])
        return dists.Normal(loc, 0.9,
                            batch_shape_mode=BatchShapeMode.FULLY_EXPANDED)


def hand_rolled_filter(algorithm, obs, key, w=2):
    """Eager Python-loop SMC/IS with the engine's key schedule and the
    reference's history-regather semantics (originals gathered by the
    CURRENT ancestor index only)."""
    initial, transition, emission, proposal = (
        Ar2Initial(), Ar2Transition(), Ar2Emission(), Ar2Proposal())
    obs_seq = inference.ObservationSequence(obs)
    step_keys = jax.random.split(key, (T, 2))
    smc = algorithm == "smc"

    prop0 = proposal(time=0, observations=obs_seq)
    latents = [state.sample(prop0, B, K, step_keys[0, 1])]
    lw = [state.log_prob(initial(), latents[0]) +
          state.log_prob(emission(latents=latents, time=0),
                         state.expand_observation(obs_seq[0], K)) -
          state.log_prob(prop0, latents[0])]
    ancestors = []
    for t in range(1, T):
        if smc:
            idx = resampling.sample_ancestral_index(lw[-1], step_keys[t, 0])
            ancestors.append(idx)
            window = [latents[max(s, 0)] for s in range(t - w, t)]
            prevs = [jnp.take_along_axis(x, idx, axis=1) for x in window]
        else:
            window = [latents[max(s, 0)] for s in range(t - w, t)]
            prevs = window
        prop = proposal(previous_latents=prevs, time=t,
                        observations=obs_seq)
        x_t = state.sample(prop, B, K, step_keys[t, 1])
        # Emission history: originals (not regathered) + the new latent.
        emis_hist = [latents[max(s, 0)] for s in range(t - w + 1, t)] + [x_t]
        lw.append(
            state.log_prob(transition(previous_latents=prevs, time=t),
                           x_t) +
            state.log_prob(emission(latents=emis_hist, time=t),
                           state.expand_observation(obs_seq[t], K)) -
            state.log_prob(prop, x_t))
        latents.append(x_t)

    lw = jnp.stack(lw)
    if smc:
        lml = jnp.sum(
            jax.nn.logsumexp(lw, axis=2) - jnp.log(float(K)), axis=0)
        anc = jnp.stack(ancestors)
    else:
        lml = jax.nn.logsumexp(jnp.sum(lw, axis=0), axis=1) - \
            jnp.log(float(K))
        anc = None
    return lml, lw, anc


def _make_obs():
    _, obs = statistics.sample_from_prior(
        Ar2Initial(), Ar2Transition(), Ar2Emission(), T, B,
        jax.random.PRNGKey(11), history_window=2)
    return obs


class TestWindowedInference:
    def test_smc_matches_hand_rolled(self):
        obs = _make_obs()
        lml_h, lw_h, anc_h = hand_rolled_filter("smc", obs, KEY)
        out = inference.infer(
            "smc", obs, Ar2Initial(), Ar2Transition(), Ar2Emission(),
            Ar2Proposal(), K, key=KEY, history_window=2,
            return_log_marginal_likelihood=True, return_log_weights=True,
            return_ancestral_indices=True)
        np.testing.assert_array_equal(np.asarray(out["ancestral_indices"]),
                                      np.asarray(anc_h))
        np.testing.assert_allclose(np.asarray(out["log_weights"]),
                                   np.asarray(lw_h), atol=2e-5)
        np.testing.assert_allclose(
            np.asarray(out["log_marginal_likelihood"]),
            np.asarray(lml_h), atol=2e-5)

    def test_is_matches_hand_rolled(self):
        obs = _make_obs()
        lml_h, lw_h, _ = hand_rolled_filter("is", obs, KEY)
        out = inference.infer(
            "is", obs, Ar2Initial(), Ar2Transition(), Ar2Emission(),
            Ar2Proposal(), K, key=KEY, history_window=2,
            return_log_marginal_likelihood=True, return_log_weights=True)
        np.testing.assert_allclose(np.asarray(out["log_weights"]),
                                   np.asarray(lw_h), atol=2e-5)
        np.testing.assert_allclose(
            np.asarray(out["log_marginal_likelihood"]),
            np.asarray(lml_h), atol=2e-5)

    def test_markov_model_invariant_to_window(self):
        """On a Markov model the window size must not change anything
        (same key schedule, same gathers, same estimator)."""
        from aesmc_tpu.models import lgssm
        initial = lgssm.Initial(0.0, 1.0)
        transition = lgssm.Transition.create(0.9, 1.0)
        emission = lgssm.Emission.create(1.0, 0.2)
        proposal = lgssm.Proposal.create(1.0, 1.0, KEY)
        _, obs = statistics.sample_from_prior(
            initial, transition, emission, T, B, KEY)
        outs = {}
        for w in (1, 3):
            outs[w] = inference.infer(
                "smc", obs, initial, transition, emission, proposal, K,
                key=KEY, history_window=w,
                return_log_marginal_likelihood=True,
                return_log_weights=True, return_ancestral_indices=True)
        np.testing.assert_array_equal(
            np.asarray(outs[1]["ancestral_indices"]),
            np.asarray(outs[3]["ancestral_indices"]))
        np.testing.assert_allclose(
            np.asarray(outs[1]["log_weights"]),
            np.asarray(outs[3]["log_weights"]), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(outs[1]["log_marginal_likelihood"]),
            np.asarray(outs[3]["log_marginal_likelihood"]), atol=1e-5)

    def test_gradients_flow_through_window(self):
        obs = _make_obs()

        class TrainableAr2:
            def __init__(self, a1, a2):
                self.a1, self.a2 = a1, a2

            def __call__(self, previous_latents=None, time=None,
                         previous_observations=None):
                loc = (self.a1 * previous_latents[-1] +
                       self.a2 * previous_latents[-2])
                return dists.Normal(
                    loc, 0.8, batch_shape_mode=BatchShapeMode.FULLY_EXPANDED)

        def loss_fn(params):
            from aesmc_tpu import losses
            a1, a2 = params
            return losses.get_loss(
                obs, 16, "aesmc", Ar2Initial(), TrainableAr2(a1, a2),
                Ar2Emission(), Ar2Proposal(), key=KEY, history_window=2)

        g = jax.grad(loss_fn)((jnp.float32(0.6), jnp.float32(0.3)))
        assert all(np.isfinite(float(x)) and float(x) != 0.0 for x in g)

    def test_bad_window_raises(self):
        obs = _make_obs()
        import pytest
        with pytest.raises(ValueError, match="history_window"):
            inference.infer("smc", obs, Ar2Initial(), Ar2Transition(),
                            Ar2Emission(), Ar2Proposal(), K, key=KEY,
                            history_window=0)


class TestWindowedRollout:
    def test_matches_hand_rolled(self):
        w = 2
        key = jax.random.PRNGKey(11)
        step_keys = jax.random.split(key, (T, 2))
        initial, transition, emission = (
            Ar2Initial(), Ar2Transition(), Ar2Emission())
        lat = [state.sample(initial(), B, 1, step_keys[0, 0])]
        obs = [state.sample(emission(latents=lat, time=0), B, 1,
                            step_keys[0, 1])]
        for t in range(1, T):
            prevs = [lat[max(s, 0)] for s in range(t - w, t)]
            prev_obs = [obs[max(s, 0)] for s in range(t - w, t)]
            x_t = state.sample(
                transition(previous_latents=prevs, time=t,
                           previous_observations=prev_obs), B, 1,
                step_keys[t, 0])
            y_t = state.sample(
                emission(latents=prevs[1:] + [x_t], time=t,
                         previous_observations=prev_obs), B, 1,
                step_keys[t, 1])
            lat.append(x_t)
            obs.append(y_t)
        lat_h = jnp.stack([x[:, 0] for x in lat])
        obs_h = jnp.stack([y[:, 0] for y in obs])

        lat_e, obs_e = statistics.sample_from_prior(
            initial, transition, emission, T, B, key, history_window=2)
        np.testing.assert_allclose(np.asarray(lat_e), np.asarray(lat_h),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(obs_e), np.asarray(obs_h),
                                   atol=1e-6)
