"""Predictive distributions: h-step-ahead forecasting and calibration.

Completes the serving loop (`docs/SERVING.md`): a particle filter's
posterior cloud is only useful downstream as a PREDICTIVE distribution
- p(x_{t+1:t+H}, y_{t+1:t+H} | y_{0:t}) - plus a way to check that it
is calibrated. No reference counterpart (the reference's statistics.py
only computes filtering expectations; its sampling path
/root/reference/aesmc/statistics.py:108-162 samples the prior, not the
posterior predictive).

Three pieces:

1. `forecast` / `forecast_online` - generative rollout of the model
   from the current weighted cloud: each particle is advanced H steps
   through the transition and an observation is sampled per particle
   per step (one `lax.scan`, fixed shapes, jittable). The importance
   weights carry over UNCHANGED (no new observations are assimilated),
   so every predictive functional is a weighted expectation over the
   rolled-out particles.
2. `weighted_quantiles` - predictive intervals from weighted samples
   (inverse-CDF of the weighted empirical distribution).
3. `predictive_pit` - probability-integral-transform values
   u_t = P_pred(y <= y_realized): under a CALIBRATED forecast u is
   Uniform(0, 1) (Dawid's prequential calibration), so a drifting PIT
   histogram is the standard serving alarm for model misspecification
   - the natural companion to the `log_pred` anomaly score of the
   streaming filter.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import state
from .inference import TimeIndex

__all__ = ["forecast", "forecast_online", "weighted_quantiles",
           "predictive_pit"]


def forecast(latent, log_weight, transition, emission, horizon: int,
             key, start_time, previous_observation=None,
             scan_unroll: int = 1):
    """Rolls the weighted particle cloud H steps through the model.

    Args:
        latent: `[batch, K(, ...)]` pytree - the current posterior
            particles (e.g. `infer(...)['latents'][-1]` or
            `OnlineFilterState.latent`).
        log_weight: `[batch, K]` unnormalized log-weights attached to
            the particles (returned unchanged; forecasting assimilates
            nothing).
        transition, emission: model components (engine contract).
        horizon: H >= 1 steps to roll.
        key: PRNG key.
        start_time: time index of the LAST assimilated observation
            (int or int32 scalar); step h is evaluated at
            `TimeIndex(start_time + h)`.
        previous_observation: `[batch, ...]` pytree y_t, for models
            whose transition/emission read `previous_observations`.
            Sampled observations are fed back per particle
            (`[batch, K, ...]`) on later steps - models that consume
            them must broadcast over the particle dim.
        scan_unroll: forwarded to `lax.scan`.

    Returns:
        dict with 'latents' `[H, batch, K(, ...)]`, 'observations'
        `[H, batch, K(, ...)]` (per-particle predictive samples) and
        'log_weight' (the input, unchanged).
    """
    if horizon < 1:
        raise ValueError(f"horizon must be >= 1. currently = {horizon}")
    batch_size, num_particles = jnp.asarray(log_weight).shape
    start_time = jnp.asarray(start_time, jnp.int32)
    step_keys = jax.random.split(key, (horizon, 2))
    if previous_observation is not None:
        # Per-particle from the start so the scan carry has one type
        # (later steps feed back per-particle sampled observations).
        previous_observation = state.expand_observation(
            previous_observation, num_particles)

    def step(carry, inputs):
        lat, prev_obs = carry
        h, keys_h = inputs
        time = TimeIndex(start_time + h)
        prev_obs_list = [prev_obs] if prev_obs is not None else None
        lat_next = state.sample(
            transition(previous_latents=[lat], time=time,
                       previous_observations=prev_obs_list),
            batch_size, num_particles, keys_h[0])
        obs_next = state.sample(
            emission(latents=[lat_next], time=time,
                     previous_observations=prev_obs_list),
            batch_size, num_particles, keys_h[1])
        new_prev = obs_next if prev_obs is not None else None
        return (lat_next, new_prev), (lat_next, obs_next)

    steps = jnp.arange(1, horizon + 1, dtype=jnp.int32)
    _, (latents, observations) = jax.lax.scan(
        step, (latent, previous_observation), (steps, step_keys),
        unroll=scan_unroll)
    return {"latents": latents, "observations": observations,
            "log_weight": log_weight}


def forecast_online(filter_state, transition, emission, horizon: int,
                    key, **kwargs):
    """`forecast` from a streaming carry (`aesmc_tpu.online`): particles,
    weights, last observation and time index all read from the state."""
    return forecast(filter_state.latent, filter_state.log_weight,
                    transition, emission, horizon, key,
                    start_time=filter_state.t - 1,
                    previous_observation=filter_state.prev_observation,
                    **kwargs)


def weighted_quantiles(values, log_weight, qs):
    """Quantiles of the weighted empirical distribution, per batch row.

    Args:
        values: `[batch, K]` samples.
        log_weight: `[batch, K]` unnormalized log-weights.
        qs: sequence of quantiles in (0, 1).

    Returns:
        `[batch, len(qs)]` - the inverse CDF (lowest sample whose
        cumulative weight reaches q).
    """
    values = jnp.asarray(values)
    qs = jnp.asarray(qs)
    order = jnp.argsort(values, axis=1)
    sorted_vals = jnp.take_along_axis(values, order, axis=1)
    w = jax.nn.softmax(jnp.asarray(log_weight), axis=1)
    cum = jnp.cumsum(jnp.take_along_axis(w, order, axis=1), axis=1)
    idx = jax.vmap(lambda c: jnp.searchsorted(c, qs, side="left"))(cum)
    idx = jnp.clip(idx, 0, values.shape[1] - 1)
    return jnp.take_along_axis(sorted_vals, idx, axis=1)


def predictive_pit(predicted, log_weight, realized):
    """PIT value u = P_pred(Y <= y_realized) per batch row.

    The randomized-PIT midpoint convention handles ties (discrete
    observation models): u = P(Y < y) + 0.5 * P(Y = y), which is
    uniform in distribution for both continuous and discrete
    calibrated forecasts (in expectation over the randomization).

    Args:
        predicted: `[batch, K]` predictive observation samples (e.g.
            `forecast(...)['observations'][0]`).
        log_weight: `[batch, K]` unnormalized log-weights.
        realized: `[batch]` the observation that actually arrived.

    Returns:
        `[batch]` PIT values in [0, 1].
    """
    predicted = jnp.asarray(predicted)
    realized = jnp.asarray(realized)[:, None]
    w = jax.nn.softmax(jnp.asarray(log_weight), axis=1)
    below = jnp.sum(w * (predicted < realized), axis=1)
    equal = jnp.sum(w * (predicted == realized), axis=1)
    return below + 0.5 * equal
