"""Weighted-posterior statistics and generative rollouts (L2).

Capability parity with /root/reference/aesmc/statistics.py:7-162:
empirical expectation/mean/variance over weighted particles, (log)
effective sample size, and ancestral sampling from the generative prior.

TPU-native differences:
- `empirical_expectation` is fully vectorized over the particle axis
  (one vmap + einsum-style weighted reduction) where the reference loops
  particles in Python and mutates its weight slice in place
  (/root/reference/aesmc/statistics.py:29-42, SURVEY.md S2.4 item 6);
- `sample_from_prior` is a `lax.scan` with explicit PRNG-key threading
  (vs the Python time loop at /root/reference/aesmc/statistics.py:144-153)
  and supports dict-valued (pytree) latents/observations.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import math as amath
from . import state
from .inference import ObservationSequence, TimeIndex, _stack_time


def empirical_expectation(value, log_weight, f):
    """E_w[f(value)] over the particle axis.

    Args:
        value: `[batch, particle, ...]` array.
        log_weight: `[batch, particle]` unnormalized log-weights.
        f: maps `[batch, ...]` -> `[batch, out...]` (applied per particle
           via vmap, so it must be jax-traceable).

    Returns: `[batch, out...]` weighted average.
    """
    value = jnp.asarray(value)
    log_weight = jnp.asarray(log_weight)
    assert value.shape[:2] == log_weight.shape, (
        f"value {value.shape} and log_weight {log_weight.shape} mismatch")
    normalized_weights = amath.exponentiate_and_normalize(log_weight, dim=1)
    fv = jax.vmap(f, in_axes=1, out_axes=1)(value)  # [batch, particle, ...]
    w = normalized_weights.reshape(
        normalized_weights.shape + (1,) * (fv.ndim - 2))
    return jnp.sum(w * fv, axis=1)


def empirical_mean(value, log_weight):
    """Weighted mean over particles -> `[batch, ...]`."""
    return empirical_expectation(value, log_weight, lambda x: x)


def empirical_variance(value, log_weight):
    """Weighted variance over particles -> `[batch, ...]`."""
    return empirical_expectation(value, log_weight, lambda x: x ** 2) - \
        empirical_mean(value, log_weight) ** 2


def empirical_mean_sequence(values, log_weight):
    """Per-timestep weighted means for a STACKED `[T, batch, particle,
    ...]` pytree (e.g. `infer(...)["latents"]`) under one `[batch,
    particle]` weight array -> `[T, batch, ...]`. Convenience vmap of
    `empirical_mean` over the leading time axis."""
    return jax.vmap(empirical_mean, in_axes=(0, None))(values,
                                                       log_weight)


def empirical_variance_sequence(values, log_weight):
    """Per-timestep weighted variances for a stacked sequence ->
    `[T, batch, ...]` (see `empirical_mean_sequence`)."""
    return jax.vmap(empirical_variance, in_axes=(0, None))(values,
                                                           log_weight)


def log_ess(log_weight):
    """log ESS = 2*logsumexp(logw) - logsumexp(2*logw).

    Shift-invariant in the log-weights; parity with
    /root/reference/aesmc/statistics.py:79-92.
    """
    log_weight = jnp.asarray(log_weight)
    dim = 1 if log_weight.ndim == 2 else 0
    return 2 * jax.nn.logsumexp(log_weight, axis=dim) - \
        jax.nn.logsumexp(2 * log_weight, axis=dim)


def ess(log_weight):
    """Effective sample size -> `[batch]` (or scalar)."""
    return jnp.exp(log_ess(log_weight))


def sample_from_prior(initial, transition, emission, num_timesteps: int,
                      batch_size: int, key=None, history_window: int = 1):
    """Ancestral sampling of (latents, observations) from the model prior.

    Parity with /root/reference/aesmc/statistics.py:108-162, as a scan.
    The components see the same contract as in `infer` (length-W
    `previous_latents` / `latents` / `previous_observations` lists,
    W = `history_window`, default 1; `time` is 0 or a TimeIndex; steps
    before t=0 are padded with copies of the t=0 values).

    Returns:
        (latents, observations): stacked `[T, batch, ...]` pytrees with
        the particle dim squeezed out.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    if history_window < 1:
        raise ValueError(
            f"history_window must be >= 1. currently = {history_window}")
    w = history_window
    step_keys = jax.random.split(key, (num_timesteps, 2))

    latent_0 = state.sample(initial(), batch_size, 1, step_keys[0, 0])
    obs_0 = state.sample(emission(latents=[latent_0], time=0), batch_size, 1,
                         step_keys[0, 1])

    if num_timesteps > 1:
        def buf_slices(buf):
            return [jax.tree_util.tree_map(lambda x, i=i: x[i], buf)
                    for i in range(w)]

        def buf_shift(buf, new):
            return jax.tree_util.tree_map(
                lambda b, n: jnp.concatenate([b[1:], n[None]], axis=0),
                buf, new)

        def step(carry, inputs):
            latent_buf, obs_buf = carry
            t, keys_t = inputs
            time = TimeIndex(t)
            prev_latents = buf_slices(latent_buf)
            prev_obs = buf_slices(obs_buf)
            latent_t = state.sample(
                transition(previous_latents=prev_latents, time=time,
                           previous_observations=prev_obs),
                batch_size, 1, keys_t[0])
            obs_t = state.sample(
                emission(latents=prev_latents[1:] + [latent_t], time=time,
                         previous_observations=prev_obs),
                batch_size, 1, keys_t[1])
            return ((buf_shift(latent_buf, latent_t),
                     buf_shift(obs_buf, obs_t)),
                    (latent_t, obs_t))

        def expand(x):
            return jax.tree_util.tree_map(
                lambda v: jnp.broadcast_to(v[None], (w,) + v.shape), x)

        times = jnp.arange(1, num_timesteps, dtype=jnp.int32)
        _, (rest_latents, rest_obs) = jax.lax.scan(
            step, (expand(latent_0), expand(obs_0)),
            (times, step_keys[1:]))
        latents = _stack_time(latent_0, rest_latents)
        observations = _stack_time(obs_0, rest_obs)
    else:
        latents = _stack_time(latent_0, None)
        observations = _stack_time(obs_0, None)

    def squeeze_num_particles(value):
        return jax.tree_util.tree_map(lambda x: jnp.squeeze(x, axis=2), value)

    return squeeze_num_particles(latents), squeeze_num_particles(observations)
