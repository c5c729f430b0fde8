"""Particle smoothing: forward-filter backward-simulation (FFBS).

Godsill, Doucet & West (2004): given a particle filter's stored
(un-lineage-traced) latents and per-step log-weights, draw M complete
smoothing trajectories from the joint smoothing distribution
p(x_{0:T-1} | y_{0:T-1}) by a backward pass - at each step t the
ancestor of trajectory m is drawn from

    w_t^i * p(x_{t+1}^{(m)} | x_t^i)

so, unlike lineage tracing (`inference.get_resampled_latents`, which
collapses onto the few surviving forward lineages), FFBS trajectories
do not degenerate at early timesteps. O(T * K * M) per batch row via a
[B, K, M] pairwise transition tile per step - the same broadcastable-
transition contract as `aesmc_tpu.tmc` (transition called with
[B, K, 1, ...] parents, log_prob evaluated at [B, 1, M, ...] children).

The reference package has no smoother (beyond-parity capability; its
`statistics` only computes filtering expectations). Run the filter with
`infer('smc', ..., return_original_latents=True, return_log_weights=
True)` and hand both here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .inference import TimeIndex, stack_observations
from .tmc import _expand_prev, _expand_new, _pairwise_log_prob

__all__ = ["backward_simulation"]


def backward_simulation(original_latents, log_weights, transition,
                        num_trajectories: int, key,
                        observations=None, scan_unroll: int = 1):
    """Draws `num_trajectories` joint smoothing trajectories.

    Args:
        original_latents: stacked `[T, B, K, ...]` pytree - the
            UN-resampled per-step particles
            (`infer(..., return_original_latents=True)`).
        log_weights: `[T, B, K]` per-step (pre-resampling) log-weights
            (`infer(..., return_log_weights=True)`).
        transition: the model's transition component (must broadcast -
            see module docstring).
        num_trajectories: M, trajectories per batch row.
        key: PRNG key.
        observations: optional observations (list or stacked) if the
            transition reads `previous_observations`.
    Returns:
        `[T, B, M, ...]` pytree of smoothing trajectories.
    """
    log_weights = jnp.asarray(log_weights)
    num_timesteps, batch_size, _ = log_weights.shape
    m = num_trajectories
    stacked_obs = (stack_observations(observations)
                   if observations is not None else None)

    def pick(latent_t, idx):
        """Gather [B, K, ...] at idx [B, M] -> [B, M, ...]."""
        def leaf(x):
            expanded = idx.reshape(idx.shape + (1,) * (x.ndim - 2))
            return jnp.take_along_axis(x, expanded, axis=1)
        return jax.tree_util.tree_map(leaf, latent_t)

    # ---- t = T-1: ancestors from the final filtering weights.
    key, sub = jax.random.split(key)
    idx_last = jax.random.categorical(
        sub, log_weights[-1][:, None, :], axis=-1,
        shape=(batch_size, m))                               # [B, M]
    last = pick(jax.tree_util.tree_map(lambda x: x[-1],
                                       original_latents), idx_last)

    # ---- t = T-2 .. 0 (reverse scan).
    def step(carry, inputs):
        chosen = carry                                       # [B, M, ...]
        latent_t, logw_t, t, obs_prev, sub = inputs
        # Transition from t to t+1: engine convention is
        # previous_observations = [y_t] at time t+1.
        time = TimeIndex(t + 1)
        prev_obs_list = [obs_prev] if obs_prev is not None else None

        pair_dist = transition(
            previous_latents=[_expand_prev(latent_t)], time=time,
            previous_observations=prev_obs_list)
        # trans_lp[b, k, m] = log p(chosen^m | candidate parent^k)
        trans_lp = _pairwise_log_prob(pair_dist, _expand_new(chosen))
        logits = logw_t[:, :, None] + trans_lp               # [B, K, M]
        idx = jax.random.categorical(
            sub, jnp.moveaxis(logits, 1, 2), axis=-1)        # [B, M]
        new_chosen = pick(latent_t, idx)
        return new_chosen, new_chosen

    rest_latents = jax.tree_util.tree_map(lambda x: x[:-1],
                                          original_latents)
    times = jnp.arange(num_timesteps - 1, dtype=jnp.int32)
    keys = jax.random.split(key, num_timesteps - 1)
    if stacked_obs is not None:
        obs_prev = jax.tree_util.tree_map(lambda x: x[:-1], stacked_obs)
    else:
        obs_prev = None
    inputs = (rest_latents, log_weights[:-1], times, obs_prev, keys)
    _, traj = jax.lax.scan(step, last, inputs, reverse=True,
                           unroll=scan_unroll)
    # Append the t = T-1 choice.
    return jax.tree_util.tree_map(
        lambda r, l: jnp.concatenate([r, l[None]], axis=0), traj,
        last)
