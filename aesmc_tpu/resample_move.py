"""Resample-move particle filter (Gilks & Berzuini 2001).

The classic MCMC-rejuvenation answer to weight degeneracy: after each
resampling step the (duplicated) particles are diversified by a few
Metropolis-Hastings steps that leave the filtering posterior invariant,
so the cloud regains support without touching the weights - the log-Z
estimator stays unbiased (moves happen at uniform weights, between the
weighting steps).

The mechanics per step t >= 1 (Chopin & Papaspiliopoulos 2020, ch. 10):

1. resample the carried pairs (x_{t-2}, x_{t-1}) with the step-(t-1)
   weights - a uniformly-weighted approximation of
   p(x_{t-2:t-1} | y_{0:t-1});
2. MOVE the head x_{t-1} of every pair, holding its parent x_{t-2}
   fixed, with `num_move_steps` random-walk MH steps targeting the
   conditional p(x_{t-1} | x_{t-2}, y_{0:t-1})
   = f(x_{t-1} | x_{t-2}) g(y_{t-1} | x_{t-1}) / Z - exactly the two
   component densities the model already defines (at t=1 the pair head
   is x_0 and the prior mu replaces f). Holding the parent fixed makes
   the kernel invariant for the PATH posterior, hence for every
   filtering marginal;
3. propose x_t from the moved parent, weight as usual.

The random-walk scale auto-adapts per dimension to
`move_scale` x (weighted std of the current cloud) - the Liu-West
bandwidth heuristic - so one dimensionless knob serves models of any
scale. Continuous latents only (a random walk on integer states is
meaningless; discrete models rarely need rejuvenation - duplicates are
exact there).

No reference counterpart (the reference engine resamples blindly:
/root/reference/aesmc/inference.py:234-269). Standalone module riding
the same component contract as the engine, like `blockpf`/`sqmc`.
"""

from __future__ import annotations

import math as _stdmath

import jax
import jax.numpy as jnp

from . import resampling, state
from .inference import (ObservationSequence, TimeIndex,
                        stack_observations, _first_leaf)

__all__ = ["resample_move_filter"]


def _tree_normal_like(key, tree):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    keys = jax.random.split(key, len(leaves))
    return jax.tree_util.tree_unflatten(
        treedef, [jax.random.normal(k, jnp.shape(l), jnp.asarray(l).dtype)
                  for k, l in zip(keys, leaves)])


def _weighted_std(tree, log_weight):
    """Per-leaf, per-trailing-dim weighted std over the particle axis,
    shape `[B, 1(, D)]` - the RW bandwidth base."""
    w = jax.nn.softmax(log_weight, axis=1)

    def leaf_std(x):
        wx = w.reshape(w.shape + (1,) * (x.ndim - 2))
        mean = jnp.sum(wx * x, axis=1, keepdims=True)
        var = jnp.sum(wx * (x - mean) ** 2, axis=1, keepdims=True)
        return jnp.sqrt(jnp.maximum(var, 1e-12))

    return jax.tree_util.tree_map(leaf_std, tree)


def resample_move_filter(observations, initial, transition, emission,
                         proposal, num_particles: int, key=None,
                         num_move_steps: int = 2,
                         move_scale: float = 0.5,
                         target_acceptance=None,
                         adaptation_gain: float = 0.5,
                         resampling_method: str = "systematic",
                         resampling_implementation="auto",
                         return_latents: bool = True,
                         scan_unroll: int = 1):
    """SMC with post-resampling MH rejuvenation of the parents.

    Args:
        observations: list or stacked `[T, batch, ...]` pytree.
        initial, transition, emission, proposal: engine components.
        num_particles: K.
        key: PRNG key.
        num_move_steps: MH steps per filter step (0 = plain SMC).
        move_scale: dimensionless RW scale, multiplied by the weighted
            per-dimension std of the current cloud.
        target_acceptance: optional acceptance target in (0, 1) (0.44
            is the 1-D optimum, 0.234 high-dim): a per-batch-row
            log-scale multiplier is Robbins-Monro-updated after every
            step, `log_mult += gain * (rate - target)` - diminishing
            per-step influence relative to the growing trajectory, the
            standard adaptive-MCMC recipe; MH is valid at ANY scale so
            invariance is untouched.
        adaptation_gain: the Robbins-Monro gain (only with
            `target_acceptance`).
        resampling_method / resampling_implementation: as in `infer`.
        return_latents: include filtered latents `[T, B, K, ...]`.

    Returns:
        dict with 'log_marginal_likelihood' `[batch]`, 'log_weight'
        `[batch, K]`, 'acceptance_rate' `[T-1, batch]` (mean MH
        acceptance per step; all-zero when `num_move_steps == 0`), and
        'latents' when requested.
    """
    if num_move_steps < 0:
        raise ValueError("num_move_steps must be >= 0. currently = "
                         f"{num_move_steps}")
    if key is None:
        key = jax.random.PRNGKey(0)
    stacked_obs = stack_observations(observations)
    obs_seq = ObservationSequence(stacked_obs)
    num_timesteps = len(obs_seq)
    batch_size = _first_leaf(stacked_obs).shape[1]
    k = num_particles
    log_k = _stdmath.log(k)
    # Per step: resample, move, propose.
    step_keys = jax.random.split(key, (num_timesteps, 3))
    resolved_impl = resampling.resolve_implementation(
        (batch_size, k), resampling_method, resampling_implementation)

    # ---- t = 0 (hoisted).
    proposal_dist = proposal(time=0, observations=obs_seq)
    latent_0 = state.sample(proposal_dist, batch_size, k, step_keys[0, 2])
    log_weight_0 = (state.log_prob(initial(), latent_0) +
                    state.log_prob(emission(latents=[latent_0], time=0),
                                   state.expand_observation(obs_seq[0], k))
                    - state.log_prob(proposal_dist, latent_0))

    def head_log_target(head, parent, time_head, obs_head, prev_obs_head):
        """log f(head | parent) + log g(y | head); prior mu at t=0."""
        if parent is None:
            trans_lp = state.log_prob(initial(), head)
            emis_lp = state.log_prob(emission(latents=[head], time=0),
                                     state.expand_observation(obs_head, k))
        else:
            prev_list = ([prev_obs_head] if prev_obs_head is not None
                         else None)
            trans_lp = state.log_prob(
                transition(previous_latents=[parent], time=time_head,
                           previous_observations=prev_list), head)
            emis_lp = state.log_prob(
                emission(latents=[head], time=time_head,
                         previous_observations=prev_list),
                state.expand_observation(obs_head, k))
        return trans_lp + emis_lp

    def mh_move(key, head, parent, log_weight_for_scale, time_head,
                obs_head, prev_obs_head, log_scale_mult=None):
        """num_move_steps RW-MH steps on `head`; returns (head, rate)."""
        def leaf_scale(s):
            out = move_scale * s
            if log_scale_mult is not None:
                out = out * jnp.exp(log_scale_mult).reshape(
                    (-1,) + (1,) * (s.ndim - 1))
            return out

        scale = jax.tree_util.tree_map(
            leaf_scale, _weighted_std(head, log_weight_for_scale))
        lp = head_log_target(head, parent, time_head, obs_head,
                             prev_obs_head)
        accepted_total = jnp.zeros((batch_size,), lp.dtype)
        for m in range(num_move_steps):
            key, k_prop, k_acc = jax.random.split(key, 3)
            eps = _tree_normal_like(k_prop, head)
            cand = jax.tree_util.tree_map(
                lambda x, e, s: x + s * e, head, eps, scale)
            cand_lp = head_log_target(cand, parent, time_head, obs_head,
                                      prev_obs_head)
            log_u = jnp.log(jax.random.uniform(
                k_acc, (batch_size, k), minval=1e-38))
            acc = log_u < (cand_lp - lp)                      # [B, K]
            head = jax.tree_util.tree_map(
                lambda c, x: jnp.where(
                    acc.reshape(acc.shape + (1,) * (jnp.ndim(x) - 2)),
                    c, x),
                cand, head)
            lp = jnp.where(acc, cand_lp, lp)
            accepted_total = accepted_total + jnp.mean(
                acc.astype(lp.dtype), axis=1)
        rate = (accepted_total / num_move_steps if num_move_steps
                else accepted_total)
        return head, rate

    # ---- t = 1 (hoisted too: the pair head is x_0, whose target uses
    # the prior - a different trace than the scan body).
    if num_timesteps > 1:
        time_1 = TimeIndex(jnp.asarray(1, jnp.int32))
        _, resampled_0 = resampling.sample_ancestral_index_and_resample(
            log_weight_0, step_keys[1, 0], latent_0,
            method=resampling_method, implementation=resolved_impl,
            need_indices=False)
        log_mult_0 = jnp.zeros((batch_size,),
                               log_weight_0.dtype)
        moved_0, rate_1 = mh_move(step_keys[1, 1], resampled_0, None,
                                  log_weight_0, None, obs_seq[0], None,
                                  log_mult_0)
        if target_acceptance is not None:
            log_mult_0 = log_mult_0 + adaptation_gain * (
                rate_1 - target_acceptance)
        contribution_1 = jax.nn.logsumexp(log_weight_0, axis=1) - log_k
        proposal_dist = proposal(previous_latents=[moved_0], time=time_1,
                                 observations=obs_seq)
        latent_1 = state.sample(proposal_dist, batch_size, k,
                                step_keys[1, 2])
        prev_obs_1 = obs_seq[0]
        log_weight_1 = (
            state.log_prob(
                transition(previous_latents=[moved_0], time=time_1,
                           previous_observations=[prev_obs_1]), latent_1) +
            state.log_prob(
                emission(latents=[latent_1], time=time_1,
                         previous_observations=[prev_obs_1]),
                state.expand_observation(obs_seq[1], k)) -
            state.log_prob(proposal_dist, latent_1))

    if num_timesteps == 1:
        out = {"log_marginal_likelihood":
                   jax.nn.logsumexp(log_weight_0, axis=1) - log_k,
               "log_weight": log_weight_0,
               "acceptance_rate": jnp.zeros((0, batch_size))}
        if return_latents:
            out["latents"] = jax.tree_util.tree_map(
                lambda x: x[None], latent_0)
        return out

    def step(carry, inputs):
        parent, latent, log_weight, log_z, log_mult = carry
        obs_t, obs_prev, obs_prev2, t, keys_t = inputs
        time = TimeIndex(t)
        time_prev = TimeIndex(t - 1)

        # 1. resample the (parent, head) pairs with the head weights.
        _, (res_parent, res_head) = \
            resampling.sample_ancestral_index_and_resample(
                log_weight, keys_t[0], (parent, latent),
                method=resampling_method, implementation=resolved_impl,
                need_indices=False)
        log_z = log_z + jax.nn.logsumexp(log_weight, axis=1) - log_k

        # 2. move the head x_{t-1} | x_{t-2}, y_{t-1}.
        moved, rate = mh_move(keys_t[1], res_head, res_parent,
                              log_weight, time_prev, obs_prev, obs_prev2,
                              log_mult)
        if target_acceptance is not None:
            log_mult = log_mult + adaptation_gain * (
                rate - target_acceptance)

        # 3. propose x_t and weight.
        proposal_dist = proposal(previous_latents=[moved], time=time,
                                 observations=obs_seq)
        latent_t = state.sample(proposal_dist, batch_size, k, keys_t[2])
        log_weight_t = (
            state.log_prob(
                transition(previous_latents=[moved], time=time,
                           previous_observations=[obs_prev]), latent_t) +
            state.log_prob(
                emission(latents=[latent_t], time=time,
                         previous_observations=[obs_prev]),
                state.expand_observation(obs_t, k)) -
            state.log_prob(proposal_dist, latent_t))
        return ((moved, latent_t, log_weight_t, log_z, log_mult),
                (latent_t if return_latents else None, rate))

    if num_timesteps > 2:
        rest_obs = jax.tree_util.tree_map(lambda x: x[2:], stacked_obs)
        prev_obs = jax.tree_util.tree_map(lambda x: x[1:-1], stacked_obs)
        prev2_obs = jax.tree_util.tree_map(lambda x: x[:-2], stacked_obs)
        times = jnp.arange(2, num_timesteps, dtype=jnp.int32)
        carry0 = (moved_0, latent_1, log_weight_1, contribution_1,
                  log_mult_0)
        (last_parent, last_latent, last_log_weight, log_z, _), \
            (rest_latents, rates) = jax.lax.scan(
                step, carry0,
                (rest_obs, prev_obs, prev2_obs, times, step_keys[2:]),
                unroll=scan_unroll)
        acceptance = jnp.concatenate([rate_1[None], rates], axis=0)
    else:
        last_latent, last_log_weight = latent_1, log_weight_1
        log_z, rest_latents = contribution_1, None
        acceptance = rate_1[None]

    out = {"log_marginal_likelihood":
               log_z + jax.nn.logsumexp(last_log_weight, axis=1) - log_k,
           "log_weight": last_log_weight,
           "acceptance_rate": acceptance}
    if return_latents:
        if rest_latents is None:
            stacked = jax.tree_util.tree_map(
                lambda a, b: jnp.stack([a, b]), latent_0, latent_1)
        else:
            stacked = jax.tree_util.tree_map(
                lambda a, b, r: jnp.concatenate([a[None], b[None], r]),
                latent_0, latent_1, rest_latents)
        out["latents"] = stacked
    return out
