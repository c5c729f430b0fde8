"""Particle smoothing: FFBS trajectories and PaRIS online functionals.

Two smoothers, both absent from the reference (its `statistics` only
computes filtering expectations):

1. `backward_simulation` - forward-filter backward-simulation (Godsill,
   Doucet & West 2004): given a particle filter's stored
   (un-lineage-traced) latents and per-step log-weights, draw M complete
   smoothing trajectories from the joint smoothing distribution
   p(x_{0:T-1} | y_{0:T-1}) by a backward pass - at each step t the
   ancestor of trajectory m is drawn from

       w_t^i * p(x_{t+1}^{(m)} | x_t^i)

   so, unlike lineage tracing (`inference.get_resampled_latents`, which
   collapses onto the few surviving forward lineages), FFBS trajectories
   do not degenerate at early timesteps. O(T * K * M) per batch row via
   a [B, K, M] pairwise transition tile per step - the same
   broadcastable-transition contract as `aesmc_tpu.tmc` (transition
   called with [B, K, 1, ...] parents, log_prob evaluated at
   [B, 1, M, ...] children). Needs the whole filter run stored
   (`infer('smc', ..., return_original_latents=True,
   return_log_weights=True)`).

2. `paris` - the Particle-based Rapid Incremental Smoother (Olsson &
   Westerborn 2017): smoothed expectations of ADDITIVE functionals
   S = h0(x_0) + sum_t h(x_{t-1}, x_t, t) computed FORWARD-ONLY with
   O(1) memory in T - each particle carries a running statistic tau^i,
   updated at every filter step by averaging over N backward-kernel
   draws (N >= 2 gives the stable, asymptotically-normal regime; the
   N=1 case degenerates to poor-man's smoothing, i.e. lineage tracing).
   This is the machinery behind online EM, online score/gradient
   (Fisher identity) estimation, and streaming smoothed sufficient
   statistics - nothing is stored per timestep, so T is unbounded.
"""

from __future__ import annotations

import math as _stdmath

import jax
import jax.numpy as jnp

from . import resampling, state
from .inference import (ObservationSequence, TimeIndex,
                        stack_observations, _first_leaf)
from .tmc import _expand_prev, _expand_new, _pairwise_log_prob

__all__ = ["backward_simulation", "paris", "paris_score"]


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


def paris(observations, initial, transition, emission, proposal,
          num_particles: int, h, key=None, h0=None,
          num_backward_draws: int = 2,
          resampling_method: str = "systematic",
          resampling_implementation="auto",
          pairwise: str = "auto",
          remat: bool = True,
          scan_unroll: int = 1):
    """PaRIS: forward-only smoothing of an additive functional.

    Runs a fresh SMC filter over `observations` while every particle
    carries the statistic

        tau_t^i ~= E[ h0(x_0) + sum_{s<=t} h(x_{s-1}, x_s, s)
                      | x_t = x_t^i, y_{0:t} ]

    updated at each step as the average over `num_backward_draws`
    draws J ~ Categorical_j( w_{t-1}^j * p(x_t^i | x_{t-1}^j) ) of
    `tau_{t-1}^J + h(x_{t-1}^J, x_t^i, t)` (Olsson & Westerborn 2017,
    Algorithm 2). The returned smoothed expectation
    `sum_i wbar_T^i tau_T^i` is a consistent estimator of
    E[S | y_{0:T-1}] at O(K^2) compute and O(K) memory per step -
    nothing is stored per timestep (contrast `backward_simulation`,
    which needs the whole [T, B, K] run in memory).

    Args:
        observations: list of `[batch, ...]` pytrees or stacked
            `[T, batch, ...]` pytree.
        initial, transition, emission, proposal: standard components
            (module docstring of `aesmc_tpu.inference`).
        num_particles: K.
        h: additive-increment callable
            `h(previous_latent, latent, time) -> [batch, K]` or
            `[batch, K, D]` - evaluated POINTWISE on matched
            (backward-sampled parent, current particle) pairs, so any
            jnp arithmetic of the two latents works (no broadcast
            contract). `time` is a TimeIndex >= 1.
        h0: optional `h0(latent_0) -> [batch, K(, D)]` initial term
            (default zeros).
        num_backward_draws: N backward-kernel draws per particle per
            step. N=2 (default) is the PaRIS sweet spot: O(1) extra
            cost, keeps the statistic's variance O(T) (N=1 collapses
            to poor-man's/lineage smoothing with O(T^2/K) variance).
        resampling_method: 'systematic' | 'stratified' | 'multinomial'
            (the filter's resampler; the backward draws are always
            multinomial, per the algorithm).
        pairwise: 'broadcast' | 'vmap' | 'auto' - how the [B, K, K]
            backward-kernel tile is formed (same contract as
            `aesmc_tpu.tmc`): 'broadcast' builds the transition once
            from [B, K, 1] parents (arithmetic transitions);
            'vmap' maps it over parents (neural transitions).
        remat: rematerialize the scan body on the backward pass.

    Returns:
        dict with 'smoothed' `[batch(, D)]` (the estimate of
        E[S | y]), 'tau' `[batch, K(, D)]` (final per-particle
        statistics), 'log_weight' `[batch, K]`,
        'log_marginal_likelihood' `[batch]`.
    """
    if num_backward_draws < 1:
        raise ValueError(
            "num_backward_draws must be >= 1. currently = "
            f"{num_backward_draws}")
    if pairwise not in ("auto", "broadcast", "vmap"):
        raise ValueError(
            f"pairwise must be 'auto', 'broadcast' or 'vmap'. "
            f"currently = {pairwise}")
    if key is None:
        key = jax.random.PRNGKey(0)
    stacked_obs = stack_observations(observations)
    obs_seq = ObservationSequence(stacked_obs)
    num_timesteps = len(obs_seq)
    batch_size = _first_leaf(stacked_obs).shape[1]
    k = num_particles
    log_k = _stdmath.log(k)
    # Per step: resampling key, proposal key, backward-draw key.
    step_keys = jax.random.split(key, (num_timesteps, 3))
    resolved_impl = resampling.resolve_implementation(
        (batch_size, k), resampling_method, resampling_implementation)

    # ---- t = 0 (hoisted).
    proposal_dist = proposal(time=0, observations=obs_seq)
    latent_0 = state.sample(proposal_dist, batch_size, k, step_keys[0, 1])
    log_weight_0 = (state.log_prob(initial(), latent_0) +
                    state.log_prob(emission(latents=[latent_0], time=0),
                                   state.expand_observation(obs_seq[0], k))
                    - state.log_prob(proposal_dist, latent_0))
    tau_0 = (jnp.asarray(h0(latent_0)) if h0 is not None
             else jnp.zeros((batch_size, k), log_weight_0.dtype))

    if num_timesteps == 1:
        w = jax.nn.softmax(log_weight_0, axis=1)
        smoothed = jnp.einsum("bk,bk...->b...", w, tau_0)
        return {"smoothed": smoothed, "tau": tau_0,
                "log_weight": log_weight_0,
                "log_marginal_likelihood":
                    jax.nn.logsumexp(log_weight_0, axis=1) - log_k}

    # Resolve 'auto' ONCE, outside the scan, with jax.eval_shape (an
    # in-body probe would survive DCE under jax.checkpoint - the
    # measured round-3 trap; see aesmc_tpu/tmc.py).
    resolved_pairwise = pairwise
    if resolved_pairwise == "auto":
        def _probe(lat, obs0):
            time = TimeIndex(jnp.asarray(1, jnp.int32))
            dist = transition(previous_latents=[_expand_prev(lat)],
                              time=time, previous_observations=[obs0])
            return _pairwise_log_prob(
                dist, _expand_new(jax.tree_util.tree_map(
                    lambda v: v[:, :1], lat)))
        try:
            jax.eval_shape(_probe, latent_0, obs_seq[0])
            resolved_pairwise = "broadcast"
        except Exception:
            resolved_pairwise = "vmap"

    def step(carry, inputs):
        prev_latent, prev_log_weight, tau = carry
        obs_t, obs_prev, t, keys_t = inputs
        time = TimeIndex(t)
        prev_obs_list = [obs_prev]

        # Filter update: resample -> propose -> weight (the engine's
        # always-resample branch; see aesmc_tpu/inference.py).
        _, resampled_parent = resampling.sample_ancestral_index_and_resample(
            prev_log_weight, keys_t[0], prev_latent,
            method=resampling_method, implementation=resolved_impl,
            need_indices=False)
        proposal_dist = proposal(previous_latents=[resampled_parent],
                                 time=time, observations=obs_seq)
        latent_t = state.sample(proposal_dist, batch_size, k, keys_t[1])
        log_weight_t = (
            state.log_prob(
                transition(previous_latents=[resampled_parent], time=time,
                           previous_observations=prev_obs_list),
                latent_t) +
            state.log_prob(
                emission(latents=[latent_t], time=time,
                         previous_observations=prev_obs_list),
                state.expand_observation(obs_t, k)) -
            state.log_prob(proposal_dist, latent_t))
        contribution = (jax.nn.logsumexp(prev_log_weight, axis=1) - log_k)

        # Backward-kernel logits over PRE-resampling parents:
        # logits[b, i_child, j_parent]
        #   = log w_{t-1}^j + log p(x_t^i | x_{t-1}^j).
        if resolved_pairwise == "broadcast":
            pair_dist = transition(
                previous_latents=[_expand_prev(prev_latent)], time=time,
                previous_observations=prev_obs_list)
            a = _pairwise_log_prob(pair_dist, _expand_new(latent_t))
        else:
            def per_parent(parent):
                parent1 = jax.tree_util.tree_map(lambda x: x[:, None],
                                                 parent)
                dist = transition(previous_latents=[parent1], time=time,
                                  previous_observations=prev_obs_list)
                return state.log_prob(dist, latent_t)        # [B, K]
            a = jax.vmap(per_parent, in_axes=1, out_axes=1)(prev_latent)
        # a[b, j_parent, i_child] -> transpose to child-major.
        logits = (jnp.swapaxes(a, 1, 2) +
                  prev_log_weight[:, None, :])               # [B, Ki, Kj]

        draw_keys = jax.random.split(keys_t[2], num_backward_draws)
        acc = None
        for n in range(num_backward_draws):
            j_idx = jax.random.categorical(draw_keys[n], logits,
                                           axis=-1)          # [B, K]
            tau_j = jnp.take_along_axis(
                tau, j_idx.reshape(j_idx.shape + (1,) * (tau.ndim - 2)),
                axis=1)
            parent_j = jax.tree_util.tree_map(
                lambda x: jnp.take_along_axis(
                    x, j_idx.reshape(j_idx.shape + (1,) * (x.ndim - 2)),
                    axis=1),
                prev_latent)
            term = tau_j + jnp.asarray(h(parent_j, latent_t, time))
            acc = term if acc is None else acc + term
        tau_t = acc / num_backward_draws

        return (latent_t, log_weight_t, tau_t), contribution

    rest_obs = jax.tree_util.tree_map(lambda x: x[1:], stacked_obs)
    prev_obs = jax.tree_util.tree_map(lambda x: x[:-1], stacked_obs)
    times = jnp.arange(1, num_timesteps, dtype=jnp.int32)
    body = jax.checkpoint(step) if remat else step
    (last_latent, last_log_weight, tau_last), contributions = \
        jax.lax.scan(body, (latent_0, log_weight_0, tau_0),
                     (rest_obs, prev_obs, times, step_keys[1:]),
                     unroll=scan_unroll)

    w = jax.nn.softmax(last_log_weight, axis=1)
    smoothed = jnp.einsum("bk,bk...->b...", w, tau_last)
    log_ml = (jnp.sum(contributions, axis=0) +
              jax.nn.logsumexp(last_log_weight, axis=1) - log_k)
    return {"smoothed": smoothed, "tau": tau_last,
            "log_weight": last_log_weight,
            "log_marginal_likelihood": log_ml}


def paris_score(observations, build_components, params,
                num_particles: int, key=None,
                num_backward_draws: int = 2,
                resampling_method: str = "systematic",
                resampling_implementation="auto",
                pairwise: str = "auto",
                remat: bool = True):
    """Online score (Fisher-identity gradient) estimation via PaRIS.

    The score of the data log-likelihood of an SSM is the smoothed
    expectation of an additive functional (Fisher/Louis identity):

        grad_theta log p(y_{0:T-1})
          = E[ grad log mu_theta(x_0) + grad log g_theta(y_0 | x_0)
               + sum_{t>=1} grad log f_theta(x_t | x_{t-1})
                          + grad log g_theta(y_t | x_t)  |  y_{0:T-1} ]

    so `paris` computes it FORWARD-ONLY with O(1) memory in T - no
    backpropagation through the scan, no stored activations. This is
    the estimator behind recursive/online maximum likelihood: at P
    parameters the per-particle gradient increments cost P forward-mode
    passes (`jacfwd`; P is small for SSM parameters).

    The proposal is built from the SAME params but its gradient does
    not enter the score (the Fisher identity is for the model, not the
    variational bound - unlike `losses.get_loss`, nothing here needs
    the proposal to be reparameterized or even good, only supported).

    Args:
        observations: list or stacked `[T, batch, ...]` pytree.
        build_components: `params -> (initial, transition, emission,
            proposal)` - the model factory (components closing over
            `params` leaves).
        params: parameter pytree to differentiate with respect to.
        num_particles, key, num_backward_draws, resampling_*, pairwise,
            remat: as in `paris`.

    Returns:
        dict with 'score' (pytree like `params`, each leaf carrying a
        leading `[batch]` axis - the per-sequence score), plus
        `paris`'s 'log_marginal_likelihood' `[batch]`.
    """
    from jax.flatten_util import ravel_pytree

    flat_params, unravel = ravel_pytree(params)
    p_dim = flat_params.shape[0]
    comps = build_components(params)
    initial, transition, emission, proposal = comps
    stacked_obs = stack_observations(observations)
    obs_arr_seq = ObservationSequence(stacked_obs)

    def h(xp, xc, time):
        t_idx = jnp.asarray(time)
        obs_t = obs_arr_seq[t_idx]
        prev_obs_list = [obs_arr_seq[t_idx - 1]]

        def logdensities(flat):
            p = unravel(flat)
            _, trans_p, emis_p, _ = build_components(p)
            k_count = _first_leaf(xc).shape[1]
            return (state.log_prob(
                        trans_p(previous_latents=[xp], time=time,
                                previous_observations=prev_obs_list),
                        xc) +
                    state.log_prob(
                        emis_p(latents=[xc], time=time,
                               previous_observations=prev_obs_list),
                        state.expand_observation(obs_t, k_count)))

        jac = jax.jacfwd(logdensities)(flat_params)          # [B, K, P]
        return jac

    def h0(x0):
        obs_0 = obs_arr_seq[0]

        def logdensities(flat):
            p = unravel(flat)
            init_p, _, emis_p, _ = build_components(p)
            k_count = _first_leaf(x0).shape[1]
            return (state.log_prob(init_p(), x0) +
                    state.log_prob(emis_p(latents=[x0], time=0),
                                   state.expand_observation(obs_0,
                                                            k_count)))

        return jax.jacfwd(logdensities)(flat_params)         # [B, K, P]

    out = paris(stacked_obs, initial, transition, emission, proposal,
                num_particles, h=h, h0=h0, key=key,
                num_backward_draws=num_backward_draws,
                resampling_method=resampling_method,
                resampling_implementation=resampling_implementation,
                pairwise=pairwise, remat=remat)
    smoothed = out["smoothed"]                               # [B, P]
    score = jax.vmap(unravel)(smoothed)
    return {"score": score,
            "log_marginal_likelihood": out["log_marginal_likelihood"]}
