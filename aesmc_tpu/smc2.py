"""SMC^2: sequential inference over model parameters (beyond parity).

SMC^2 (Chopin, Jacob, Papaspiliopoulos, "SMC^2: an efficient algorithm
for sequential analysis of state space models", JRSS-B 2013) runs a
particle filter OVER PARAMETERS: M theta-particles each carry an inner
K-particle state filter; at every observation the inner filters advance
one step and each theta's weight multiplies by its inner filter's
unbiased incremental-evidence estimate, so the theta cloud tracks the
sequence of posteriors p(theta | y_{0:t}) online. When the theta ESS
degenerates the cloud is resampled and rejuvenated by particle-MCMC
(PMMH) moves that re-run a fresh inner filter from scratch - an exact
algorithm for any M >= 2, K >= 1 (the theta-marginal is a pseudo-
marginal construction). The reference package has nothing comparable;
its only parameter inference is gradient-based point estimation
(/root/reference/aesmc/train.py:22-41). Companions here:
`csmc.pmmh` (MCMC over theta) and `csmc.particle_gibbs` (joint
smoothing); SMC^2 adds ONLINE parameter posteriors plus a model-
evidence estimate p(y_{0:T-1}) marginalized over theta.

TPU shape: ONE `jax.lax.scan` over time. The M inner filters advance
together - component calls `jax.vmap`'d over the theta axis, inner
resampling done on the FLATTENED [M*B, K] weight matrix so the fused
Pallas resampling kernels see one big batch (the M axis is free
parallelism, exactly how a TPU wants it). Rejuvenation lives inside
`lax.cond`: the triggered branch re-runs the inner filters over the
full padded T with steps beyond the current time frozen (static
shapes; XLA skips the branch when not taken). Inner filters resample
every step, so per-step increments are exactly
`logsumexp_k(logw_t) - log K`.
"""

from __future__ import annotations

import math as _stdmath

import jax
import jax.numpy as jnp

from . import resampling, state
from .inference import (ObservationSequence, TimeIndex, _first_leaf,
                        stack_observations)

__all__ = ["smc2"]


def _tree_where(pred, a, b):
    """Leaf-wise select with `pred` broadcast from the leading axes."""
    return jax.tree_util.tree_map(
        lambda x, y: jnp.where(
            pred.reshape(pred.shape + (1,) * (x.ndim - pred.ndim)), x, y),
        a, b)


def _tree_take(tree, idx, axis=0):
    return jax.tree_util.tree_map(
        lambda x: jnp.take(x, idx, axis=axis), tree)


def smc2(observations, build_components, theta0, log_prior,
         num_particles: int, key=None,
         ess_threshold: float = 0.5, num_moves: int = 2,
         step_size=0.15,
         resampling_method: str = "systematic",
         resampling_implementation="auto",
         return_history: bool = False,
         mesh=None, theta_axis: str = "data",
         particle_axis: str = "particle"):
    """Online parameter + state inference by nested SMC.

    Args:
        observations: list of `[B, ...]` pytrees or stacked
            `[T, B, ...]` pytree. Batch rows are independent sequences
            SHARING theta (their evidence terms add), matching
            `csmc.pmmh`.
        build_components: traceable `theta -> (initial, transition,
            emission, proposal)` from ONE parameter pytree (no leading
            M axis) - same contract as `csmc.pmmh`.
        theta0: parameter pytree whose leaves carry a leading
            `[num_theta]` axis - the initial theta cloud. For the
            algorithm to target the posterior exactly these must be
            iid PRIOR draws (num_theta >= 2).
        log_prior: `theta -> scalar` log prior density of one theta.
        num_particles: K, the inner state-filter particle count.
        key: PRNG key.
        ess_threshold: rejuvenate when theta-ESS < threshold * M
            (0 disables rejuvenation entirely -> pure reweighting, i.e.
            importance sampling from the prior cloud).
        num_moves: PMMH random-walk moves per rejuvenation. Each move
            re-runs all M inner filters from scratch (O(T) masked
            scan), so moves dominate rejuvenation cost.
        step_size: random-walk scale - scalar or pytree matching one
            theta (per-leaf scales).
        resampling_method / resampling_implementation: inner-filter
            resampling knobs; the theta-cloud resampling reuses
            `resampling_method`. The inner filters run on the flattened
            [M*B, K] batch, so 'auto' routes through the fused Pallas
            kernel at kernel-worthy sizes.
        return_history: also return per-step theta-posterior history.
        mesh / theta_axis / particle_axis: optional `jax.sharding.Mesh`
            (round-5): the theta cloud (and its per-theta inner-filter
            state) is constrained over `theta_axis` and the inner
            particle axis over `particle_axis`, so GSPMD partitions the
            [M, B, K] nested filters across devices - M independent
            filters are embarrassingly parallel; only the theta-cloud
            resampling/logsumexp and PMMH acceptance cross shards.

    Returns:
        dict:
          theta: pytree `[M, ...]` - the final theta cloud.
          log_theta_weight: `[M]` (normalize with `math.lognormexp`).
          log_evidence: scalar log p_hat(y_{0:T-1}) marginalized over
              the prior (sums over batch sequences).
          inner_log_marginal_likelihood: `[M, B]` per-theta inner
              filter log-Z at the final time.
          acceptance_rate: mean PMMH acceptance over all moves taken
              (0.0 if no rejuvenation fired).
          num_rejuvenations: int32 count of rejuvenation events.
          ess_path: `[T]` theta-ESS after each step.
          (return_history) theta_history: pytree `[T, M, ...]`,
          log_theta_weight_history: `[T, M]`.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    theta0 = jax.tree_util.tree_map(jnp.asarray, theta0)
    m_leaf = _first_leaf(theta0)
    num_theta = int(m_leaf.shape[0])
    if num_theta < 2:
        raise ValueError(
            f"smc2 needs num_theta >= 2 prior draws in theta0. "
            f"currently = {num_theta}")
    if not 0.0 <= float(ess_threshold) <= 1.0:
        raise ValueError(
            f"ess_threshold must be in [0, 1]. "
            f"currently = {ess_threshold}")
    stacked_obs = stack_observations(observations)
    obs_seq = ObservationSequence(stacked_obs)
    num_timesteps = len(obs_seq)
    batch_size = _first_leaf(stacked_obs).shape[1]
    log_k = _stdmath.log(num_particles)
    if isinstance(step_size, (int, float)):
        one_theta = jax.tree_util.tree_map(lambda x: x[0], theta0)
        step_tree = jax.tree_util.tree_map(
            lambda x: jnp.full_like(jnp.asarray(x, jnp.result_type(
                float)), step_size), one_theta)
    else:
        step_tree = jax.tree_util.tree_map(jnp.asarray, step_size)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        def _spec_for(x, ndim_theta_only):
            # [M, ...] theta-cloud leaves: theta axis sharded. Arrays
            # with an inner particle axis ([M, B, K, ...]) also shard K.
            nd = jnp.ndim(x)
            if nd >= 3 and not ndim_theta_only:
                return PartitionSpec(theta_axis, None, particle_axis,
                                     *([None] * (nd - 3)))
            return PartitionSpec(theta_axis, *([None] * (nd - 1)))

        def _constrain_cloud(tree, theta_only=False):
            def leaf(x):
                if jnp.ndim(x) == 0:
                    return x
                return jax.lax.with_sharding_constraint(
                    x, NamedSharding(mesh, _spec_for(x, theta_only)))
            return jax.tree_util.tree_map(leaf, tree)
    else:
        def _constrain_cloud(tree, theta_only=False):
            return tree

    # ---- single-theta inner-filter pieces (vmapped over M below).
    def inner_init(theta, k):
        """t=0: propose K particles, weight. -> (latent [B,K,...],
        logw [B,K])."""
        initial, _, emission, proposal = build_components(theta)
        proposal_dist = proposal(time=0, observations=obs_seq)
        latent = state.sample(proposal_dist, batch_size, num_particles,
                              k)
        log_weight = (
            state.log_prob(initial(), latent) +
            state.log_prob(emission(latents=[latent], time=0),
                           state.expand_observation(obs_seq[0],
                                                    num_particles)) -
            state.log_prob(proposal_dist, latent))
        return latent, log_weight

    def inner_propose_weight(theta, previous_latent, obs_t, obs_prev,
                             t, k):
        """Post-resampling half of one inner step: propose from the
        (already gathered) ancestors, compute the fresh weights."""
        _, transition, emission, proposal = build_components(theta)
        time = TimeIndex(t)
        prev_obs_list = [obs_prev]
        proposal_dist = proposal(previous_latents=[previous_latent],
                                 time=time, observations=obs_seq)
        latent = state.sample(proposal_dist, batch_size, num_particles,
                              k)
        log_weight = (
            state.log_prob(transition(
                previous_latents=[previous_latent], time=time,
                previous_observations=prev_obs_list), latent) +
            state.log_prob(emission(
                latents=[latent], time=time,
                previous_observations=prev_obs_list),
                state.expand_observation(obs_t, num_particles)) -
            state.log_prob(proposal_dist, latent))
        return latent, log_weight

    def resample_all(log_weight, latent, k):
        """Inner resampling for ALL theta at once on the flattened
        [M*B, K] batch (one fused-kernel call; indices detached)."""
        flat_w = log_weight.reshape(num_theta * batch_size,
                                    num_particles)
        flat_lat = jax.tree_util.tree_map(
            lambda x: x.reshape((num_theta * batch_size,) + x.shape[2:]),
            latent)
        _, gathered = resampling.sample_ancestral_index_and_resample(
            flat_w, k, flat_lat, method=resampling_method,
            implementation=resampling.resolve_implementation(
                flat_w.shape, resampling_method,
                resampling_implementation),
            need_indices=False)
        return jax.tree_util.tree_map(
            lambda x: x.reshape((num_theta, batch_size) + x.shape[1:]),
            gathered)

    def advance(theta, latent, log_weight, obs_t, obs_prev, t, k):
        """One inner SMC step for all M filters. Returns new (latent,
        logw) and the per-theta increments `[M, B]`."""
        k_res, k_prop = jax.random.split(k)
        previous_latent = resample_all(log_weight, latent, k_res)
        prop_keys = jax.random.split(k_prop, num_theta)
        new_latent, new_logw = jax.vmap(
            inner_propose_weight,
            in_axes=(0, 0, None, None, None, 0))(
                theta, previous_latent, obs_t, obs_prev, t, prop_keys)
        inc = jax.nn.logsumexp(new_logw, axis=2) - log_k      # [M, B]
        return new_latent, new_logw, inc

    # ---- masked full re-run (the PMMH move's fresh estimate).
    def rerun(theta, k, t_now):
        """Fresh inner filters for a theta cloud, advanced up to and
        including time `t_now` (steps beyond are computed - static
        shapes - but frozen). Returns (latent, logw, cum `[M, B]`)."""
        init_keys = jax.random.split(k, num_theta + 1)
        latent0, logw0 = jax.vmap(inner_init)(theta, init_keys[1:])
        cum0 = jax.nn.logsumexp(logw0, axis=2) - log_k

        def rr_step(carry, inputs):
            latent, logw, cum = carry
            obs_t, obs_prev, t, kk = inputs
            new_latent, new_logw, inc = advance(
                theta, latent, logw, obs_t, obs_prev, t, kk)
            active = t <= t_now
            latent = _tree_where(
                jnp.broadcast_to(active, (num_theta,)), new_latent,
                latent)
            logw = jnp.where(active, new_logw, logw)
            cum = cum + jnp.where(active, inc, 0.0)
            return (latent, logw, cum), None

        if num_timesteps == 1:
            return latent0, logw0, cum0
        rest_obs = jax.tree_util.tree_map(lambda x: x[1:], stacked_obs)
        prev_obs = jax.tree_util.tree_map(lambda x: x[:-1], stacked_obs)
        times = jnp.arange(1, num_timesteps, dtype=jnp.int32)
        step_keys = jax.random.split(init_keys[0], num_timesteps - 1)
        (latent, logw, cum), _ = jax.lax.scan(
            rr_step, (latent0, logw0, cum0),
            (rest_obs, prev_obs, times, step_keys))
        return latent, logw, cum

    vmapped_log_prior = jax.vmap(log_prior)

    def rejuvenate(theta, latent, logw, cum, log_theta_w, t_now, k):
        """theta-resample + num_moves PMMH moves at time t_now.
        Weights reset to uniform. Returns (theta, latent, logw, cum,
        log_theta_w, accepted_count)."""
        k_res, k_moves = jax.random.split(k)
        anc = resampling.sample_ancestral_index(
            log_theta_w[None, :], k_res, method=resampling_method,
            implementation="xla")[0]                          # [M]
        theta = _tree_take(theta, anc)
        latent = _tree_take(latent, anc)
        logw = jnp.take(logw, anc, axis=0)
        cum = jnp.take(cum, anc, axis=0)
        accepted = jnp.zeros((), jnp.float32)

        def one_move(carry, kk):
            theta, latent, logw, cum, accepted = carry
            k_noise, k_run, k_acc = jax.random.split(kk, 3)
            leaves, treedef = jax.tree_util.tree_flatten(theta)
            noise_keys = jax.random.split(k_noise, len(leaves))
            steps = jax.tree_util.tree_leaves(step_tree)
            prop_leaves = [
                x + s * jax.random.normal(nk, x.shape, x.dtype)
                for x, s, nk in zip(leaves, steps, noise_keys)]
            theta_prop = jax.tree_util.tree_unflatten(treedef,
                                                      prop_leaves)
            lat_p, logw_p, cum_p = rerun(theta_prop, k_run, t_now)
            log_ratio = (vmapped_log_prior(theta_prop) +
                         jnp.sum(cum_p, axis=1) -
                         vmapped_log_prior(theta) -
                         jnp.sum(cum, axis=1))                # [M]
            u = jax.random.uniform(k_acc, (num_theta,))
            acc = jnp.log(u) < log_ratio
            theta = _tree_where(acc, theta_prop, theta)
            latent = _tree_where(acc, lat_p, latent)
            logw = jnp.where(acc[:, None, None], logw_p, logw)
            cum = jnp.where(acc[:, None], cum_p, cum)
            accepted = accepted + jnp.mean(acc.astype(jnp.float32))
            return (theta, latent, logw, cum, accepted), None

        move_keys = jax.random.split(k_moves, num_moves)
        (theta, latent, logw, cum, accepted), _ = jax.lax.scan(
            one_move, (theta, latent, logw, cum, accepted), move_keys)
        return (theta, latent, logw, cum,
                jnp.zeros_like(log_theta_w), accepted)

    # ---- t = 0.
    key, k0 = jax.random.split(key)
    init_keys = jax.random.split(k0, num_theta)
    latent, logw = jax.vmap(inner_init)(theta0, init_keys)
    inc0 = jax.nn.logsumexp(logw, axis=2) - log_k             # [M, B]
    cum = inc0
    log_theta_w = jnp.sum(inc0, axis=1)                       # [M]
    log_evidence = (jax.nn.logsumexp(log_theta_w) -
                    _stdmath.log(num_theta))
    theta = theta0

    def outer_step(carry, inputs):
        (theta, latent, logw, cum, log_theta_w, log_evidence,
         accepted, n_rejuv) = carry
        theta = _constrain_cloud(theta, theta_only=True)
        latent = _constrain_cloud(latent)
        logw = _constrain_cloud(logw)
        cum = _constrain_cloud(cum, theta_only=True)
        log_theta_w = _constrain_cloud(log_theta_w, theta_only=True)
        obs_t, obs_prev, t, kk = inputs
        k_adv, k_rej = jax.random.split(kk)
        latent, logw, inc = advance(theta, latent, logw, obs_t,
                                    obs_prev, t, k_adv)
        cum = cum + inc
        new_w = log_theta_w + jnp.sum(inc, axis=1)
        log_evidence = log_evidence + (jax.nn.logsumexp(new_w) -
                                       jax.nn.logsumexp(log_theta_w))
        log_theta_w = new_w
        ess = jnp.exp(2.0 * jax.nn.logsumexp(log_theta_w) -
                      jax.nn.logsumexp(2.0 * log_theta_w))
        do = ess < ess_threshold * num_theta

        def hot(args):
            theta, latent, logw, cum, log_theta_w, accepted = args
            theta, latent, logw, cum, log_theta_w, acc = rejuvenate(
                theta, latent, logw, cum, log_theta_w, t, k_rej)
            return theta, latent, logw, cum, log_theta_w, accepted + acc

        def cold(args):
            return args

        (theta, latent, logw, cum, log_theta_w, accepted) = \
            jax.lax.cond(do, hot, cold,
                         (theta, latent, logw, cum, log_theta_w,
                          accepted))
        n_rejuv = n_rejuv + do.astype(jnp.int32)
        carry = (theta, latent, logw, cum, log_theta_w, log_evidence,
                 accepted, n_rejuv)
        hist = ((theta, log_theta_w) if return_history else None)
        return carry, (ess, hist)

    accepted = jnp.zeros((), jnp.float32)
    n_rejuv = jnp.zeros((), jnp.int32)
    if num_timesteps > 1:
        rest_obs = jax.tree_util.tree_map(lambda x: x[1:], stacked_obs)
        prev_obs = jax.tree_util.tree_map(lambda x: x[:-1], stacked_obs)
        times = jnp.arange(1, num_timesteps, dtype=jnp.int32)
        key, ks = jax.random.split(key)
        step_keys = jax.random.split(ks, num_timesteps - 1)
        carry = (theta, latent, logw, cum, log_theta_w, log_evidence,
                 accepted, n_rejuv)
        carry, (ess_rest, hist) = jax.lax.scan(
            outer_step, carry,
            (rest_obs, prev_obs, times, step_keys))
        (theta, latent, logw, cum, log_theta_w, log_evidence,
         accepted, n_rejuv) = carry
    else:
        ess_rest = jnp.zeros((0,), dtype=log_theta_w.dtype)
        hist = None
    ess0 = jnp.exp(2.0 * jax.nn.logsumexp(jnp.sum(inc0, axis=1)) -
                   jax.nn.logsumexp(2.0 * jnp.sum(inc0, axis=1)))
    ess_path = jnp.concatenate([ess0[None], ess_rest])

    total_moves = n_rejuv.astype(jnp.float32) * num_moves
    out = {
        "theta": theta,
        "log_theta_weight": log_theta_w,
        "log_evidence": log_evidence,
        "inner_log_marginal_likelihood": cum,
        "acceptance_rate": jnp.where(total_moves > 0,
                                     accepted / jnp.maximum(
                                         total_moves, 1.0), 0.0),
        "num_rejuvenations": n_rejuv,
        "ess_path": ess_path,
    }
    if return_history:
        theta_hist, w_hist = hist
        # Prepend the t=0 cloud (theta0, prior-weighted).
        out["theta_history"] = jax.tree_util.tree_map(
            lambda h, z: jnp.concatenate([z[None], h], axis=0),
            theta_hist, theta0)
        out["log_theta_weight_history"] = jnp.concatenate(
            [jnp.sum(inc0, axis=1)[None], w_hist], axis=0)
    return out
