"""PMCMC: conditional SMC, Particle Gibbs, and PMMH (beyond parity).

Conditional SMC (Andrieu, Doucet, Holenstein, "Particle Markov chain
Monte Carlo methods", JRSS-B 2010) is the SMC sweep that KEEPS a
reference trajectory alive: particle slot 0 is pinned to a given
trajectory at every timestep (its ancestor is slot 0), while the other
K-1 particles are proposed and resampled as usual. The resulting
Particle Gibbs kernel - sweep, then sample a new reference from the
surviving lineages - leaves the EXACT joint smoothing posterior
p(x_{0:T-1} | y_{0:T-1}) invariant for ANY particle count K >= 2, which
turns the library's filter into an asymptotically exact posterior
sampler (the reference package has nothing comparable; its only
posterior access is importance-weighted moments).

Also implements ANCESTOR SAMPLING (Lindsten, Jordan, Schon, "Particle
Gibbs with ancestor sampling", JMLR 2014): each step the reference's
ancestor is redrawn from w_{t-1}^i * p(x_t^ref | x_{t-1}^i) instead of
staying 0, which breaks the path-degeneracy that makes vanilla PG mix
poorly at long T. One extra transition log_prob per step.

TPU shape: one `lax.scan` over time (same architecture as
`inference.infer`), free-particle ancestors drawn as K-1 iid
categoricals via sorted exponential-spacing positions (exact, no K^2
tensors), reference pinning as lane-0 writes. Components follow the
standard contract (aesmc_tpu.inference module docstring).
"""

from __future__ import annotations

import math as _stdmath

import jax
import jax.numpy as jnp

from . import resampling, state
from .inference import (ObservationSequence, TimeIndex, _first_leaf,
                        stack_observations)

__all__ = ["csmc_infer", "sample_trajectory", "particle_gibbs_step",
           "particle_gibbs", "pmmh"]


def _conditional_ancestors(log_weight, key):
    """Slot 0 -> 0 (the reference keeps its own lineage); slots
    1..K-1 -> K-1 iid Categorical(softmax(log_weight)) draws.

    The free draws are sampled by inverse-CDF at K-1 SORTED uniforms
    (exponential spacings - the multinomial machinery of
    `resampling`), which is an exchangeable presentation of K-1 iid
    draws; particle slots are exchangeable, so the cSMC kernel's law is
    unchanged. Detached (no gradient), like all ancestor indices.
    """
    log_weight = jax.lax.stop_gradient(jnp.asarray(log_weight))
    batch_size, k = log_weight.shape
    # K-1 sorted uniforms need K exponentials: S_j / S_K, j = 1..K-1.
    e = jax.random.exponential(key, (batch_size, k),
                               dtype=jnp.result_type(float))
    s = jnp.cumsum(e, axis=-1)
    pos = s[:, :-1] / s[:, -1:]                              # [B, K-1]
    below_one = jnp.nextafter(jnp.asarray(1.0, pos.dtype),
                              jnp.asarray(0.0, pos.dtype))
    pos = jnp.minimum(pos, below_one)
    cum = resampling._normalized_cumsum(log_weight)
    idx = resampling._searchsorted_right(cum, pos.astype(cum.dtype))
    idx = jnp.clip(idx, 0, k - 1).astype(jnp.int32)
    zero = jnp.zeros((batch_size, 1), jnp.int32)
    return jnp.concatenate([zero, idx], axis=1)              # [B, K]


def _pin_reference(latent, ref_t):
    """Writes the reference state into particle slot 0 of a [B, K, ...]
    latent pytree (ref_t is [B, ...])."""
    return jax.tree_util.tree_map(
        lambda x, r: x.at[:, 0].set(r), latent, ref_t)


def csmc_infer(observations, initial, transition, emission, proposal,
               num_particles: int, reference, key=None,
               ancestor_sampling: bool = False,
               return_log_marginal_likelihood: bool = True):
    """One conditional-SMC sweep with `reference` pinned to slot 0.

    Args:
        observations: list of `[B, ...]` pytrees or stacked
            `[T, B, ...]` pytree.
        initial/transition/emission/proposal: standard components.
        num_particles: K >= 2.
        reference: stacked `[T, B, ...]` latent pytree - the conditioned
            trajectory (e.g. the previous Particle Gibbs state).
        key: PRNG key.
        ancestor_sampling: redraw the reference's ancestor each step
            from w_{t-1}^i * p(x_t^ref | x_{t-1}^i) (PGAS; one extra
            transition log_prob per step, dramatically better mixing
            at long T).
        return_log_marginal_likelihood: include the (conditional) log-Z
            estimate.

    Returns:
        dict with original_latents `[T, B, K, ...]` (slot 0 == the
        reference at every t), ancestral_indices `[T-1, B, K]`,
        log_weight `[B, K]` (final), log_marginal_likelihood `[B]` or
        None.
    """
    if num_particles < 2:
        raise ValueError(
            f"conditional SMC needs num_particles >= 2. "
            f"currently = {num_particles}")
    if key is None:
        key = jax.random.PRNGKey(0)
    stacked_obs = stack_observations(observations)
    obs_seq = ObservationSequence(stacked_obs)
    num_timesteps = len(obs_seq)
    batch_size = _first_leaf(stacked_obs).shape[1]
    reference = jax.tree_util.tree_map(jnp.asarray, reference)
    log_num_particles = _stdmath.log(num_particles)
    # Three streams per step: ancestors, proposal, ancestor-sampling.
    step_keys = jax.random.split(key, (num_timesteps, 3))

    # ---- t = 0.
    proposal_dist = proposal(time=0, observations=obs_seq)
    latent_0 = state.sample(proposal_dist, batch_size, num_particles,
                            step_keys[0, 1])
    latent_0 = _pin_reference(
        latent_0, jax.tree_util.tree_map(lambda x: x[0], reference))
    log_weight_0 = (
        state.log_prob(initial(), latent_0) +
        state.log_prob(emission(latents=[latent_0], time=0),
                       state.expand_observation(obs_seq[0],
                                                num_particles)) -
        state.log_prob(proposal_dist, latent_0))

    def step(carry, inputs):
        prev_latent, prev_log_weight = carry
        obs_t, obs_prev, ref_t, t, keys_t = inputs
        time = TimeIndex(t)
        prev_obs_list = [obs_prev]

        ancestral_index = _conditional_ancestors(prev_log_weight,
                                                 keys_t[0])
        if ancestor_sampling:
            # PGAS: the reference's ancestor ~ w_{t-1}^i *
            # p(x_t^ref | x_{t-1}^i) over ALL particles i.
            trans_all = transition(previous_latents=[prev_latent],
                                   time=time,
                                   previous_observations=prev_obs_list)
            ref_exp = jax.tree_util.tree_map(
                lambda r: jnp.broadcast_to(
                    r[:, None],
                    (batch_size, num_particles) + r.shape[1:]), ref_t)
            ref_lp = state.log_prob(trans_all, ref_exp)      # [B, K]
            as_logits = jax.lax.stop_gradient(prev_log_weight + ref_lp)
            a0 = jax.random.categorical(keys_t[2], as_logits, axis=-1)
            ancestral_index = ancestral_index.at[:, 0].set(
                a0.astype(jnp.int32))

        previous_latent = state.resample(prev_latent, ancestral_index)
        proposal_dist = proposal(previous_latents=[previous_latent],
                                 time=time, observations=obs_seq)
        latent_t = state.sample(proposal_dist, batch_size, num_particles,
                                keys_t[1])
        latent_t = _pin_reference(latent_t, ref_t)
        log_weight_t = (
            state.log_prob(transition(
                previous_latents=[previous_latent], time=time,
                previous_observations=prev_obs_list), latent_t) +
            state.log_prob(emission(
                latents=[latent_t], time=time,
                previous_observations=prev_obs_list),
                state.expand_observation(obs_t, num_particles)) -
            state.log_prob(proposal_dist, latent_t))
        contribution = (jax.nn.logsumexp(prev_log_weight, axis=1) -
                        log_num_particles)
        return (latent_t, log_weight_t), (latent_t, ancestral_index,
                                          contribution)

    if num_timesteps > 1:
        rest_obs = jax.tree_util.tree_map(lambda x: x[1:], stacked_obs)
        prev_obs = jax.tree_util.tree_map(lambda x: x[:-1], stacked_obs)
        rest_ref = jax.tree_util.tree_map(lambda x: x[1:], reference)
        times = jnp.arange(1, num_timesteps, dtype=jnp.int32)
        (_, last_log_weight), (rest_latents, anc, contributions) = \
            jax.lax.scan(step, (latent_0, log_weight_0),
                         (rest_obs, prev_obs, rest_ref, times,
                          step_keys[1:]))
        original_latents = jax.tree_util.tree_map(
            lambda h, r: jnp.concatenate([h[None], r], axis=0),
            latent_0, rest_latents)
    else:
        last_log_weight = log_weight_0
        anc = jnp.zeros((0, batch_size, num_particles), jnp.int32)
        contributions = jnp.zeros((0, batch_size),
                                  dtype=log_weight_0.dtype)
        original_latents = jax.tree_util.tree_map(
            lambda x: x[None], latent_0)

    lml = None
    if return_log_marginal_likelihood:
        lml = (jnp.sum(contributions, axis=0) +
               jax.nn.logsumexp(last_log_weight, axis=1) -
               log_num_particles)
    return {"original_latents": original_latents,
            "ancestral_indices": anc,
            "log_weight": last_log_weight,
            "log_marginal_likelihood": lml}


def sample_trajectory(original_latents, ancestral_indices, log_weight,
                      key):
    """Draws ONE surviving-lineage trajectory per batch row: j_T ~
    Categorical(softmax(log_weight)), then the ancestry is composed
    backward (reverse scan). Returns a `[T, B, ...]` latent pytree."""
    j = jax.random.categorical(
        key, jax.lax.stop_gradient(jnp.asarray(log_weight)),
        axis=-1).astype(jnp.int32)                           # [B]

    def pick(latent_t, idx):
        return jax.tree_util.tree_map(
            lambda x: jnp.take_along_axis(
                x, idx.reshape((-1, 1) + (1,) * (x.ndim - 2)), axis=1
            )[:, 0], latent_t)

    num_timesteps = _first_leaf(original_latents).shape[0]
    if num_timesteps == 1:
        return jax.tree_util.tree_map(
            lambda x: x[None],
            pick(jax.tree_util.tree_map(lambda x: x[0],
                                        original_latents), j))

    def back(idx, inputs):
        latent_t, anc_tm1 = inputs
        x = pick(latent_t, idx)
        new_idx = jnp.take_along_axis(anc_tm1, idx[:, None],
                                      axis=1)[:, 0]
        return new_idx, x

    rest = jax.tree_util.tree_map(lambda x: x[1:], original_latents)
    final_idx, traj_rest = jax.lax.scan(
        back, j, (rest, ancestral_indices), reverse=True)
    traj_0 = pick(jax.tree_util.tree_map(lambda x: x[0],
                                         original_latents), final_idx)
    return jax.tree_util.tree_map(
        lambda h, r: jnp.concatenate([h[None], r], axis=0),
        traj_0, traj_rest)


def particle_gibbs_step(reference, observations, initial, transition,
                        emission, proposal, num_particles: int, key,
                        ancestor_sampling: bool = True):
    """One Particle Gibbs transition: cSMC sweep conditioned on
    `reference`, then a new reference drawn from the lineages. Leaves
    p(x_{0:T-1} | y_{0:T-1}) invariant exactly for any K >= 2.

    Returns (new_reference `[T, B, ...]`, log_marginal_likelihood `[B]`).
    """
    k_sweep, k_pick = jax.random.split(key)
    out = csmc_infer(observations, initial, transition, emission,
                     proposal, num_particles, reference, key=k_sweep,
                     ancestor_sampling=ancestor_sampling)
    new_ref = sample_trajectory(out["original_latents"],
                                out["ancestral_indices"],
                                out["log_weight"], k_pick)
    return new_ref, out["log_marginal_likelihood"]


def particle_gibbs(observations, initial, transition, emission, proposal,
                   num_particles: int, num_iterations: int, key=None,
                   initial_reference=None,
                   ancestor_sampling: bool = True):
    """Runs a Particle Gibbs chain; the whole chain is ONE `lax.scan`
    of jitted cSMC sweeps (no per-iteration dispatch).

    Args:
        initial_reference: `[T, B, ...]` latent pytree; defaults to a
            bootstrap-SMC lineage sample (a standard initialization).
        ancestor_sampling: use PGAS (recommended; vanilla PG mixes
            poorly at long T).

    Returns:
        (trajectories `[num_iterations, T, B, ...]` pytree - the chain
        states AFTER each sweep, log_marginal_likelihoods
        `[num_iterations, B]`).
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    k_init, k_chain = jax.random.split(key)
    if initial_reference is None:
        from . import inference as _inference

        first = _inference.infer(
            "smc", observations, initial, transition, emission, proposal,
            num_particles, key=k_init, return_latents=False,
            return_original_latents=True, return_ancestral_indices=True,
            return_log_weight=True,
            return_log_marginal_likelihood=False)
        initial_reference = sample_trajectory(
            first["original_latents"], first["ancestral_indices"],
            first["log_weight"], jax.random.fold_in(k_init, 1))

    def chain_step(ref, k):
        new_ref, lml = particle_gibbs_step(
            ref, observations, initial, transition, emission, proposal,
            num_particles, k, ancestor_sampling=ancestor_sampling)
        return new_ref, (new_ref, lml)

    keys = jax.random.split(k_chain, num_iterations)
    _, (trajectories, lmls) = jax.lax.scan(chain_step,
                                           initial_reference, keys)
    return trajectories, lmls


def pmmh(observations, build_components, theta0, log_prior,
         num_particles: int, num_iterations: int, key=None,
         step_size=0.1, algorithm: str = "smc",
         resampling_method: str = "systematic"):
    """Particle marginal Metropolis-Hastings (Andrieu et al. 2010) over
    model PARAMETERS - the companion PMCMC kernel to Particle Gibbs:
    a random-walk MH chain on theta whose acceptance ratio uses the
    SMC (or IS) log-marginal-likelihood estimate as the exact-target
    surrogate (pseudo-marginal MCMC: the chain targets the TRUE
    parameter posterior despite the estimate's noise, because the
    estimator is unbiased in Z).

    The whole chain is ONE `lax.scan` of jitted SMC sweeps - no
    per-iteration dispatch.

    Args:
        observations: list of `[B, ...]` pytrees or stacked pytree
            (independent sequences; their log-MLs add).
        build_components: `theta -> (initial, transition, emission,
            proposal)` - a traceable constructor from the parameter
            pytree (e.g. flax struct `create`s).
        theta0: initial parameter pytree (float leaves).
        log_prior: `theta -> scalar` log prior density.
        num_particles: SMC particle count per sweep.
        num_iterations: MH iterations.
        step_size: random-walk scale - a scalar or a pytree matching
            theta (per-leaf scales).
        algorithm: 'smc' (AESMC-style estimate) or 'is' (IWAE-style).
        resampling_method: forwarded to the sweep.

    Returns:
        (thetas - pytree with a leading [num_iterations] axis (the
         chain AFTER each step), log_mls `[num_iterations]`,
         accept_rate scalar).
    """
    from . import inference as _inference

    if key is None:
        key = jax.random.PRNGKey(0)
    theta0 = jax.tree_util.tree_map(jnp.asarray, theta0)
    if not isinstance(step_size, (int, float)):
        step_tree = step_size
    else:
        step_tree = jax.tree_util.tree_map(
            lambda x: jnp.full_like(x, step_size), theta0)

    def log_ml(theta, k):
        comps = build_components(theta)
        out = _inference.infer(
            algorithm, observations, *comps, num_particles, key=k,
            resampling_method=resampling_method,
            return_log_marginal_likelihood=True, return_latents=False,
            return_log_weight=False)
        return jnp.sum(out["log_marginal_likelihood"])

    def mh_step(carry, k):
        theta, lp = carry
        k_prop, k_run, k_acc = jax.random.split(k, 3)
        leaves, treedef = jax.tree_util.tree_flatten(theta)
        noise_keys = jax.random.split(k_prop, len(leaves))
        steps = jax.tree_util.tree_leaves(step_tree)
        prop_leaves = [
            leaf + s * jax.random.normal(nk, jnp.shape(leaf),
                                         dtype=jnp.asarray(leaf).dtype)
            for leaf, s, nk in zip(leaves, steps, noise_keys)]
        theta_prop = jax.tree_util.tree_unflatten(treedef, prop_leaves)
        lp_prop = log_ml(theta_prop, k_run) + log_prior(theta_prop)
        log_u = jnp.log(jax.random.uniform(k_acc, ()))
        accept = log_u < (lp_prop - lp)
        new_theta = jax.tree_util.tree_map(
            lambda p, t: jnp.where(accept, p, t), theta_prop, theta)
        new_lp = jnp.where(accept, lp_prop, lp)
        return (new_theta, new_lp), (new_theta, new_lp,
                                     accept.astype(jnp.float32))

    k_init, k_chain = jax.random.split(key)
    lp0 = log_ml(theta0, k_init) + log_prior(theta0)
    keys = jax.random.split(k_chain, num_iterations)
    _, (thetas, lps, accepts) = jax.lax.scan(mh_step, (theta0, lp0),
                                             keys)
    return thetas, lps, jnp.mean(accepts)
