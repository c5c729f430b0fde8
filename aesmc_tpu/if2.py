"""IF2 iterated filtering: maximum likelihood for state-space models.

IF2 (Ionides, Nguyen, Atchade, Stoev & King, PNAS 2015) computes the
maximum-likelihood parameter estimate using only the ability to RUN a
particle filter - no likelihood gradients, no closed-form transition
density beyond what filtering already needs. Each particle carries its
own parameter vector; parameters take small random-walk perturbations
at every timestep and are resampled jointly with the states, so good
parameter regions accumulate particles; iterating the filter with a
geometrically cooled perturbation scale concentrates the swarm at the
MLE (theory: the iterated Bayes maps converge to a point mass at the
maximum).

This completes the parameter-inference toolkit around the engine:
Bayesian posteriors via `csmc.pmmh` (batch MCMC), `smc2` (online), and
`csmc.particle_gibbs`; gradient-based point estimation via
`train`/`losses` (pathwise) and `smoothing.paris_score` (Fisher
identity); IF2 adds DERIVATIVE-FREE maximum likelihood - the standard
tool (pomp's `mif2`) for mechanistic models whose simulators are not
differentiable. The reference package has only gradient-based point
estimation (/root/reference/aesmc/train.py:22-41).

TPU shape: one `lax.scan` over iterations around one `lax.scan` over
time - the whole M-iteration fit is a single XLA program. Parameters
live as `[B, K]` leaves broadcast straight into the component math
(no per-particle Python, no vmap-over-theta): batch rows fit B
INDEPENDENT datasets simultaneously for free. Joint (state, theta)
resampling rides the shared resampler; states gather through the same
fused Pallas kernels as the engine.
"""

from __future__ import annotations

import math as _stdmath
from typing import Callable

import jax
import jax.numpy as jnp

from . import resampling, state
from .inference import ObservationSequence, TimeIndex, stack_observations

__all__ = ["if2"]


def _tree_gather(tree, idx):
    """Gather `[B, K, ...]` leaves along the particle axis."""
    def leaf(x):
        expanded = idx.reshape(idx.shape + (1,) * (x.ndim - 2))
        return jnp.take_along_axis(x, expanded, axis=1)
    return jax.tree_util.tree_map(leaf, tree)


def if2(observations,
        build_components: Callable,
        theta0,
        rw_scale,
        num_particles: int,
        num_iterations: int,
        key=None,
        cooling: float = 0.9,
        initial_perturbation: float = 2.0,
        resampling_method: str = "systematic",
        resampling_implementation="auto",
        scan_unroll: int = 1) -> dict:
    """Iterated filtering (IF2) maximum-likelihood estimation.

    Args:
        observations: list of `[B, ...]` steps or stacked `[T, B, ...]`
            pytree. Batch rows are INDEPENDENT datasets, each fitted by
            its own particle swarm (B simultaneous ML fits).
        build_components: traceable
            `theta -> (initial, transition, emission, proposal)` where
            `theta` is a pytree whose leaves arrive shaped `[B, K]` -
            per-particle parameters. Components must broadcast those
            leaves against `[B, K]` latents (the library's struct
            models do: e.g. `lgssm.Transition(mult=theta, scale=s)`).
            The proposal is used as-is (pass a bootstrap proposal for
            classic IF2).
        theta0: parameter pytree of scalars (or `[B]`/`[B, K]` arrays) -
            the starting center of the swarm.
        rw_scale: pytree matching `theta0`: per-parameter random-walk
            standard deviation at cooling 1. Parameters needing
            positivity (scales) should be parameterized on log scale
            inside `build_components`.
        num_particles: swarm size K.
        num_iterations: M filtering passes; the perturbation scale of
            pass m is `cooling**m`.
        cooling: geometric cooling factor per iteration (pomp's
            `cooling.fraction.50 = cooling**50`).
        initial_perturbation: multiplier on the t=0 re-dispersal of the
            swarm at the start of every iteration (pomp's `ivp`-style
            extra spread; also what seeds iteration 0 from `theta0`).
        resampling_method/implementation: joint (state, theta)
            resampler, as in the engine.

    Returns:
        dict with `theta` (final swarm pytree, `[B, K]` leaves),
        `theta_mean` (swarm mean pytree, `[B]` leaves),
        `theta_trajectory` (`[M, B]` leaves - per-iteration swarm
        means, the standard IF2 convergence diagnostic),
        `log_likelihoods` (`[M, B]` per-iteration log-Z of the
        PERTURBED filter - rises toward, and at cooling -> 0 equals,
        the model log-likelihood at the MLE).
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    stacked_obs = stack_observations(observations)
    obs_seq = ObservationSequence(stacked_obs)
    num_timesteps = len(obs_seq)
    batch_size = jax.tree_util.tree_leaves(stacked_obs)[0].shape[1]
    log_num_particles = _stdmath.log(num_particles)
    resolved_impl = resampling.resolve_implementation(
        (batch_size, num_particles), resampling_method,
        resampling_implementation)

    def _expand_theta(x):
        x = jnp.asarray(x, dtype=jnp.result_type(float))
        if x.ndim == 0:
            return jnp.broadcast_to(x, (batch_size, num_particles))
        if x.shape == (batch_size,):
            return jnp.broadcast_to(x[:, None],
                                    (batch_size, num_particles))
        if x.shape == (batch_size, num_particles):
            return x
        raise ValueError(
            "theta0 leaves must be scalar, [batch], or "
            f"[batch, particles]; got shape {x.shape}")

    theta0 = jax.tree_util.tree_map(_expand_theta, theta0)
    rw_scale = jax.tree_util.tree_map(
        lambda s: jnp.asarray(s, dtype=jnp.result_type(float)), rw_scale)
    leaves, treedef = jax.tree_util.tree_flatten(theta0)
    num_leaves = len(leaves)

    def perturb(theta, sigma, key_t):
        keys = jax.random.split(key_t, num_leaves)
        keys = jax.tree_util.tree_unflatten(treedef, list(keys))
        return jax.tree_util.tree_map(
            lambda th, s, k: th + sigma * s * jax.random.normal(
                k, th.shape, dtype=th.dtype),
            theta, rw_scale, keys)

    # Key layout: per iteration, per timestep: (resample, propose,
    # perturb).
    all_keys = jax.random.split(key, (num_iterations, num_timesteps, 3))

    def one_iteration(theta_swarm, inputs):
        iter_keys, sigma = inputs

        # Re-disperse the swarm at t=0 (seeds iteration 0 from theta0).
        theta_0 = perturb(theta_swarm, sigma * initial_perturbation,
                          iter_keys[0, 2])
        initial, transition, emission, proposal = build_components(
            theta_0)
        proposal_dist = proposal(time=0, observations=obs_seq)
        latent_0 = state.sample(proposal_dist, batch_size,
                                num_particles, iter_keys[0, 1])
        log_weight_0 = (
            state.log_prob(initial(), latent_0) +
            state.log_prob(
                emission(latents=[latent_0], time=0),
                state.expand_observation(obs_seq[0], num_particles)) -
            state.log_prob(proposal_dist, latent_0))

        def step(carry, inputs_t):
            prev_latent, theta, prev_log_weight = carry
            obs_t, obs_prev, t, keys_t = inputs_t
            time = TimeIndex(t)

            idx = resampling.sample_ancestral_index(
                prev_log_weight, keys_t[0], method=resampling_method,
                implementation=resolved_impl)
            prev_latent = state.resample(prev_latent, idx)
            theta = _tree_gather(theta, idx)
            theta = perturb(theta, sigma, keys_t[2])

            initial_, transition_, emission_, proposal_ = \
                build_components(theta)
            proposal_dist = proposal_(
                previous_latents=[prev_latent], time=time,
                observations=obs_seq)
            latent_t = state.sample(proposal_dist, batch_size,
                                    num_particles, keys_t[1])
            log_weight_t = (
                state.log_prob(
                    transition_(previous_latents=[prev_latent],
                                time=time,
                                previous_observations=[obs_prev]),
                    latent_t) +
                state.log_prob(
                    emission_(latents=[latent_t], time=time,
                              previous_observations=[obs_prev]),
                    state.expand_observation(obs_t, num_particles)) -
                state.log_prob(proposal_dist, latent_t))
            contribution = (
                jax.nn.logsumexp(prev_log_weight, axis=1) -
                log_num_particles)
            return (latent_t, theta, log_weight_t), contribution

        if num_timesteps > 1:
            rest_obs = jax.tree_util.tree_map(lambda x: x[1:],
                                              stacked_obs)
            prev_obs = jax.tree_util.tree_map(lambda x: x[:-1],
                                              stacked_obs)
            times = jnp.arange(1, num_timesteps, dtype=jnp.int32)
            (last_latent, theta_end, last_log_weight), contributions = \
                jax.lax.scan(step, (latent_0, theta_0, log_weight_0),
                             (rest_obs, prev_obs, times, iter_keys[1:]),
                             unroll=scan_unroll)
            total = jnp.sum(contributions, axis=0)
        else:
            theta_end, last_log_weight = theta_0, log_weight_0
            total = jnp.zeros((batch_size,), dtype=log_weight_0.dtype)

        log_z = (total + jax.nn.logsumexp(last_log_weight, axis=1) -
                 log_num_particles)
        # Weight-average the final swarm before the next iteration so
        # the last observation's information survives the handoff.
        final_idx = resampling.sample_ancestral_index(
            last_log_weight, iter_keys[0, 0],
            method=resampling_method, implementation=resolved_impl)
        theta_end = _tree_gather(theta_end, final_idx)
        theta_mean = jax.tree_util.tree_map(
            lambda th: jnp.mean(th, axis=1), theta_end)
        return theta_end, (theta_mean, log_z)

    sigmas = cooling ** jnp.arange(num_iterations,
                                   dtype=jnp.result_type(float))
    theta_final, (theta_traj, log_liks) = jax.lax.scan(
        one_iteration, theta0, (all_keys, sigmas))

    return {
        "theta": theta_final,
        "theta_mean": jax.tree_util.tree_map(
            lambda th: jnp.mean(th, axis=1), theta_final),
        "theta_trajectory": theta_traj,
        "log_likelihoods": log_liks,
    }
