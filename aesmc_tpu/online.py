"""Online (streaming) particle filtering for serving and live inference.

The batch engine (`aesmc_tpu.inference.infer`) consumes a whole
observation sequence at once inside one `lax.scan` - the right shape for
training and offline smoothing. Production serving is the opposite
access pattern: observations arrive ONE AT A TIME and each must update
the posterior with bounded latency and O(1) memory. This module provides
that as a pair of jittable pure functions:

    init_fn, step_fn = make_online_filter(initial, transition, emission,
                                          proposal, num_particles, ...)
    filter_state = init_fn(y_0, key_0)
    for y_t arriving:
        filter_state, info = step_fn(filter_state, y_t, key_t)

`step_fn` is a fixed-shape pure function: jit it ONCE and every arriving
observation costs one device dispatch - no retracing, no growing arrays.
The carry is a flat pytree (`OnlineFilterState`), so it checkpoints,
shards (`jax.device_put` with a NamedSharding), and donates
(`jax.jit(..., donate_argnums=0)`) like any other JAX state.

Semantics contract: feeding T observations through `init_fn` +
`step_fn` reproduces `infer('smc', ...)` exactly - same resampling
branch structure, same estimator arithmetic, and (given the same
per-step key pairs, see `split_step_keys`) BIT-IDENTICAL ancestor
indices; log-weights/particles/log-Z agree to f32 fusion rounding
(~1 ulp - XLA fuses the batch engine's scan body differently from the
standalone step program, e.g. FMA formation). `tests/test_online.py`
enforces this for every resampling method, the ESS-adaptive criterion,
and the auxiliary-PF lookahead.

No reference counterpart: /root/reference/aesmc/inference.py:8-193 only
offers the whole-sequence loop; its Python-list state could not be
stepped externally without re-entering the library. Beyond-parity
capability, SURVEY.md S5 "production deployment and serving" angle.

Causality note: components receive `observations` as a causal view that
returns the CURRENT observation for any time index (streaming mode
cannot look ahead, and past observations beyond y_{t-1} are not
buffered). Models that only read `observations[time]` (every reference
model, e.g. /root/reference/test/models/lgssm.py:54-72) behave
identically; models indexing other offsets need `previous_observations`
([-1] = y_{t-1}, as in the batch engine) or are not stream-capable.
"""

from __future__ import annotations

import math as _stdmath
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from . import resampling, state
from .inference import TimeIndex

__all__ = [
    "OnlineFilterState", "make_online_filter", "log_marginal_likelihood",
    "effective_sample_size", "split_step_keys", "batched_steps",
    "export_step", "load_step",
]


class OnlineFilterState(NamedTuple):
    """Carry of the streaming filter - a flat pytree.

    Attributes:
        latent: particle pytree, leaves `[batch, num_particles, ...]`.
        log_weight: `[batch, num_particles]` current unnormalized
            log-weights.
        log_z_contrib: `[batch]` accumulated resampling contributions to
            the log-Z estimator (the `sum(contributions)` term of the
            batch engine's estimator; see `log_marginal_likelihood`).
        prev_observation: the last consumed observation `[batch, ...]`
            pytree (what components see as `previous_observations[-1]`).
        t: int32 scalar - number of observations consumed so far.
        eve: `[batch, num_particles]` int32 time-0 root-ancestor labels,
            or None - carried when `track_genealogy=True` (feeds the
            running Lee-Whiteley variance estimate; `aesmc_tpu.variance`).
        num_events: `[batch]` int32 resampling-event counts, or None.
        lag_buffer: `[L, batch, num_particles, ...]` pytree of the last
            L latents, continuously regathered through each step's
            ancestors, or None - carried when `fixed_lag=L > 0`.
        tau: `[batch, num_particles(, D)]` per-particle PaRIS running
            statistics, or None - carried when `paris_h` is set
            (streaming smoothed additive functionals; see
            `aesmc_tpu.smoothing.paris`).
    """

    latent: Any
    log_weight: jnp.ndarray
    log_z_contrib: jnp.ndarray
    prev_observation: Any
    t: jnp.ndarray
    eve: Any = None
    num_events: Any = None
    lag_buffer: Any = None
    tau: Any = None


def log_marginal_likelihood(filter_state: OnlineFilterState) -> jnp.ndarray:
    """Running log-Z estimate `[batch]` after the observations consumed
    so far: `sum(contributions) + logsumexp(log_weight) - log K` -
    identical to the batch engine's estimator at the same step
    (inference.py, smc estimator block)."""
    num_particles = filter_state.log_weight.shape[-1]
    return (filter_state.log_z_contrib +
            jax.nn.logsumexp(filter_state.log_weight, axis=-1) -
            _stdmath.log(num_particles))


def effective_sample_size(filter_state: OnlineFilterState) -> jnp.ndarray:
    """Kish ESS `[batch]` of the current weights (1 .. num_particles)."""
    lw = filter_state.log_weight
    return jnp.exp(2 * jax.nn.logsumexp(lw, axis=-1) -
                   jax.nn.logsumexp(2 * lw, axis=-1))


def split_step_keys(key, num_timesteps: int, num_streams: int = 2):
    """The batch engine's per-step key layout: `[T, 2]` keys where row t
    holds (resampling key, proposal key) for step t. Feed row 0 to
    `init_fn` and row t to the t-th `step_fn` call to reproduce
    `infer(key=key)` bit-for-bit. With `num_streams=3` the layout is
    `smoothing.paris`'s (resampling, proposal, backward-draw) rows -
    feed those to a `paris_h`-enabled filter to reproduce the offline
    `paris(key=key)` run."""
    return jax.random.split(key, (num_timesteps, num_streams))


class _CausalObservations:
    """Streaming stand-in for `ObservationSequence`: `obs[t]` returns the
    current observation for ANY index (the only time visible online)."""

    __slots__ = ("current",)

    def __init__(self, current):
        self.current = current

    def __getitem__(self, t):
        return self.current

    def __len__(self):
        raise TypeError(
            "online filtering has no sequence length; components must "
            "not call len(observations) in streaming mode")


def _key_split(key, n: int):
    """Accepts a single PRNG key (split into n streams) or an explicit
    row of n keys - row t of `split_step_keys(..., num_streams=n)` -
    for bit-parity with the batch engine (n=2) or with the offline
    `smoothing.paris` key layout (n=3). Handles typed keys (shape () /
    (n,)) and legacy uint32 keys (shape (2,) / (n, 2))."""
    key = jnp.asarray(key)
    typed = jnp.issubdtype(key.dtype, jax.dtypes.prng_key)
    if (typed and key.shape == (n,)) or (not typed and key.shape == (n, 2)):
        return tuple(key[i] for i in range(n))
    if (typed and key.ndim == 1) or (not typed and key.ndim == 2):
        raise ValueError(
            f"expected a single PRNG key or a row of {n} keys "
            f"(split_step_keys(..., num_streams={n})); got shape "
            f"{key.shape}")
    ks = jax.random.split(key, n)
    return tuple(ks[i] for i in range(n))


def _key_pair(key):
    return _key_split(key, 2)


def make_online_filter(initial,
                       transition,
                       emission,
                       proposal,
                       num_particles: int,
                       lookahead=None,
                       resampling_method: str = "systematic",
                       resampling_implementation="auto",
                       resampling_criterion="always",
                       soft_resampling_alpha: float = 0.5,
                       ot_epsilon: float = 0.5,
                       ot_num_iterations: int = 20,
                       ot_block_size=None,
                       ot_rank=None,
                       return_ancestors: bool = False,
                       track_genealogy: bool = False,
                       fixed_lag: int = 0,
                       paris_h=None,
                       paris_h0=None,
                       paris_num_draws: int = 2,
                       paris_backward: str = "pairwise",
                       paris_pairwise: str = "auto",
                       paris_transition_log_bound=None,
                       paris_max_rejection_rounds: int = 64,
                       paris_max_exact_lanes=None,
                       mesh=None,
                       data_axis: str = "data",
                       particle_axis: str = "particle"):
    """Builds `(init_fn, step_fn)` for streaming SMC.

    All knobs mirror `infer` (same names, same semantics, same validation;
    smc only - IS has no streaming posterior). Components are closed over:
    rebuild the filter (cheap - it is just closure creation) to serve
    updated parameters.

    Args:
        initial, transition, emission, proposal: the standard component
            callables (module docstring of `aesmc_tpu.inference`).
        num_particles: particles per batch row.
        lookahead: optional auxiliary-PF score callable, as in `infer`.
        resampling_method: 'systematic' | 'stratified' | 'multinomial' |
            'residual' | 'soft' | 'ot'.
        resampling_implementation: 'auto' | 'xla' | 'pallas' | callable
            (e.g. a distributed shard_map resampler).
        resampling_criterion: 'always' or an ESS fraction in (0, 1].
        return_ancestors: include the `[batch, K]` ancestor indices of
            each step in the info dict (off by default - serving rarely
            needs lineage, and the fused kernel then skips computing
            them).
        track_genealogy: carry time-0 root-ancestor (eve) labels and
            resampling-event counts through the state, and emit a
            running single-run Lee-Whiteley estimate of the relative
            variance of the log-Z estimate as `info['log_z_rel_var']`
            (`aesmc_tpu.variance.log_z_variance` semantics - a live
            filter-health metric for serving). Discrete and soft
            methods only (OT has no ancestors).
        fixed_lag: L > 0 carries an L-deep latent buffer regathered
            through each step's ancestors; after consuming y_t the step
            emits `info['lagged_latent']` - the particle approximation
            of the FIXED-LAG smoothing distribution p(x_{t-L} | y_{0:t})
            under the current weights (the standard streaming smoother:
            L-step-delayed estimates that condition on L future
            observations, without PaRIS's O(K^2) transition-density
            work). `info['lag_time'] = t - L` is the time the emission
            refers to; entries with lag_time < 0 are padding (copies of
            x_0). Discrete and soft methods only.
        paris_h / paris_h0: enable STREAMING PaRIS (Olsson-Westerborn;
            `aesmc_tpu.smoothing.paris` semantics): the carry gains
            per-particle running statistics `tau` of the additive
            functional S = h0(x_0) + sum h(x_{t-1}, x_t, t), updated
            each step by `paris_num_draws` backward-kernel draws, and
            the step emits `info['paris_smoothed']` - the CURRENT
            smoothed estimate E[S | y_{0:t}] with O(1) memory in t.
            This is online EM / online score estimation in serving
            form. `paris_backward='rejection'` (with the same
            bound/rounds/lanes knobs as offline, `paris_*`-prefixed)
            avoids the O(K^2) pairwise tile at large K and adds
            `info['paris_accept_rate']` / `info['paris_unconverged']`.
            For exact agreement with the offline `paris(key=k)` run,
            feed rows of `split_step_keys(k, T, num_streams=3)`
            (resample, propose, backward) and keep the default
            always-resample criterion.
        mesh / data_axis / particle_axis: optional GSPMD sharding
            constraints on the carried latent and weights, as in `infer`.

    Returns:
        (init_fn, step_fn):
        `init_fn(observation, key) -> OnlineFilterState` consumes y_0
        (`[batch, ...]` pytree).
        `step_fn(filter_state, observation, key) -> (OnlineFilterState,
        info)` consumes one subsequent observation; `info` holds
        'log_pred' (`[batch]` incremental log p(y_t | y_{1:t-1}), the
        natural serving-side anomaly score), 'ess' (`[batch]` ESS of the
        PRE-step weights), 'resampled' (`[batch]` bool - whether the row
        resampled this step), and 'ancestral_index' when requested.
        For bit-parity with `infer(key=k)`, pass row t of
        `split_step_keys(k, T)` as the key of the t-th call.
    """
    if resampling_method == "soft" and resampling_criterion != "always":
        raise ValueError(
            "soft resampling does not combine with ESS-adaptive "
            "criteria (resample-or-not is already softened)")
    if lookahead is not None and resampling_method in ("soft", "ot"):
        raise ValueError(
            "lookahead does not combine with differentiable "
            f"resampling_method={resampling_method!r}; use a "
            "discrete method (systematic/stratified/multinomial)")
    if resampling_method == "ot":
        if resampling_criterion != "always":
            raise ValueError(
                "resampling_method='ot' does not combine with "
                "ESS-adaptive criteria")
        if return_ancestors:
            raise ValueError(
                "resampling_method='ot' transports particles (no "
                "discrete ancestors): ancestor indices are unavailable")
        if track_genealogy:
            raise ValueError(
                "resampling_method='ot' transports particles (no "
                "discrete ancestors): genealogy tracking is unavailable")
        if fixed_lag:
            raise ValueError(
                "resampling_method='ot' transports particles (no "
                "discrete ancestors): fixed-lag smoothing is "
                "unavailable")
    if fixed_lag < 0:
        raise ValueError(f"fixed_lag must be >= 0. currently = {fixed_lag}")
    if paris_h0 is not None and paris_h is None:
        raise ValueError("paris_h0 requires paris_h")
    if paris_h is not None:
        if paris_num_draws < 1:
            raise ValueError("paris_num_draws must be >= 1. currently = "
                             f"{paris_num_draws}")
        if paris_backward not in ("pairwise", "rejection"):
            raise ValueError("paris_backward must be 'pairwise' or "
                             f"'rejection'. currently = {paris_backward}")
        if paris_pairwise not in ("auto", "broadcast", "vmap"):
            raise ValueError("paris_pairwise must be 'auto', 'broadcast' "
                             f"or 'vmap'. currently = {paris_pairwise}")
    # Lazy import (smoothing pulls in tmc; only needed with paris_h).
    from . import smoothing as _smoothing
    _paris_mode_cell = [paris_pairwise]
    adaptive = resampling_criterion != "always"
    need_indices = return_ancestors or track_genealogy or fixed_lag > 0
    if adaptive:
        ess_threshold = float(resampling_criterion) * num_particles
    log_num_particles = _stdmath.log(num_particles)

    from .sharding_utils import make_cloud_constrainer
    _constrain = make_cloud_constrainer(mesh, data_axis, particle_axis)

    def init_fn(observation, key):
        """Consumes y_0; mirrors the batch engine's hoisted t=0 step
        (time is the Python int 0, so reference-style `if time == 0:`
        branches resolve statically)."""
        observation = jax.tree_util.tree_map(jnp.asarray, observation)
        batch_size = jax.tree_util.tree_leaves(observation)[0].shape[0]
        propose_key = (_key_split(key, 3)[1] if paris_h is not None
                       else _key_pair(key)[1])
        obs_view = _CausalObservations(observation)
        proposal_dist = proposal(time=0, observations=obs_view)
        latent_0 = _constrain(state.sample(proposal_dist, batch_size,
                                           num_particles, propose_key))
        proposal_lp = state.log_prob(proposal_dist, latent_0)
        initial_lp = state.log_prob(initial(), latent_0)
        emission_lp = state.log_prob(
            emission(latents=[latent_0], time=0),
            state.expand_observation(observation, num_particles))
        log_weight_0 = _constrain(initial_lp + emission_lp - proposal_lp)
        if track_genealogy:
            eve = jnp.broadcast_to(
                jnp.arange(num_particles, dtype=jnp.int32),
                (batch_size, num_particles))
            num_events = jnp.zeros((batch_size,), jnp.int32)
        else:
            eve = num_events = None
        lag_buffer = (jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x[None], (fixed_lag,) + x.shape),
            latent_0) if fixed_lag > 0 else None)
        if paris_h is not None:
            # copy=True: h0 like `lambda x0: x0` would otherwise make
            # tau ALIAS the latent buffer, and a donated carry
            # (jit(step_fn, donate_argnums=0)) then donates the same
            # buffer twice - a runtime error.
            tau = (jnp.array(paris_h0(latent_0), copy=True)
                   if paris_h0 is not None
                   else jnp.zeros((batch_size, num_particles),
                                  log_weight_0.dtype))
        else:
            tau = None
        return OnlineFilterState(
            latent=latent_0,
            log_weight=log_weight_0,
            log_z_contrib=jnp.zeros((batch_size,), log_weight_0.dtype),
            prev_observation=observation,
            t=jnp.asarray(1, jnp.int32),
            eve=eve,
            num_events=num_events,
            lag_buffer=lag_buffer,
            tau=tau)

    def step_fn(filter_state, observation, key):
        """Consumes one observation y_t (t >= 1); one filter update."""
        observation = jax.tree_util.tree_map(jnp.asarray, observation)
        prev_latent = filter_state.latent
        prev_log_weight = filter_state.log_weight
        batch_size, _ = prev_log_weight.shape
        if paris_h is not None:
            resample_key, propose_key, backward_key = _key_split(key, 3)
        else:
            resample_key, propose_key = _key_pair(key)
        time = TimeIndex(filter_state.t)
        obs_view = _CausalObservations(observation)
        prev_obs_list = [filter_state.prev_observation]
        resolved_impl = resampling.resolve_implementation(
            (batch_size, num_particles), resampling_method,
            resampling_implementation)
        log_pred_base = log_marginal_likelihood(filter_state)
        pre_ess = effective_sample_size(filter_state)
        ancestral_index = None

        if resampling_method == "ot":
            from . import ot as _ot

            if callable(resolved_impl) and getattr(resolved_impl, "ot",
                                                   False):
                previous_latent, _ = resolved_impl(prev_log_weight,
                                                   prev_latent)
            elif ot_rank is not None:
                previous_latent, _ = _ot.lowrank_ot_resample(
                    prev_log_weight, prev_latent, rank=ot_rank,
                    num_iterations=ot_num_iterations, key=resample_key)
            else:
                previous_latent, _ = _ot.ot_resample(
                    prev_log_weight, prev_latent, epsilon=ot_epsilon,
                    num_iterations=ot_num_iterations,
                    block_size=ot_block_size)
            contribution = (jax.nn.logsumexp(prev_log_weight, axis=1) -
                            log_num_particles)
            base = jnp.zeros_like(prev_log_weight)
            did_resample = jnp.ones((batch_size,), bool)
        elif resampling_method == "soft":
            ancestral_index, corrected, previous_latent = \
                resampling.soft_resample_and_gather(
                    prev_log_weight, resample_key, prev_latent,
                    alpha=soft_resampling_alpha,
                    implementation=resolved_impl,
                    need_indices=need_indices)
            contribution = (jax.nn.logsumexp(prev_log_weight, axis=1) -
                            log_num_particles)
            base = corrected
            did_resample = jnp.ones((batch_size,), bool)
        elif not adaptive:
            if lookahead is not None:
                log_nu = jnp.asarray(lookahead(
                    previous_latents=[prev_latent], time=time,
                    observations=obs_view))
                first_stage = prev_log_weight + log_nu
                ancestral_index, (previous_latent, nu_a) = \
                    resampling.sample_ancestral_index_and_resample(
                        first_stage, resample_key, (prev_latent, log_nu),
                        method=resampling_method,
                        implementation=resolved_impl,
                        need_indices=need_indices)
                base = (jax.nn.logsumexp(first_stage, axis=1,
                                         keepdims=True) -
                        jax.nn.logsumexp(prev_log_weight, axis=1,
                                         keepdims=True) - nu_a)
            else:
                ancestral_index, previous_latent = \
                    resampling.sample_ancestral_index_and_resample(
                        prev_log_weight, resample_key, prev_latent,
                        method=resampling_method,
                        implementation=resolved_impl,
                        need_indices=need_indices)
                base = jnp.zeros_like(prev_log_weight)
            contribution = (jax.nn.logsumexp(prev_log_weight, axis=1) -
                            log_num_particles)
            did_resample = jnp.ones((batch_size,), bool)
        else:
            # ESS-adaptive: per-row decision, identical arithmetic to
            # the batch engine's adaptive branch (inference.py).
            if lookahead is not None:
                log_nu = jnp.asarray(lookahead(
                    previous_latents=[prev_latent], time=time,
                    observations=obs_view))
                first_stage = prev_log_weight + log_nu
                sampled, (resampled, nu_a) = \
                    resampling.sample_ancestral_index_and_resample(
                        first_stage, resample_key, (prev_latent, log_nu),
                        method=resampling_method,
                        implementation=resolved_impl,
                        need_indices=need_indices)
                resampled_base = (
                    jax.nn.logsumexp(first_stage, axis=1,
                                     keepdims=True) -
                    jax.nn.logsumexp(prev_log_weight, axis=1,
                                     keepdims=True) - nu_a)
            else:
                sampled, resampled = \
                    resampling.sample_ancestral_index_and_resample(
                        prev_log_weight, resample_key, prev_latent,
                        method=resampling_method,
                        implementation=resolved_impl,
                        need_indices=need_indices)
                resampled_base = jnp.zeros_like(prev_log_weight)
            do = pre_ess < ess_threshold                        # [B]
            if sampled is not None:
                identity = jnp.broadcast_to(
                    jnp.arange(num_particles, dtype=sampled.dtype),
                    sampled.shape)
                ancestral_index = jnp.where(do[:, None], sampled, identity)
            contribution = jnp.where(
                do,
                jax.nn.logsumexp(prev_log_weight, axis=1) -
                log_num_particles,
                jnp.zeros_like(pre_ess))
            base = jnp.where(do[:, None], resampled_base, prev_log_weight)

            def select(res, orig):
                res = jnp.asarray(res)
                keep = do.reshape((-1,) + (1,) * (res.ndim - 1))
                return jnp.where(keep, res, jnp.asarray(orig))

            previous_latent = jax.tree_util.tree_map(
                select, resampled, prev_latent)
            did_resample = do

        proposal_dist = proposal(previous_latents=[previous_latent],
                                 time=time, observations=obs_view)
        latent_t = _constrain(state.sample(proposal_dist, batch_size,
                                           num_particles, propose_key))
        proposal_lp = state.log_prob(proposal_dist, latent_t)
        transition_lp = state.log_prob(
            transition(previous_latents=[previous_latent], time=time,
                       previous_observations=prev_obs_list),
            latent_t)
        emission_lp = state.log_prob(
            emission(latents=[latent_t], time=time,
                     previous_observations=prev_obs_list),
            state.expand_observation(observation, num_particles))
        # Same association order as the batch engine (`base + increment`)
        # so parity is bit-exact in f32, not merely close.
        increment = transition_lp + emission_lp - proposal_lp
        log_weight_t = _constrain(base + increment)

        if track_genealogy:
            eve = jnp.take_along_axis(filter_state.eve, ancestral_index,
                                      axis=1)
            num_events = (filter_state.num_events +
                          did_resample.astype(jnp.int32))
        else:
            eve = num_events = None

        if paris_h is not None:
            if _paris_mode_cell[0] == "auto":
                # Trace-time resolve; safe here (no checkpoint'd scan
                # body around step_fn itself).
                _paris_mode_cell[0] = _smoothing._resolve_pairwise_mode(
                    transition, prev_latent,
                    filter_state.prev_observation)
            # PaRIS statistic update over PRE-resampling parents (the
            # backward kernel reads prev weights/particles, independent
            # of how the filter advanced).
            tau, paris_acc, paris_unconv = \
                _smoothing._paris_backward_update(
                    backward_key, prev_latent, prev_log_weight, latent_t,
                    filter_state.tau, transition, time, prev_obs_list,
                    paris_h, paris_num_draws, paris_backward,
                    _paris_mode_cell[0], paris_transition_log_bound,
                    paris_max_rejection_rounds, paris_max_exact_lanes)
        else:
            tau = None

        if fixed_lag > 0:
            # Regather the whole buffer with this step's ancestors (the
            # repeated regather composes ancestry, so buffer[0] is
            # x_{t-L} traced through to the current particle set), emit
            # the oldest entry, shift in x_t.
            def regather(x):
                idx = ancestral_index.reshape(
                    (1,) + ancestral_index.shape +
                    (1,) * (x.ndim - 3))
                return jnp.take_along_axis(x, idx, axis=2)

            gathered = jax.tree_util.tree_map(regather,
                                              filter_state.lag_buffer)
            lagged_latent = jax.tree_util.tree_map(lambda x: x[0],
                                                   gathered)
            lag_buffer = jax.tree_util.tree_map(
                lambda g, n: jnp.concatenate([g[1:], n[None]], axis=0),
                gathered, latent_t)
        else:
            lag_buffer = None

        new_state = OnlineFilterState(
            latent=latent_t,
            log_weight=log_weight_t,
            log_z_contrib=filter_state.log_z_contrib + contribution,
            prev_observation=observation,
            t=filter_state.t + 1,
            eve=eve,
            num_events=num_events,
            lag_buffer=lag_buffer,
            tau=tau)
        info = {
            "log_pred": log_marginal_likelihood(new_state) - log_pred_base,
            "ess": pre_ess,
            "resampled": did_resample,
        }
        if paris_h is not None:
            w = jax.nn.softmax(log_weight_t, axis=1)
            info["paris_smoothed"] = jnp.einsum("bk,bk...->b...", w, tau)
            if paris_backward == "rejection":
                info["paris_accept_rate"] = paris_acc
                info["paris_unconverged"] = paris_unconv
        if fixed_lag > 0:
            info["lagged_latent"] = lagged_latent
            info["lag_time"] = filter_state.t - fixed_lag
        if track_genealogy:
            from . import variance as _variance
            s = _variance._family_weight_sums(log_weight_t, eve)
            cross = 1.0 - jnp.sum(s * s, axis=-1)
            factor = (num_particles / (num_particles - 1.0)) ** (
                num_events.astype(log_weight_t.dtype) + 1.0)
            info["log_z_rel_var"] = jnp.maximum(1.0 - factor * cross, 0.0)
        if return_ancestors:
            info["ancestral_index"] = ancestral_index
        return new_state, info

    return init_fn, step_fn


def batched_steps(step_fn, scan_unroll: int = 1):
    """Micro-batched serving: S buffered observations in ONE dispatch.

    Wraps a `step_fn` from `make_online_filter` into
    `batched(filter_state, observations, keys) -> (filter_state,
    infos)` where `observations` is an `[S, batch, ...]` pytree and
    `keys` is `[S]` step keys (e.g. rows of `split_step_keys`); the S
    updates run inside one `lax.scan`, so a deployment whose latency
    floor is the per-dispatch RPC (e.g. a tunneled accelerator: ~28 ms
    relay vs ~0.25 ms of device compute at the headline shape - the
    measured 94% dispatch overhead, BENCH_NOTES "serving") amortizes
    that floor over S observations at the cost of S-observation
    batching delay. `infos` carries every per-step info with a leading
    `[S]` axis, so anomaly scores (`log_pred`) remain per-observation.

    Semantics: identical update arithmetic to S sequential `step_fn`
    calls (same keys -> same resampling branches and ancestors; values
    agree to XLA fusion rounding). Jit the result once per S;
    `donate_argnums=0` applies as usual.
    """
    def batched(filter_state, observations, keys):
        def body(st, inp):
            obs_t, k_t = inp
            st, info = step_fn(st, obs_t, k_t)
            return st, info
        return jax.lax.scan(body, filter_state, (observations, keys),
                            unroll=scan_unroll)
    return batched


def export_step(step_fn, filter_state, observation, key, platforms=None):
    """AOT-compiles and serializes a streaming step to a portable
    artifact (StableHLO via `jax.export`).

    The returned bytes embed the model: parameters are baked in as
    constants and the step's compute graph is self-contained, so the
    serving process needs NO model code - just
    `online.load_step(blob)` (or any StableHLO runtime) plus the
    deserialized carry. Shapes/dtypes are fixed to the example
    arguments, matching the fixed-shape serving contract.

    Args:
        step_fn: the step function from `make_online_filter`.
        filter_state, observation, key: example arguments fixing
            shapes/dtypes (e.g. the output of `init_fn` and the first
            inputs).
        platforms: optional list like `['tpu']` / `['cpu', 'tpu']` to
            target platforms other than the current default backend
            (cross-platform lowering).

    Returns:
        bytes - persist to disk/object storage; reload anywhere with
        `load_step`.
    """
    from jax import export as jexport
    _register_state_serialization(jexport)
    exported = jexport.export(jax.jit(step_fn), platforms=platforms)(
        filter_state, observation, key)
    return bytes(exported.serialize())


_SERIALIZATION_REGISTERED = False


def _register_state_serialization(jexport):
    """One-time pytree-serialization registration for the carry type."""
    global _SERIALIZATION_REGISTERED
    if not _SERIALIZATION_REGISTERED:
        jexport.register_namedtuple_serialization(
            OnlineFilterState,
            serialized_name="aesmc_tpu.online.OnlineFilterState")
        _SERIALIZATION_REGISTERED = True


def load_step(blob):
    """Deserializes `export_step` bytes into a callable
    `(filter_state, observation, key) -> (filter_state, info)` - the
    deployment-side entry point (no model code required)."""
    from jax import export as jexport
    _register_state_serialization(jexport)
    return jexport.deserialize(blob).call
