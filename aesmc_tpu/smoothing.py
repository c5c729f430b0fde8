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

Backward-draw modes, measured on v5e (BENCH_NOTES "pairwise vs
rejection PaRIS on TPU" + round-4 "large-K smoothing measured"):
`backward='pairwise'` (the [B, K, K] tile) rides the MXU and is 8-18x
FASTER than `backward='rejection'` on TPU wherever the tile fits in
HBM (K <= ~16k at B=2 f32) - rejection's `lax.while_loop` rounds
serialize on device. Above that wall the pairwise mode STREAMS the
exact categorical over parent chunks (Gumbel-max running argmax,
`_chunked_pairwise_backward_indices`): O(K * chunk) live memory,
still O(K^2) compute - measured 109/441/1753 ms/obs at K=32k/65k/131k
(the dense tile's O(K^2) rate, wall removed). Rejection's O(K) takes
over above K ~ 100k: 578 ms/obs at 65k (pairwise 441) but 1212 at
131k (pairwise 1753). So on TPU: pairwise through ~65k, rejection
beyond. The CPU picture is the opposite at every K measured
(rejection 6.4x faster already at K=2048).

FIXED TPU fault (round 3, fixed round 4): `backward='rejection'` at
K = 65,536 (T=25 B=2 N=2 LGSSM) crashed the TPU worker, reproduced
3x - the default binary-search `searchsorted` lowering (a log2(K)-step
while_loop) faults the device at >= 2^16 query lanes. The residual
exact-fallback draw now routes to the co-sorting `method='sort'`
lowering at >= 2^16 query lanes; K=65,536 and
131,072 measured healthy post-fix (BENCH_NOTES round-4 "large-K
smoothing measured").
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


def _auto_log_bound(transition, prev_latent, time, prev_obs_list):
    """Upper bound on log p(x' | x) over children AND parents.

    For location-family transitions (all the library's Gaussians) the
    density is maximized at its mean, so `log_prob(mean)` is the exact
    per-parent supremum over children; the max over parents bounds the
    whole backward-kernel row. Returns `[B]`.
    """
    dist = transition(previous_latents=[prev_latent], time=time,
                      previous_observations=prev_obs_list)
    try:
        mode = dist.mean
    except Exception as exc:
        raise TypeError(
            "backward='rejection' needs a transition density bound: the "
            f"auto bound reads `.mean` of the transition distribution "
            f"({type(dist).__name__} has none). Pass "
            "transition_log_bound=fn(prev_latent, time, "
            "previous_observations) -> [B].") from exc
    return jnp.max(state.log_prob(dist, mode), axis=1)


def _chunk_size(k: int, target: int = 4096) -> int:
    """Largest divisor of k <= target (k itself when only tiny divisors
    exist - a prime K just pays one dense pass)."""
    best = 1
    for d in range(1, target + 1):
        if k % d == 0:
            best = d
    return best if (best >= 256 or k <= target) else k


# Dense-tile ceiling for the pairwise backward: above this the exact
# categorical streams over parent chunks (`_chunked_pairwise_backward_
# indices`) instead of materializing the [B, K, K] logits tile. 2^31
# bytes = the largest tile measured healthy on v5e (K=16,384 at B=2
# f32; BENCH_NOTES "pairwise vs rejection PaRIS on TPU").
PAIRWISE_DENSE_MAX_BYTES = 1 << 31
# Live-block budget for the streamed path: the per-chunk Gumbel block
# [B, chunk, C, N] is sized to stay under this many bytes.
PAIRWISE_CHUNK_BYTES = 256 << 20


def _chunked_pairwise_backward_indices(key, prev_latent, prev_log_weight,
                                       children, transition, time,
                                       prev_obs_list, num_draws: int,
                                       resolved_pairwise: str,
                                       chunk_target=None):
    """EXACT backward-kernel categorical draws, streamed over parent
    chunks: Gumbel-max with a running (max, argmax) carried across
    chunks, so J ~ Categorical_j(w^j p(child | parent_j)) is drawn with
    O(K * chunk) live memory instead of the [B, K, C] tile - the
    pairwise mode's extension past its dense memory wall (K ~ 16k at
    B=2 on v5e). Compute stays O(K * C * N) per step: use
    backward='rejection' when that, not memory, is the binding cost.

    The Gumbel noise is keyed PER PARENT (`fold_in(key, j)` for global
    parent index j), so the draw is bit-invariant to the chunk size
    (same noise per (parent, child, draw) triple regardless of how
    parents are blocked; cross-chunk ties resolve to the lowest parent
    index, matching argmax) - pinned by `tests/test_paris.py`.

    Args:
        children: `[B, C(, D)]` pytree of child particles.
        num_draws: N independent draws per child.
        resolved_pairwise: 'broadcast' | 'vmap' (already resolved -
            never 'auto'; the probe must run outside any remat'd scan).
        chunk_target: override the auto chunk size (divisor of K).
    Returns:
        `[B, C, N]` int32 parent indices.
    """
    batch_size, c_children = _first_leaf(children).shape[:2]
    k = prev_log_weight.shape[1]
    n = num_draws
    if chunk_target is None:
        chunk_target = max(
            1, PAIRWISE_CHUNK_BYTES // (4 * batch_size * c_children * n))
    # Largest divisor of K <= target. NOT `_chunk_size`: its
    # small-divisor fallback returns K itself, which would silently
    # rebuild the full dense tile here (caught at K=131,072 where the
    # byte budget pushes the target below that fallback's floor).
    target = max(1, min(int(chunk_target), k))
    chunk = max(d for d in range(1, target + 1) if k % d == 0)
    n_chunks = k // chunk

    parents_x = jax.tree_util.tree_map(
        lambda x: jnp.moveaxis(
            x.reshape((batch_size, n_chunks, chunk) + x.shape[2:]), 1, 0),
        prev_latent)                         # [n_chunks, B, chunk, ...]
    logw_x = jnp.moveaxis(
        prev_log_weight.reshape(batch_size, n_chunks, chunk), 1, 0)
    children_new = _expand_new(children)     # [B, 1, C, ...]

    def chunk_log_prob(parents_c):           # -> [B, chunk, C]
        if resolved_pairwise == "broadcast":
            dist = transition(
                previous_latents=[_expand_prev(parents_c)], time=time,
                previous_observations=prev_obs_list)
            return _pairwise_log_prob(dist, children_new)
        def per_parent(parent):              # parent [B(, D)]
            parent1 = jax.tree_util.tree_map(lambda x: x[:, None], parent)
            dist = transition(previous_latents=[parent1], time=time,
                              previous_observations=prev_obs_list)
            return state.log_prob(dist, children)             # [B, C]
        return jax.vmap(per_parent, in_axes=1, out_axes=1)(parents_c)

    def body(carry, inputs):
        best, best_idx = carry               # [B, C, N]
        chunk_i, parents_c, logw_c = inputs
        lp = chunk_log_prob(parents_c)
        global_j = chunk_i * chunk + jnp.arange(chunk, dtype=jnp.int32)
        keys_j = jax.vmap(lambda j: jax.random.fold_in(key, j))(global_j)
        g = jnp.moveaxis(
            jax.vmap(lambda kk: jax.random.gumbel(
                kk, (batch_size, c_children, n),
                dtype=best.dtype))(keys_j),
            0, 1)                            # [B, chunk, C, N]
        score = lp[..., None] + logw_c[:, :, None, None] + g
        m = jnp.max(score, axis=1)                            # [B, C, N]
        am = (chunk_i * chunk +
              jnp.argmax(score, axis=1).astype(jnp.int32))    # [B, C, N]
        take = m > best
        return (jnp.where(take, m, best),
                jnp.where(take, am, best_idx)), None

    best0 = jnp.full((batch_size, c_children, n), -jnp.inf,
                     dtype=prev_log_weight.dtype)
    idx0 = jnp.zeros((batch_size, c_children, n), dtype=jnp.int32)
    (_, idx), _ = jax.lax.scan(
        body, (best0, idx0),
        (jnp.arange(n_chunks, dtype=jnp.int32), parents_x, logw_x))
    return idx


def _exact_backward_draw(key, prev_latent, prev_log_weight,
                         children_sel, transition, time, prev_obs_list):
    """EXACT backward-kernel categorical for a SMALL set of children.

    Gumbel-max over parent chunks: for every selected child lane l,
    J_l = argmax_j (log w^j + log p(child_l | parent_j) + G_{lj}) with
    iid Gumbel noise - an exact categorical draw computed with
    O(chunk * L) live memory per step instead of the [B, K, L] tile
    (the running max rides a `lax.scan` over parent chunks), so it
    stays cheap at the particle counts rejection mode exists for.

    Args:
        children_sel: `[B, L(, D)]` pytree of children to resolve.
    Returns:
        `[B, L]` int32 parent indices.
    """
    batch_size, l = _first_leaf(children_sel).shape[:2]
    k = prev_log_weight.shape[1]
    chunk = _chunk_size(k)
    n_chunks = k // chunk

    parents_x = jax.tree_util.tree_map(
        lambda x: jnp.moveaxis(
            x.reshape((batch_size, n_chunks, chunk) + x.shape[2:]),
            1, 0),
        prev_latent)                         # [n_chunks, B, chunk, ...]
    logw_x = jnp.moveaxis(
        prev_log_weight.reshape(batch_size, n_chunks, chunk), 1, 0)

    def per_parent(parent):                  # parent [B(, D)]
        parent1 = jax.tree_util.tree_map(lambda x: x[:, None], parent)
        dist = transition(previous_latents=[parent1], time=time,
                          previous_observations=prev_obs_list)
        return state.log_prob(dist, children_sel)             # [B, L]

    def chunk_body(carry, inputs):
        best, best_idx = carry
        chunk_i, parents_c, logw_c = inputs
        lp = jax.vmap(per_parent, in_axes=1,
                      out_axes=1)(parents_c)              # [B, chunk, L]
        g = jax.random.gumbel(
            jax.random.fold_in(key, chunk_i),
            (batch_size, chunk, l), dtype=best.dtype)
        score = lp + logw_c[:, :, None] + g
        m = jnp.max(score, axis=1)                            # [B, L]
        am = (chunk_i * chunk +
              jnp.argmax(score, axis=1).astype(jnp.int32))    # [B, L]
        take = m > best
        return (jnp.where(take, m, best),
                jnp.where(take, am, best_idx)), None

    best0 = jnp.full((batch_size, l), -jnp.inf,
                     dtype=prev_log_weight.dtype)
    idx0 = jnp.zeros((batch_size, l), dtype=jnp.int32)
    (_, idx), _ = jax.lax.scan(
        chunk_body, (best0, idx0),
        (jnp.arange(n_chunks, dtype=jnp.int32), parents_x, logw_x))
    return idx


def _rejection_backward_indices(key, prev_latent, prev_log_weight,
                                children, transition, time,
                                prev_obs_list, num_draws: int,
                                log_bound, max_rounds: int,
                                max_exact_lanes=None):
    """Backward-kernel parent draws by rejection sampling - O(K) total.

    Samples, for every child particle i (and draw n), an index
    J ~ Categorical_j( wbar_{t-1}^j * p(child_i | parent_j) ) WITHOUT
    forming the [B, K, K] pairwise tile (Douc, Garivier, Moulines &
    Olsson 2011): propose J ~ wbar (inverse-CDF), accept with
    probability p(child | parent_J) / bound. Each round costs O(C * N)
    pointwise transition evaluations; rounds repeat under
    `lax.while_loop` until every lane has accepted or `max_rounds` is
    hit. Lanes still alive then (outlier children whose per-round
    acceptance sum_j w^j p(child|x^j)/bound is tiny - the known heavy
    tail of rejection FFBS) are resolved by the HYBRID scheme: up to
    `max_exact_lanes` of them get an exact chunked Gumbel-max
    categorical (`_exact_backward_draw`, O(K * L) pointwise evals) -
    so the draw is exact unless MORE than `max_exact_lanes` lanes
    survive, which the returned diagnostics report.

    Args:
        children: `[B, C(, D)]` pytree of child particles (C = K for
            PaRIS, C = M trajectories for FFBS).
        log_bound: `[B]` log upper bound on the transition density.
        max_exact_lanes: static cap on exact-fallback lanes per call
            (None: auto max(128, lanes/8); 0 disables the fallback).
    Returns:
        (idx `[B, C, N]` int32, accept_rate `[B]` - fraction of lanes
        accepted by round 1 (the geometric rate), unconverged `[B]` -
        lanes still unresolved at exit, 0 == the draw was exact).
    """
    batch_size, c = _first_leaf(children).shape[:2]
    n = num_draws
    w = jax.nn.softmax(prev_log_weight, axis=1)
    cdf = jnp.cumsum(w, axis=1)                               # [B, K]
    k = cdf.shape[1]

    children_flat = jax.tree_util.tree_map(
        lambda x: jnp.repeat(x, n, axis=1), children)         # [B, C*N]

    def eval_lp(j_flat):
        parents = jax.tree_util.tree_map(
            lambda x: jnp.take_along_axis(
                x, j_flat.reshape(j_flat.shape +
                                  (1,) * (x.ndim - 2)), axis=1),
            prev_latent)                                      # [B, C*N]
        dist = transition(previous_latents=[parents], time=time,
                          previous_observations=prev_obs_list)
        return state.log_prob(dist, children_flat)            # [B, C*N]

    # method='sort' above ~2^16 query lanes: the default binary-search
    # lowering ('scan': a log2(K)-step while_loop over [B, C*N] lanes)
    # faulted the TPU device at C*N = 131,072 (K=65,536 PaRIS, crash
    # reproduced 3x round 3-4); the co-sorting lowering runs the same
    # shapes fine. Small widths keep the cheaper binary search.
    ss_method = "sort" if c * n >= (1 << 16) else "scan"
    searchsorted_rows = jax.vmap(
        lambda a, v: jnp.searchsorted(a, v, side="right",
                                      method=ss_method))

    if max_exact_lanes is None:
        # Auto: absorb up to 1/8 of the lanes (weight-degenerate
        # filters can strand hundreds at one step), but cap the
        # fallback's K*L pointwise-eval cost at ~2^26 so rejection
        # stays O(K) compute at large K (at the cap, stragglers beyond
        # L keep the biased last proposal and are REPORTED via the
        # unconverged diagnostic).
        lanes = min(c * n,
                    max(128, min((c * n) // 8, (1 << 26) // max(k, 1))))
    else:
        lanes = min(int(max_exact_lanes), c * n)

    def cond(carry):
        _, _, accepted, rounds = carry
        alive = jnp.sum(jnp.logical_not(accepted))
        # Stop early once the exact fallback can absorb all survivors
        # per batch row (counted conservatively across the batch).
        return jnp.logical_and(rounds < max_rounds, alive > lanes)

    def body(carry):
        key, idx, accepted, rounds = carry
        key, k1, k2 = jax.random.split(key, 3)
        u_sel = jax.random.uniform(k1, (batch_size, c * n))
        j_cand = jnp.clip(searchsorted_rows(cdf, u_sel), 0,
                          k - 1).astype(jnp.int32)
        log_u = jnp.log(jax.random.uniform(
            k2, (batch_size, c * n), minval=1e-38))
        acc_new = log_u < (eval_lp(j_cand) - log_bound[:, None])
        fresh = jnp.logical_and(jnp.logical_not(accepted), acc_new)
        # Unconverged lanes track their LAST proposal as the fallback.
        idx = jnp.where(jnp.logical_or(fresh,
                                       jnp.logical_not(accepted)),
                        j_cand, idx)
        accepted = jnp.logical_or(accepted, acc_new)
        return key, idx, accepted, rounds + 1

    idx0 = jnp.zeros((batch_size, c * n), dtype=jnp.int32)
    accepted0 = jnp.zeros((batch_size, c * n), dtype=bool)
    # One unrolled first round (to read the acceptance rate), then loop.
    key_loop, idx, accepted, rounds = body((key, idx0, accepted0, 0))
    accept_rate = jnp.mean(accepted, axis=1)
    key_final, idx, accepted, _ = jax.lax.while_loop(
        cond, body, (key_loop, idx, accepted, rounds))

    if lanes > 0:
        # Hybrid exact fallback: gather the (up to `lanes`) still-alive
        # children to the front, draw their parents exactly, scatter
        # back. Already-accepted lanes in the gathered window keep
        # their (equally exact) rejection draw.
        order = jnp.argsort(accepted, axis=1,
                            stable=True)[:, :lanes]          # alive 1st
        alive_sel = jnp.logical_not(
            jnp.take_along_axis(accepted, order, axis=1))    # [B, L]
        children_sel = jax.tree_util.tree_map(
            lambda x: jnp.take_along_axis(
                x, order.reshape(order.shape + (1,) * (x.ndim - 2)),
                axis=1),
            children_flat)
        idx_exact = _exact_backward_draw(
            key_final, prev_latent, prev_log_weight, children_sel,
            transition, time, prev_obs_list)
        brow = jnp.arange(batch_size)[:, None]
        keep = jnp.take_along_axis(idx, order, axis=1)
        idx = idx.at[brow, order].set(
            jnp.where(alive_sel, idx_exact, keep))
        accepted = accepted.at[brow, order].set(True)

    unconverged = jnp.sum(jnp.logical_not(accepted), axis=1)
    return (idx.reshape(batch_size, c, n), accept_rate, unconverged)


def _resolve_pairwise_mode(transition, latent, obs_prev, time_value=1):
    """Trace-time probe: 'broadcast' if the transition accepts
    `[B, K, 1]` parents (arithmetic transitions), else 'vmap'. Run
    OUTSIDE any `jax.checkpoint`'d scan body (probes inside one survive
    DCE - the measured round-3 trap; see aesmc_tpu/tmc.py)."""
    def _probe(lat, obs0):
        time = TimeIndex(jnp.asarray(time_value, jnp.int32))
        dist = transition(previous_latents=[_expand_prev(lat)],
                          time=time, previous_observations=[obs0])
        return _pairwise_log_prob(
            dist, _expand_new(jax.tree_util.tree_map(
                lambda v: v[:, :1], lat)))
    try:
        jax.eval_shape(_probe, latent, obs_prev)
        return "broadcast"
    except Exception:
        return "vmap"


def _paris_backward_update(key, prev_latent, prev_log_weight, latent_t,
                           tau, transition, time, prev_obs_list, h,
                           num_backward_draws, backward,
                           resolved_pairwise, transition_log_bound,
                           max_rejection_rounds, max_exact_lanes):
    """One PaRIS statistic update: N backward-kernel parent draws per
    child, tau_t^i = mean_n [ tau^{J_n} + h(x_{t-1}^{J_n}, x_t^i, t) ].

    Shared by the offline scan (`paris`) and the streaming filter
    (`aesmc_tpu.online`). Returns (tau_t, accept_rate `[B]`,
    unconverged `[B]`) - the diagnostics are all-ones/zeros in
    pairwise mode.
    """
    batch_size = prev_log_weight.shape[0]
    if backward == "rejection":
        log_bound = (
            transition_log_bound(prev_latent, time, prev_obs_list)
            if transition_log_bound is not None else
            _auto_log_bound(transition, prev_latent, time,
                            prev_obs_list))
        j_all, acc_rate, unconv = _rejection_backward_indices(
            key, prev_latent, prev_log_weight, latent_t, transition,
            time, prev_obs_list, num_backward_draws, log_bound,
            max_rejection_rounds, max_exact_lanes)        # [B, K, N]
    elif (4 * batch_size * prev_log_weight.shape[1] ** 2
          > PAIRWISE_DENSE_MAX_BYTES):
        # Above the dense-tile wall: same exact categorical, streamed
        # over parent chunks (Gumbel-max running argmax).
        j_all = _chunked_pairwise_backward_indices(
            key, prev_latent, prev_log_weight, latent_t, transition,
            time, prev_obs_list, num_backward_draws, resolved_pairwise)
        acc_rate = jnp.ones((batch_size,), prev_log_weight.dtype)
        unconv = jnp.zeros((batch_size,), jnp.int32)
    else:
        # Exact categorical from the [B, Ki, Kj] pairwise tile:
        # logits[b, i_child, j_parent]
        #   = log w_{t-1}^j + log p(x_t^i | x_{t-1}^j).
        if resolved_pairwise == "broadcast":
            pair_dist = transition(
                previous_latents=[_expand_prev(prev_latent)],
                time=time, previous_observations=prev_obs_list)
            a = _pairwise_log_prob(pair_dist, _expand_new(latent_t))
        else:
            def per_parent(parent):
                parent1 = jax.tree_util.tree_map(
                    lambda x: x[:, None], parent)
                dist = transition(previous_latents=[parent1],
                                  time=time,
                                  previous_observations=prev_obs_list)
                return state.log_prob(dist, latent_t)        # [B, K]
            a = jax.vmap(per_parent, in_axes=1,
                         out_axes=1)(prev_latent)
        # a[b, j_parent, i_child] -> transpose to child-major.
        logits = (jnp.swapaxes(a, 1, 2) +
                  prev_log_weight[:, None, :])               # [B, Ki, Kj]
        draw_keys = jax.random.split(key, num_backward_draws)
        j_all = jnp.stack(
            [jax.random.categorical(draw_keys[n], logits, axis=-1)
             for n in range(num_backward_draws)], axis=-1)
        acc_rate = jnp.ones((batch_size,), prev_log_weight.dtype)
        unconv = jnp.zeros((batch_size,), jnp.int32)

    acc = None
    for n in range(num_backward_draws):
        j_idx = j_all[..., n]                                # [B, K]
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
    return acc / num_backward_draws, acc_rate, unconv


def backward_simulation(original_latents, log_weights, transition,
                        num_trajectories: int, key,
                        observations=None, scan_unroll: int = 1,
                        backward: str = "pairwise",
                        transition_log_bound=None,
                        max_rejection_rounds: int = 64,
                        max_exact_lanes=None,
                        mesh=None,
                        data_axis: str = "data",
                        particle_axis: str = "particle"):
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
        backward: 'pairwise' (default - the [B, K, M] transition tile,
            exact categorical) or 'rejection' - O(K + M) per step via
            rejection sampling against a transition-density bound
            (`_rejection_backward_indices`): the large-K mode, exact
            whenever every lane accepts within `max_rejection_rounds`.
        transition_log_bound: optional
            `fn(prev_latent, time, previous_observations) -> [B]` log
            upper bound on the transition density (default: auto from
            `log_prob(mean)` - exact for the library's Gaussians).
        max_rejection_rounds: rejection-round cap (see above).
        max_exact_lanes: static cap on hybrid exact-fallback lanes
            per step (lanes that exhaust the rejection rounds get an
            exact chunked Gumbel-max draw). None (default) auto-sizes
            to max(128, lanes/8); 0 disables the fallback.
        mesh: optional `jax.sharding.Mesh`. When given, the per-step
            candidate-parent cloud (`[B, K, ...]` latents + `[B, K]`
            weights) is constrained to `(data_axis, particle_axis)` and
            the `M` chosen trajectories stay replicated over the
            particle axis, so GSPMD shards the `[B, K, M]` backward
            tile over parents and inserts the normalizer/argmax
            collectives itself (the same annotate-and-let-XLA-partition
            design as `inference.infer(mesh=...)`) — joint smoothing at
            the particle counts the distributed filter reaches.
        data_axis / particle_axis: mesh axis names.
    Returns:
        `[T, B, M, ...]` pytree of smoothing trajectories.
    """
    if backward not in ("pairwise", "rejection"):
        raise ValueError(f"backward must be 'pairwise' or 'rejection'. "
                         f"currently = {backward}")
    log_weights = jnp.asarray(log_weights)
    num_timesteps, batch_size, _ = log_weights.shape
    m = num_trajectories
    stacked_obs = (stack_observations(observations)
                   if observations is not None else None)

    from .sharding_utils import make_cloud_constrainer
    # [.., B, K, ...] clouds with the K axis sharded over the mesh.
    _constrain_cloud = make_cloud_constrainer(mesh, data_axis,
                                              particle_axis)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        def _constrain_chosen(tree):
            # [B, M, ...] trajectories: replicated over the particle
            # axis (M is small; the [B, K, M] tile shards over K).
            def leaf(x):
                spec = PartitionSpec(
                    data_axis, *([None] * (jnp.ndim(x) - 1)))
                return jax.lax.with_sharding_constraint(
                    x, NamedSharding(mesh, spec))
            return jax.tree_util.tree_map(leaf, tree)
    else:
        def _constrain_chosen(tree):
            return tree

    original_latents = _constrain_cloud(original_latents, lead_dims=2)
    log_weights = _constrain_cloud(log_weights, lead_dims=2)

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
    last = _constrain_chosen(
        pick(jax.tree_util.tree_map(lambda x: x[-1], original_latents),
             idx_last))

    # ---- t = T-2 .. 0 (reverse scan).
    def step(carry, inputs):
        chosen = _constrain_chosen(carry)                    # [B, M, ...]
        latent_t, logw_t, t, obs_prev, sub = inputs
        latent_t = _constrain_cloud(latent_t)
        logw_t = _constrain_cloud(logw_t)
        # Transition from t to t+1: engine convention is
        # previous_observations = [y_t] at time t+1.
        time = TimeIndex(t + 1)
        prev_obs_list = [obs_prev] if obs_prev is not None else None

        if backward == "rejection":
            log_bound = (
                transition_log_bound(latent_t, time, prev_obs_list)
                if transition_log_bound is not None else
                _auto_log_bound(transition, latent_t, time,
                                prev_obs_list))
            idx, _, _ = _rejection_backward_indices(
                sub, latent_t, logw_t, chosen, transition, time,
                prev_obs_list, 1, log_bound, max_rejection_rounds,
                max_exact_lanes)
            idx = idx[..., 0]                                # [B, M]
        else:
            pair_dist = transition(
                previous_latents=[_expand_prev(latent_t)], time=time,
                previous_observations=prev_obs_list)
            # trans_lp[b, k, m] = log p(chosen^m | candidate parent^k)
            trans_lp = _pairwise_log_prob(pair_dist, _expand_new(chosen))
            logits = logw_t[:, :, None] + trans_lp           # [B, K, M]
            idx = jax.random.categorical(
                sub, jnp.moveaxis(logits, 1, 2), axis=-1)    # [B, M]
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
          backward: str = "pairwise",
          transition_log_bound=None,
          max_rejection_rounds: int = 64,
          max_exact_lanes=None,
          remat: bool = True,
          scan_unroll: int = 1,
          mesh=None,
          data_axis: str = "data",
          particle_axis: str = "particle"):
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
        backward: 'pairwise' (default) or 'rejection' - PaRIS with
            REJECTION backward sampling (Douc et al. 2011; the
            implementation Olsson & Westerborn recommend): parents
            proposed from the filter weights and accepted against a
            transition-density bound, O(K * N) per round under a
            `lax.while_loop` instead of the O(K^2) tile - the large-K
            mode. Exact whenever every lane accepts within
            `max_rejection_rounds` (the output reports acceptance
            diagnostics); `pairwise` is ignored.
        transition_log_bound: optional `fn(prev_latent, time,
            previous_observations) -> [B]` log upper bound on the
            transition density; default auto-derives `log_prob(mean)`
            (exact for the library's location-family Gaussians).
        max_rejection_rounds: rejection-round cap per step.
        max_exact_lanes: static cap on hybrid exact-fallback lanes
            per step (survivors of the rejection rounds get an exact
            chunked Gumbel-max draw). None (default) auto-sizes to
            max(128, lanes/8); 0 disables the fallback.
        remat: rematerialize the scan body on the backward pass.
        mesh: optional `jax.sharding.Mesh`. The carried particle cloud
            (latents, weights, per-particle tau statistics) is
            constrained to `(data_axis, particle_axis)` so GSPMD shards
            the filter AND the `[B, K_child, K_parent]` backward-kernel
            tile (children sharded, parents all-gathered by XLA) — the
            same annotate-and-partition design as
            `online.make_online_filter(mesh=...)`'s streaming PaRIS,
            here for the offline pass.
        data_axis / particle_axis: mesh axis names.

    Returns:
        dict with 'smoothed' `[batch(, D)]` (the estimate of
        E[S | y]), 'tau' `[batch, K(, D)]` (final per-particle
        statistics), 'log_weight' `[batch, K]`,
        'log_marginal_likelihood' `[batch]`; with
        backward='rejection' also 'backward_accept_rate' `[batch]`
        (mean first-round acceptance over steps - the geometric rate)
        and 'backward_unconverged' `[batch]` (total lanes that hit
        `max_rejection_rounds`, 0 when the run was exact).
    """
    if backward not in ("pairwise", "rejection"):
        raise ValueError(f"backward must be 'pairwise' or 'rejection'. "
                         f"currently = {backward}")
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

    from .sharding_utils import make_cloud_constrainer
    _constrain = make_cloud_constrainer(mesh, data_axis, particle_axis)

    # ---- t = 0 (hoisted).
    proposal_dist = proposal(time=0, observations=obs_seq)
    latent_0 = state.sample(proposal_dist, batch_size, k, step_keys[0, 1])
    log_weight_0 = (state.log_prob(initial(), latent_0) +
                    state.log_prob(emission(latents=[latent_0], time=0),
                                   state.expand_observation(obs_seq[0], k))
                    - state.log_prob(proposal_dist, latent_0))
    tau_0 = (jnp.asarray(h0(latent_0)) if h0 is not None
             else jnp.zeros((batch_size, k), log_weight_0.dtype))
    latent_0, log_weight_0, tau_0 = _constrain(
        (latent_0, log_weight_0, tau_0))

    if num_timesteps == 1:
        w = jax.nn.softmax(log_weight_0, axis=1)
        smoothed = jnp.einsum("bk,bk...->b...", w, tau_0)
        out = {"smoothed": smoothed, "tau": tau_0,
               "log_weight": log_weight_0,
               "log_marginal_likelihood":
                   jax.nn.logsumexp(log_weight_0, axis=1) - log_k}
        if backward == "rejection":  # no backward steps at T=1
            out["backward_accept_rate"] = jnp.ones(
                (batch_size,), log_weight_0.dtype)
            out["backward_unconverged"] = jnp.zeros(
                (batch_size,), jnp.int32)
        return out

    # Resolve 'auto' ONCE, outside the scan (an in-body probe would
    # survive DCE under jax.checkpoint - the measured round-3 trap).
    resolved_pairwise = pairwise
    if resolved_pairwise == "auto":
        resolved_pairwise = _resolve_pairwise_mode(transition, latent_0,
                                                   obs_seq[0])

    def step(carry, inputs):
        prev_latent, prev_log_weight, tau = _constrain(carry)
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

        # Backward-kernel draws over PRE-resampling parents:
        # J ~ Categorical_j( w_{t-1}^j * p(x_t^i | x_{t-1}^j) ).
        tau_t, acc_rate, unconv = _paris_backward_update(
            keys_t[2], prev_latent, prev_log_weight, latent_t, tau,
            transition, time, prev_obs_list, h, num_backward_draws,
            backward, resolved_pairwise, transition_log_bound,
            max_rejection_rounds, max_exact_lanes)

        return (latent_t, log_weight_t, tau_t), (contribution, acc_rate,
                                                 unconv)

    rest_obs = jax.tree_util.tree_map(lambda x: x[1:], stacked_obs)
    prev_obs = jax.tree_util.tree_map(lambda x: x[:-1], stacked_obs)
    times = jnp.arange(1, num_timesteps, dtype=jnp.int32)
    body = jax.checkpoint(step) if remat else step
    ((last_latent, last_log_weight, tau_last),
     (contributions, acc_rates, unconvs)) = \
        jax.lax.scan(body, (latent_0, log_weight_0, tau_0),
                     (rest_obs, prev_obs, times, step_keys[1:]),
                     unroll=scan_unroll)

    w = jax.nn.softmax(last_log_weight, axis=1)
    smoothed = jnp.einsum("bk,bk...->b...", w, tau_last)
    log_ml = (jnp.sum(contributions, axis=0) +
              jax.nn.logsumexp(last_log_weight, axis=1) - log_k)
    out = {"smoothed": smoothed, "tau": tau_last,
           "log_weight": last_log_weight,
           "log_marginal_likelihood": log_ml}
    if backward == "rejection":
        out["backward_accept_rate"] = jnp.mean(acc_rates, axis=0)
        out["backward_unconverged"] = jnp.sum(unconvs, axis=0)
    return out


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
