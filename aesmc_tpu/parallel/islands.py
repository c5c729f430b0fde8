"""Island particle models: two-level SMC for distributed hardware.

Runs `num_islands` independent SMC filters ("islands") of `num_particles`
each and - optionally - RESAMPLES WHOLE ISLANDS against each other
(Verge, Dubarry, Del Moral & Moulines 2015, "On parallel implementation
of sequential Monte Carlo methods: the island particle model"). The
island architecture is the classic SMC answer to distributed hardware,
and maps directly onto a TPU mesh:

- within an island everything is local: per-island resampling touches
  only that island's `[batch, K]` slice - no cross-device traffic, and
  the single-chip fused Pallas kernels apply unchanged;
- the ONLY cross-island interaction is (a) a `[num_islands]`-sized
  log-mean-exp for the evidence and (b) the occasional island-level
  resampling - a gather of whole island states across the island mesh
  axis that XLA lowers to ICI collectives. With an ESS-adaptive island
  criterion this happens rarely, so the communication-to-compute ratio
  is tiny by construction - unlike `parallel.dist_resampling`, which
  exchanges particles across devices EVERY resampling step. The two
  layers compose: distributed resampling shards ONE filter's particle
  axis; islands shard MANY filters.

Estimator. Each island i carries an island-level log-weight - its
accumulated incremental evidence log p-hat_i(y_t | y_{1:t-1}) since the
last island resampling. The combined estimator is the same
interpolating scheme the engine uses for ESS-adaptive SMC one level
down (inference.py, `contributions`): at every island-resampling event
add logmeanexp_i(island log-weights) and reset; finish with one final
logmeanexp. With `island_resampling_criterion='never'` this reduces
exactly to log(1/N sum_i Z-hat_i) - the mean of independent unbiased
evidence estimates; with island interaction it is the doubly-stochastic
island-model estimator. Unbiasedness of E[Z-hat] holds in all cases
(each island's Z-hat is unbiased by the standard SMC argument applied
at the island level, where "particles" are islands and "weights" are
island evidences); `tests/test_islands.py` checks it against the exact
Kalman evidence.

No reference counterpart (the reference is single-device,
SURVEY.md S2.3); built on the streaming filter (`aesmc_tpu.online`), so
every engine feature rides along: resampling variants, ESS-adaptive
within-island criteria, auxiliary-PF lookahead, soft resampling.
"""

from __future__ import annotations

import math as _stdmath

import jax
import jax.numpy as jnp

from .. import online, resampling

__all__ = ["island_infer"]

ISLAND_CRITERIA = ("never", "always")


def island_infer(observations,
                 initial,
                 transition,
                 emission,
                 proposal,
                 num_particles: int,
                 num_islands: int,
                 key=None,
                 island_resampling_criterion="never",
                 island_resampling_method: str = "systematic",
                 mesh=None,
                 island_axis: str = "island",
                 data_axis: str = "data",
                 **filter_kwargs) -> dict:
    """Two-level (island) SMC over a whole observation sequence.

    Args:
        observations: list of `[batch, ...]` pytrees or stacked
            `[T, batch, ...]` pytree (as `infer`).
        initial, transition, emission, proposal: component callables
            (see `aesmc_tpu.inference`).
        num_particles: particles PER ISLAND.
        num_islands: number of islands N. Total particle budget is
            N * num_particles; for a fixed budget, more islands mean
            less within-island interaction (cheaper comms, higher
            estimator variance per island) - the island model's knob.
        key: PRNG key; island i derives its stream by `fold_in(key, i)`,
            plus a separate stream for island-level resampling.
        island_resampling_criterion: 'never' (independent islands -
            embarrassingly parallel, log-mean-exp combination),
            'always', or an ESS fraction in (0, 1]: resample islands
            (per batch row) when the effective number of islands -
            Kish ESS of the island log-weights - drops below
            `frac * num_islands`.
        island_resampling_method: 'systematic' | 'stratified' |
            'multinomial' for the island-level draw.
        mesh / island_axis / data_axis: optional
            `jax.sharding.Mesh` carrying an island axis: island-state
            leaves get `with_sharding_constraint` over
            `(island_axis, data_axis)`, so GSPMD keeps each island's
            particles device-local and lowers island gathers to ICI
            collectives.
        **filter_kwargs: forwarded to `online.make_online_filter` -
            resampling_method / _implementation / _criterion,
            soft_resampling_alpha, lookahead, ... (the within-island
            engine knobs).

    Returns:
        dict with:
        - 'log_marginal_likelihood': `[batch]` combined evidence
          estimate (see module docstring),
        - 'island_log_marginal_likelihood': `[num_islands, batch]`
          per-island accumulated evidence SINCE THE LAST island
          resampling ('never': each island's full log Z-hat),
        - 'last_latent': `[num_islands, batch, K, ...]` pytree,
        - 'log_weight': `[num_islands, batch, K]` final particle
          log-weights,
        - 'pooled_log_weight': `[num_islands, batch, K]` jointly
          normalized weights (island weight x particle weight; each
          batch row sums to 1 over islands AND particles) - reshape
          together with `last_latent` to `[batch, N*K]` for the
          `statistics` helpers to get posterior estimates from the
          POOLED ensemble,
        - 'num_island_events': `[batch]` int32 island-resampling
          counts.
    """
    from ..inference import stack_observations

    if num_islands < 1:
        raise ValueError(
            f"num_islands must be >= 1. currently = {num_islands}")
    adaptive = island_resampling_criterion not in ISLAND_CRITERIA
    if adaptive:
        frac = float(island_resampling_criterion)
        if not 0.0 < frac <= 1.0:
            raise ValueError(
                "island_resampling_criterion must be 'never', 'always' "
                "or an ESS fraction in (0, 1]. currently = "
                f"{island_resampling_criterion!r}")
        ess_threshold = frac * num_islands
    if key is None:
        key = jax.random.PRNGKey(0)

    stacked = stack_observations(observations)
    leaves = jax.tree_util.tree_leaves(stacked)
    num_timesteps = leaves[0].shape[0]
    batch_size = leaves[0].shape[1]
    log_num_islands = _stdmath.log(num_islands)

    init_fn, step_fn = online.make_online_filter(
        initial, transition, emission, proposal, num_particles,
        **filter_kwargs)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        if island_axis not in mesh.axis_names:
            raise ValueError(
                f"mesh has axes {mesh.axis_names}; island_axis="
                f"{island_axis!r} is not one of them")
        batch_axis = data_axis if data_axis in mesh.axis_names else None

        def _constrain(tree):
            def leaf(x):
                if jnp.ndim(x) < 2:
                    return x
                spec = PartitionSpec(island_axis, batch_axis,
                                     *([None] * (jnp.ndim(x) - 2)))
                return jax.lax.with_sharding_constraint(
                    x, NamedSharding(mesh, spec))
            return jax.tree_util.tree_map(leaf, tree)
    else:
        def _constrain(tree):
            return tree

    # Per-island PRNG streams: island i folds its index into `key`, then
    # splits the batch engine's per-step (resample, propose) key layout,
    # so island i alone behaves exactly like `infer(key=fold_in(key, i))`.
    island_keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
        jnp.arange(num_islands, dtype=jnp.uint32))
    all_step_keys = jax.vmap(
        lambda k: online.split_step_keys(k, num_timesteps))(island_keys)
    # Island-level resampling stream: one key per timestep, disjoint from
    # the island streams by a fold_in tag.
    island_resample_keys = jax.random.split(
        jax.random.fold_in(key, jnp.uint32(0x15AD)), num_timesteps)

    states = _constrain(jax.vmap(
        lambda k: init_fn(stacked_first(stacked), k))(all_step_keys[:, 0]))

    # Island log-weights start at each island's t=0 evidence
    # (logsumexp(w_0) - log K); the scan then adds the per-step
    # incremental evidences, so an island's log-weight is always its
    # full accumulated log Z-hat since the last island resampling.
    island_lw_0 = online.log_marginal_likelihood(states)   # [N, B]
    contrib_0 = jnp.zeros((batch_size,), island_lw_0.dtype)
    events_0 = jnp.zeros((batch_size,), jnp.int32)

    def gather_islands(tree, idx):
        """Redistributes island states: new island n takes old island
        idx[n, b] for batch row b. Leaves with a leading island axis and
        a batch axis gather along axis 0; island-invariant leaves (the
        step counter t) pass through."""
        def leaf(x):
            if jnp.ndim(x) < 2 or x.shape[0] != num_islands:
                return x
            expanded = idx.reshape(idx.shape + (1,) * (jnp.ndim(x) - 2))
            return jnp.take_along_axis(x, expanded, axis=0)
        return jax.tree_util.tree_map(leaf, tree)

    def body(carry, inputs):
        states, island_lw, contrib, events = carry
        obs_t, step_keys_t, iso_key_t = inputs

        states, info = jax.vmap(
            step_fn, in_axes=(0, None, 0))(states, obs_t, step_keys_t)
        island_lw = island_lw + info["log_pred"]       # [N, B]

        if num_islands > 1 and island_resampling_criterion != "never":
            lw_t = island_lw.T                         # [B, N]
            if adaptive:
                ess = jnp.exp(2 * jax.nn.logsumexp(lw_t, axis=1) -
                              jax.nn.logsumexp(2 * lw_t, axis=1))
                do = ess < ess_threshold               # [B]
            else:
                do = jnp.ones((batch_size,), bool)
            sampled = resampling.sample_ancestral_index(
                lw_t, iso_key_t,
                method=island_resampling_method).T      # [N, B]
            identity = jnp.broadcast_to(
                jnp.arange(num_islands,
                           dtype=sampled.dtype)[:, None], sampled.shape)
            idx = jnp.where(do[None, :], sampled, identity)
            states = gather_islands(states, idx)
            contribution = jnp.where(
                do,
                jax.nn.logsumexp(island_lw, axis=0) - log_num_islands,
                jnp.zeros_like(contrib))
            contrib = contrib + contribution
            island_lw = jnp.where(do[None, :],
                                  jnp.zeros_like(island_lw), island_lw)
            events = events + do.astype(jnp.int32)

        states = _constrain(states)
        return (states, island_lw, contrib, events), None

    if num_timesteps > 1:
        rest_obs = jax.tree_util.tree_map(lambda x: x[1:], stacked)
        (states, island_lw, contrib, events), _ = jax.lax.scan(
            body, (states, island_lw_0, contrib_0, events_0),
            (rest_obs, all_step_keys[:, 1:].swapaxes(0, 1),
             island_resample_keys[1:]))
    else:
        island_lw, contrib, events = island_lw_0, contrib_0, events_0

    # Each island's evidence since its last island-resampling event:
    # accumulated log_pred increments + the current-weights term.
    island_log_z = island_lw
    log_z = (contrib +
             jax.nn.logsumexp(island_log_z, axis=0) - log_num_islands)

    # Pooled posterior weights: normalized island weight x normalized
    # particle weight -> [N, B, K] summing to 1 per batch row.
    island_lognorm = island_log_z - jax.nn.logsumexp(
        island_log_z, axis=0, keepdims=True)
    particle_lognorm = states.log_weight - jax.nn.logsumexp(
        states.log_weight, axis=-1, keepdims=True)
    pooled = island_lognorm[:, :, None] + particle_lognorm

    return {
        "log_marginal_likelihood": log_z,
        "island_log_marginal_likelihood": island_log_z,
        "last_latent": states.latent,
        "log_weight": states.log_weight,
        "pooled_log_weight": pooled,
        "num_island_events": events,
    }


def stacked_first(stacked):
    """The t=0 observation `[batch, ...]` of a stacked pytree."""
    return jax.tree_util.tree_map(lambda x: x[0], stacked)
