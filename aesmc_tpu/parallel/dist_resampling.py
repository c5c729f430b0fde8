"""Distributed systematic resampling over a sharded particle axis.

The collective-hard part of scaling SMC (SURVEY.md S2.3): systematic
resampling needs the *global* cumulative weight distribution, while the
weights and particles live sharded across devices.

Design (per batch row, K particles over n shards of K_local = K/n):

1. global max + per-shard exp-sums -> distributed normalization
   (pmax + all_gather of n scalars per row over ICI);
2. local cumsum + exclusive prefix of shard sums -> each shard's slice of
   the global CDF;
3. all_gather of the CDF slices -> global CDF replica (O(K) floats - the
   simple, robust layout for v1; the O(K/n) boundary-exchange variant is
   noted below);
4. each shard evaluates the systematic grid positions of the output slots
   it OWNS (a contiguous range - systematic output indices are sorted) and
   searchsorts them into the global CDF -> global ancestor indices;
5. particle exchange: masked local gather + psum (each slot is owned by
   exactly one source shard; the others contribute zeros), so peak memory
   stays at the local shard size.

Gradients: indices are integers (no gradient), and callers stop-gradient
the weights, matching /root/reference/aesmc/inference.py:254.

The same `u` uniform must be used on every shard: pass the *same* PRNG key
replicated (shard_map in_specs P() for the key).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import resampling as _resampling


def distributed_systematic_indices(log_weight, key, axis_name: str,
                                   data_axis_name: str | None = None):
    """Systematic resampling inside `shard_map`; particle axis sharded.

    Args:
        log_weight: local shard `[B, K_local]` of the global `[B, K]`
            unnormalized log-weights.
        key: PRNG key, REPLICATED across the axis (same value everywhere).
        axis_name: mesh axis name the particle dim is sharded over.
        data_axis_name: mesh axis name the batch dim is sharded over, or
            None if the batch is not sharded. Needed so the per-batch-row
            systematic uniform is drawn from the GLOBAL batch shape
            (making results bit-identical to the single-device resampler
            regardless of the data sharding).

    Returns:
        `[B, K_local]` int32 GLOBAL ancestor indices for the output slots
        this shard owns (slots `[d*K_local, (d+1)*K_local)`).
    """
    log_weight = jax.lax.stop_gradient(jnp.asarray(log_weight))
    batch_size, k_local = log_weight.shape
    n = jax.lax.axis_size(axis_name)
    d = jax.lax.axis_index(axis_name)
    k_global = k_local * n

    # 1. Distributed normalization.
    local_max = jnp.max(log_weight, axis=1, keepdims=True)
    global_max = jax.lax.pmax(local_max, axis_name)
    w = jnp.exp(log_weight - global_max)                     # [B, K_local]
    local_sum = jnp.sum(w, axis=1)                           # [B]
    all_sums = jax.lax.all_gather(local_sum, axis_name)      # [n, B]
    total = jnp.sum(all_sums, axis=0)                        # [B]
    prefix = jnp.cumsum(all_sums, axis=0) - all_sums         # exclusive
    my_prefix = prefix[d]                                    # [B]

    # 2-3. Global CDF: local slice, then replicate.
    local_cum = (my_prefix[:, None] + jnp.cumsum(w, axis=1)) / total[:, None]
    cum_slices = jax.lax.all_gather(local_cum, axis_name, axis=1)
    global_cum = cum_slices.reshape(batch_size, k_global)
    # Reference renormalization hack: force the last edge to exactly 1
    # (/root/reference/aesmc/inference.py:259-261).
    global_cum = global_cum / global_cum[:, -1:]

    # 4. Systematic grid for MY output slots. The uniform is drawn over
    # the GLOBAL batch on every shard (cheap: one scalar per row), then
    # sliced, so randomness is independent of the mesh layout.
    if data_axis_name is not None:
        n_data = jax.lax.axis_size(data_axis_name)
        d_data = jax.lax.axis_index(data_axis_name)
        u_global = jax.random.uniform(
            key, (batch_size * n_data, 1), dtype=global_cum.dtype)
        u = jax.lax.dynamic_slice_in_dim(
            u_global, d_data * batch_size, batch_size, axis=0)
    else:
        u = jax.random.uniform(key, (batch_size, 1), dtype=global_cum.dtype)
    slots = d * k_local + jnp.arange(k_local, dtype=global_cum.dtype)
    pos = (u + slots) / k_global                             # [B, K_local]
    find = functools.partial(jnp.searchsorted, side="right")
    idx = jax.vmap(find)(global_cum, pos)
    return jnp.clip(idx, 0, k_global - 1).astype(jnp.int32)


def distributed_resample_particles(value, global_index, axis_name: str):
    """Redistributes sharded particles to globally-indexed output slots.

    For each pytree leaf `[B, K_local, ...]` and `global_index`
    `[B, K_local]` (global ancestor ids for this shard's output slots):
    all_gather the source particles over the particle axis, then gather
    the owned slots locally. O(K) transient memory per device - the
    simple v1 layout; a ragged cross-shard exchange (each output shard
    needs only a contiguous source range, since systematic output indices
    are sorted) is the planned optimization.
    """
    idx = jnp.asarray(global_index)

    def gather(leaf):
        leaf = jnp.asarray(leaf)
        full = jax.lax.all_gather(leaf, axis_name, axis=1, tiled=True)
        expanded = idx.reshape(idx.shape + (1,) * (leaf.ndim - 2))
        return jnp.take_along_axis(full, expanded, axis=1)

    return jax.tree_util.tree_map(gather, value)


def make_distributed_systematic_resampler(mesh: Mesh,
                                          data_axis: str = "data",
                                          particle_axis: str = "particle"):
    """A `(log_weight, key) -> indices` callable with explicit collectives.

    Signature-compatible with the `implementation=` hook of
    `aesmc_tpu.resampling.sample_ancestral_index` / `infer`: takes global
    `[B, K]` log-weights (sharded `(data, particle)`) and returns global
    `[B, K]` ancestor indices with the same sharding, computed via
    shard_map + ICI collectives instead of letting GSPMD partition the
    single-device formulation.
    """
    def resampler(log_weight, key):
        f = jax.shard_map(
            lambda lw, k: distributed_systematic_indices(
                lw, k, particle_axis, data_axis_name=data_axis),
            mesh=mesh,
            in_specs=(P(data_axis, particle_axis), P()),
            out_specs=P(data_axis, particle_axis))
        return f(log_weight, key)

    return resampler
