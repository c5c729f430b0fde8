"""Numerically stable log-space utilities (L0 of the stack).

Capability parity with the reference numerics layer
(/root/reference/aesmc/math.py:6-51): `lognormexp` and
`exponentiate_and_normalize`, stable via the usual max-shift inside
logsumexp. The reference is polymorphic over numpy/torch; here there is a
single array type (jax.Array), and numpy inputs are accepted transparently
because jnp operations promote them.

Also hosts the mesh-aware `distributed_logsumexp` used by the parallel
layer to normalize log-weights across a sharded particle axis (the
reference has no distributed code; see SURVEY.md S2.3).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def lognormexp(values, dim: int = 0):
    """Log of the normalized exponentials of ``values`` along axis ``dim``.

    result[..., j, ...] = values[..., j, ...] - logsumexp(values, dim)

    Mirrors reference `math.lognormexp` (/root/reference/aesmc/math.py:6-30)
    to <=1e-6.
    """
    values = jnp.asarray(values)
    log_denominator = jax.nn.logsumexp(values, axis=dim, keepdims=True)
    return values - log_denominator


def exponentiate_and_normalize(values, dim: int = 0):
    """Normalized exponentials of ``values`` along axis ``dim``.

    result = exp(values) / sum(exp(values), dim), computed stably.

    Mirrors reference `math.exponentiate_and_normalize`
    (/root/reference/aesmc/math.py:33-51).
    """
    return jnp.exp(lognormexp(values, dim=dim))


def logsumexp(values, axis=None, keepdims: bool = False):
    """Stable logsumexp (thin alias over jax.nn.logsumexp)."""
    return jax.nn.logsumexp(jnp.asarray(values), axis=axis, keepdims=keepdims)


def distributed_logsumexp(values, axis_name: str, axis: int | None = None):
    """logsumexp over a mesh-sharded axis.

    Reduces over the local array axis ``axis`` (if given) *and* the mesh
    axis ``axis_name``: local max -> pmax -> local sum of shifted
    exponentials -> psum -> log. Use inside `shard_map` when the particle
    axis is sharded across devices; replaces the single-device
    `torch.logsumexp` at /root/reference/aesmc/inference.py:130,158.
    """
    values = jnp.asarray(values)
    if axis is not None:
        local_max = jnp.max(values, axis=axis, keepdims=True)
    else:
        local_max = values
    # stop_gradient on the max shift, as jax.nn.logsumexp does: the max's
    # cotangent contributions cancel analytically, and lax.pmax has no
    # differentiation rule anyway (the distributed soft resampler
    # differentiates through this function).
    # (stop_gradient goes on pmax's INPUT: a JVP tracer reaching pmax
    # would need the differentiation rule even if the output were
    # detached.)
    global_max = jax.lax.pmax(jax.lax.stop_gradient(local_max), axis_name)
    # Guard against -inf - -inf = nan when a shard is all -inf.
    safe_max = jnp.where(jnp.isneginf(global_max), 0.0, global_max)
    shifted = jnp.exp(values - safe_max)
    if axis is not None:
        local_sum = jnp.sum(shifted, axis=axis)
        safe_max = jnp.squeeze(safe_max, axis=axis)
    else:
        local_sum = shifted
    global_sum = jax.lax.psum(local_sum, axis_name)
    return jnp.log(global_sum) + safe_max


def table_lookup(table, idx, *, threshold: int = 64):
    """`table[idx]` for a SMALL leading-axis table, TPU-fast.

    table `[D, ...]`, integer idx `[...]` -> `idx.shape + table.shape[1:]`.

    For ``D <= threshold`` this computes a one-hot masked SUM (pure
    elementwise VPU work, bit-exact: exactly one nonzero term per
    output) instead of an int-indexed gather. `[B, K]`-indexed gathers
    of small tables lower to cross-lane dynamic selects on TPU and were
    measured ~6.5x slower than the masked sum in the round-5 HMM
    decomposition (BENCH_NOTES "HMM gap CLOSED"); the same pattern cost
    the discrete twisted path 5.9x. Use this for any per-particle
    lookup of regime/state tables (switching models, HMMs, mixture
    indicator models). Deliberately NOT an einsum: an f32 one-hot
    matmul can route to the MXU, which accumulates at ~bf16 precision
    and would round the table values. Falls back to the plain gather
    above ``threshold`` (the [*, D] intermediate grows linearly in D).
    """
    table = jnp.asarray(table)
    idx = jnp.asarray(idx).astype(jnp.int32)
    d = table.shape[0]
    if d > threshold:
        return table[idx]
    # Match `table[idx]`'s traced-index semantics exactly (one negative
    # wrap, then clamp into range) so both routes agree for ANY index.
    idx = jnp.clip(jnp.where(idx < 0, idx + d, idx), 0, d - 1)
    iota = jnp.arange(d, dtype=jnp.int32)
    zero = jnp.asarray(0, table.dtype)
    if table.ndim == 1:
        out = jnp.sum(jnp.where(idx[..., None] == iota, table, zero),
                      axis=-1)
        # jnp.sum promotes sub-32-bit int/bool accumulators; exactly one
        # nonzero term, so the cast back is lossless.
        return out.astype(table.dtype)
    flat = table.reshape(d, -1)
    mask = idx[..., None, None] == iota[:, None]
    out = jnp.sum(jnp.where(mask, flat, zero), axis=-2).astype(table.dtype)
    return out.reshape(idx.shape + table.shape[1:])
