"""Pallas TPU sorted-gather: resample particles by SORTED ancestor ids.

XLA's gather on `[B, K]` arrays along the particle (minor) axis costs
~1.25 ms at [10, 10k] on v5e - after the fused resampler, it became the
dominant cost of the SMC step. Systematic / stratified / sorted-
multinomial ancestor indices are nondecreasing, which admits the same
two-cursor tile merge as the resampler: each trip either consumes a
source tile or finalizes an output tile, O(K) work total.

Per (row) program, per trip, the contribution of source tile `rr` to
output tile `p` is

    out[j] += sum_i v[i] * (idx[j] == global_i)

evaluated as W x W pairwise [128, 128] equality-compare + multiply +
sublane-reduce on the VPU (exactly one source matches each output slot,
so f32 values pass through exactly - no MXU rounding).

Values may be `[B, K]` or `[B, K, D]` (trailing dims flattened to D and
gathered as D independent rows sharing the batch row's indices).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    AVAILABLE = True
except ImportError:  # pragma: no cover
    pl = None
    pltpu = None
    AVAILABLE = False

LANE = 128
MERGE_ROWS = 4
MAX_KERNEL_PARTICLES = 512 * 1024


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _gather_kernel(idx_ref, v_ref, out_ref):
    """One (batch, feature) row: idx [R, 128] sorted int32 (global ids),
    v [R, 128], out [R, 128]."""
    r = idx_ref.shape[0]
    w_tile = MERGE_ROWS
    n_tiles = r // w_tile
    tile_k = w_tile * LANE

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (w_tile, LANE), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (w_tile, LANE), 1)
    local_ids = row_ids * LANE + col_ids                  # [W, 128]

    def trip(_, carry):
        p, rr, acc = carry
        active = p < n_tiles

        p_safe = jnp.minimum(p, n_tiles - 1)
        idx_tile = idx_ref[pl.ds(p_safe * w_tile, w_tile), :]
        v_tile = v_ref[pl.ds(rr * w_tile, w_tile), :]
        src_ids = rr * tile_k + local_ids                 # [W, 128]

        # out[a, j] += sum_{b, i} v[b, i] * (idx[a, j] == src[b, i])
        contrib_rows = []
        for a in range(w_tile):
            idx_row = idx_tile[a:a + 1, :]                # [1, 128]
            c = jnp.zeros((1, LANE), v_tile.dtype)
            for b in range(w_tile):
                src_col = src_ids[b:b + 1, :].reshape(LANE, 1)
                v_col = v_tile[b:b + 1, :].reshape(LANE, 1)
                eq = (src_col == idx_row)                 # [128, 128]
                c = c + jnp.sum(
                    jnp.where(eq, v_col, jnp.zeros_like(v_col)),
                    axis=0, keepdims=True)
            contrib_rows.append(c)
        contrib = jnp.concatenate(contrib_rows, axis=0)   # [W, 128]

        idx_tile_max = idx_tile[w_tile - 1, LANE - 1]
        src_tile_end = rr * tile_k + tile_k - 1
        # Output tile fully resolved by source tiles <= rr?
        out_done = idx_tile_max <= src_tile_end

        @pl.when(jnp.logical_and(active, out_done))
        def _():
            out_ref[pl.ds(p_safe * w_tile, w_tile), :] = acc + contrib

        # On out_done: do NOT advance rr (the next output tile may reuse
        # this source tile - sorted indices repeat across tiles).
        new_acc = jnp.where(out_done, jnp.zeros_like(acc), acc + contrib)
        new_p = jnp.where(jnp.logical_and(active, out_done), p + 1, p)
        new_r = jnp.where(
            jnp.logical_and(active, jnp.logical_not(out_done)),
            jnp.minimum(rr + 1, n_tiles - 1), rr)
        new_acc = jnp.where(active, new_acc, acc)
        return new_p, new_r, new_acc

    acc0 = jnp.zeros((w_tile, LANE), v_ref.dtype)
    jax.lax.fori_loop(0, 2 * n_tiles, trip,
                      (jnp.int32(0), jnp.int32(0), acc0))


def gather_sorted_pallas(value, index, *, interpret: bool = False):
    """`out[b, j, ...] = value[b, index[b, j], ...]` for SORTED index rows.

    value: `[B, K]` or `[B, K, ...]` float array.
    index: `[B, K]` int32, nondecreasing along the last axis.
    """
    value = jnp.asarray(value)
    index = jnp.asarray(index)
    batch_size, k = index.shape
    trailing = value.shape[2:]
    d = 1
    for s in trailing:
        d *= s

    # v5 route (round 2): a sorted-integer gather IS an inverse-CDF
    # search on scaled keys - cdf_i = (i+1)/K, pos_j = (idx_j + 0.5)/K
    # places each query strictly inside its source's bin (exact in f32
    # for K <= 2^21: numerators are integers+0.5 below 2^22 and the
    # quotient gap 0.5/K stays >= 2 ulp). Reuses the window kernel: no
    # serial cursors, W relayouts per output tile instead of 2W per
    # merge trip, one search shared by all D feature columns.
    from . import resample_pallas as _rp

    # Cap the fused column count: the window kernel unrolls d columns
    # W*W times per window (compile size; mirrors
    # resampling.MAX_FUSED_COLUMNS). Wide latents and f64 inputs (the
    # window kernel computes in f32; a gather must pass values through
    # exactly) keep the per-feature-grid merge below.
    if (k <= 2 ** 21 and d <= 12 and _rp.AVAILABLE
            and value.dtype == jnp.float32
            and _rp.v5_fits(k, k, d, emit_idx=False)):
        cols = value.reshape(batch_size, k, d)
        cols = [cols[:, :, q].astype(jnp.float32) for q in range(d)]
        kf = jnp.float32(k)
        keys = jnp.broadcast_to(
            (jnp.arange(1, k + 1, dtype=jnp.float32)) / kf,
            (batch_size, k))
        pos = (index.astype(jnp.float32) + 0.5) / kf
        _, gathered = _rp.sorted_search_gather_pallas(
            keys, pos, cols, emit_idx=False, interpret=interpret)
        out = jnp.stack(gathered, axis=-1).reshape(
            (batch_size, k) + trailing)
        return out.astype(value.dtype)

    if d > 12:
        # WIDE states (e.g. VRNN latents, D=64): one XLA take_along
        # row-gather (the feature dim rides the lanes, so whole [D]
        # rows move per index) beats the per-(b, d)-row merge grid
        # below 12-33x on v5e (round-4 wide-gather probe: 138/356/3650
        # us vs 3826/11711/43451 at [16, {1k,4k,16k}, 64]) - the
        # per-column kernel launch overhead dominates once D exceeds
        # the fused-column budget. This was a measured 8x cliff on the
        # wide-VRNN AESMC loss at K=1024 (BENCH_NOTES round-4 MFU).
        idx = jnp.minimum(index, k - 1)
        return jnp.take_along_axis(
            value.reshape(batch_size, k, d),
            idx[:, :, None], axis=1).reshape((batch_size, k) + trailing)

    k_pad = _round_up(k, MERGE_ROWS * LANE)
    r = k_pad // LANE

    if trailing:
        # [B, K, D] -> [B, D, K] so each (b, d) is one gather row.
        v2 = jnp.moveaxis(value.reshape(batch_size, k, d), 2, 1)
        v2 = v2.reshape(batch_size * d, k)
    else:
        v2 = value
    if k_pad != k:
        v2 = jnp.pad(v2, ((0, 0), (0, k_pad - k)))
        index = jnp.pad(index, ((0, 0), (0, k_pad - k)),
                        constant_values=k - 1)

    idx_tiles = index.reshape(batch_size * r, LANE)
    v_tiles = v2.reshape(batch_size * d * r, LANE)

    out = pl.pallas_call(
        _gather_kernel,
        grid=(batch_size * d,),
        in_specs=[
            # Feature rows of the same batch row share its index tiles.
            pl.BlockSpec((r, LANE), lambda n, _d=d: (n // _d, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, LANE), lambda n: (n, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((r, LANE), lambda n: (n, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch_size * d * r, LANE),
                                       v2.dtype),
        interpret=interpret,
    )(idx_tiles, v_tiles)

    out = out.reshape(batch_size * d, k_pad)[:, :k]
    if trailing:
        out = out.reshape(batch_size, d, k)
        out = jnp.moveaxis(out, 1, 2).reshape((batch_size, k) + trailing)
    return out
