"""Fused Pallas TPU resampling kernel: normalize -> cumsum -> inverse CDF.

Replaces the designated TPU-hostile reference function
(/root/reference/aesmc/inference.py:234-269, host round-trip + Python
batch loop) AND the slow XLA lowerings measured on v5e: vmapped
searchsorted 'scan' = 14 ms and 'sort' = 2.1 ms at [B=10, K=10k], scatter
histogram = 1.9 ms - versus one fused VMEM pass here.

Per batch row (grid=(B,)), entirely in VMEM, arrays tiled [R, 128]:

1. stable weights: w = exp(logw - max(logw))            (VPU)
2. cumulative sum via blocked triangular matmuls        (MXU):
   lane-prefix with a 128x128 triangular mask, then a 1- or 2-level
   row-offset prefix (supports K up to 128*128*128 = 2M; padded weights
   enter as exp(-inf) = 0 so padding never shifts the CDF)
3. normalize by the total (the reference's renormalize-by-last hack,
   /root/reference/aesmc/inference.py:259-261)
4. inverse-CDF search of the SORTED positions by a two-cursor merge over
   128-wide tiles: each fori trip either consumes a CDF tile or
   finalizes a position tile, so the trip count is <= 2R and total work
   is O(K) [128x128] VPU compare-sums.

Positions are precomputed OUTSIDE the kernel with jax.random (systematic
grid, stratified jitter, or sorted-uniform spacings for multinomial), so
the PRNG stream is identical to the XLA implementation - same key, same
indices. The search counts `cum <= pos` (searchsorted side='right', ==
np.digitize), matching /root/reference/aesmc/inference.py:263-264.
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
# VMEM budget: logw + pos + cum + out tiles ~= 16 bytes/particle.
MAX_KERNEL_PARTICLES = 512 * 1024


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _padded_k(k: int) -> int:
    # R must be a multiple of the merge-tile height.
    return _round_up(k, MERGE_ROWS * LANE)


MERGE_ROWS = 8  # merge-tile height: 8 x 128 = 1024 particles per trip


def _lane_prefix(x):
    """Exact f32 inclusive prefix sum along lanes (Hillis-Steele with
    masked rolls). The MXU triangular-matmul alternative silently loses
    precision on hardware (f32 dot accumulates at bf16-ish precision on
    v5e), which shifted CDF bin edges by up to ~2e-3 relative."""
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    shift = 1
    while shift < LANE:
        rolled = pltpu.roll(x, shift, axis=1)
        x = x + jnp.where(col >= shift, rolled, jnp.zeros_like(x))
        shift *= 2
    return x


def _row_prefix(x):
    """Exact f32 inclusive prefix sum along the sublane axis of [R, 1]."""
    r = x.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    shift = 1
    while shift < r:
        rolled = pltpu.roll(x, shift, axis=0)
        x = x + jnp.where(row >= shift, rolled, jnp.zeros_like(x))
        shift *= 2
    return x


def _resample_kernel(logw_ref, pos_ref, out_ref, cum_ref):
    """One batch row. logw/pos/out refs: [R, 128] tiles (row-major over
    the K axis); cum_ref: VMEM scratch [R, 128]."""
    r = logw_ref.shape[0]
    w_tile = MERGE_ROWS
    n_tiles = r // w_tile
    tile_k = w_tile * LANE

    # ---- 1. Stable weights.
    w = jnp.exp(logw_ref[:, :] - jnp.max(logw_ref[:, :]))

    # ---- 2. Exact blocked cumulative sum (VPU).
    within = _lane_prefix(w)                              # [R, 128]
    totals = within[:, LANE - 1:LANE]                     # [R, 1]
    row_prefix = _row_prefix(totals)                      # [R, 1] incl.
    total = row_prefix[r - 1, 0]
    cum_ref[:, :] = (within + row_prefix - totals) / total

    # ---- 3-4. Two-cursor merge over [w_tile, 128] tiles.
    def trip(_, carry):
        p, rr, acc = carry
        active = p < n_tiles

        p_safe = jnp.minimum(p, n_tiles - 1)
        pos_tile = pos_ref[pl.ds(p_safe * w_tile, w_tile), :]
        cum_tile = cum_ref[pl.ds(rr * w_tile, w_tile), :]

        # cnt[a, j] = #{i in this CDF tile: cum_i <= pos_tile[a, j]},
        # as W x W pairwise [128, 128] compare-reduces (2-D only: Mosaic
        # rejects the 3-D broadcast formulation).
        cum_cols = [cum_tile[b:b + 1, :].reshape(LANE, 1)
                    for b in range(w_tile)]
        cnt_rows = []
        for a in range(w_tile):
            pos_row = pos_tile[a:a + 1, :]                   # [1, 128]
            c = jnp.zeros((1, LANE), jnp.int32)
            for b in range(w_tile):
                cmp = cum_cols[b] <= pos_row                 # [128, 128]
                c = c + jnp.sum(cmp.astype(jnp.int32), axis=0,
                                keepdims=True)
            cnt_rows.append(c)
        cnt = jnp.concatenate(cnt_rows, axis=0)              # [W, 128]

        cdf_tile_max = cum_tile[w_tile - 1, LANE - 1]
        pos_tile_max = pos_tile[w_tile - 1, LANE - 1]
        row_done = jnp.logical_and(cdf_tile_max <= pos_tile_max,
                                   rr < n_tiles - 1)

        @pl.when(jnp.logical_and(active, jnp.logical_not(row_done)))
        def _():
            out_ref[pl.ds(p_safe * w_tile, w_tile), :] = acc + cnt

        # Finalizing p: CDF tiles 0..rr-1 were fully consumed (their
        # maxima are below every position of the NEXT tile), so the next
        # accumulator starts at tile_k * rr.
        new_acc = jnp.where(row_done, acc + cnt,
                            (tile_k * rr) * jnp.ones_like(acc))
        new_p = jnp.where(jnp.logical_and(active,
                                          jnp.logical_not(row_done)),
                          p + 1, p)
        new_r = jnp.where(jnp.logical_and(active, row_done), rr + 1, rr)
        new_acc = jnp.where(active, new_acc, acc)
        return new_p, new_r, new_acc

    acc0 = jnp.zeros((w_tile, LANE), jnp.int32)
    jax.lax.fori_loop(0, 2 * n_tiles, trip,
                      (jnp.int32(0), jnp.int32(0), acc0))


def searchsorted_cdf_pallas(log_weight, pos, *, interpret: bool = False):
    """idx[b, j] = #{i: normalized_cumsum(log_weight)[b, i] <= pos[b, j]},
    fused in one kernel. `pos` must be sorted along the last axis."""
    batch_size, k = log_weight.shape
    k_pad = _padded_k(k)
    if k_pad != k:
        log_weight = jnp.pad(log_weight, ((0, 0), (0, k_pad - k)),
                             constant_values=-jnp.inf)
        # Padded positions sit above every CDF value; their outputs are
        # sliced off below.
        pos = jnp.pad(pos, ((0, 0), (0, k_pad - k)), constant_values=2.0)
    r = k_pad // LANE

    tiles = lambda x: x.reshape(batch_size * r, LANE)
    out = pl.pallas_call(
        _resample_kernel,
        grid=(batch_size,),
        in_specs=[
            pl.BlockSpec((r, LANE), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, LANE), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((r, LANE), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch_size * r, LANE), jnp.int32),
        scratch_shapes=[pltpu.VMEM((r, LANE), jnp.float32)],
        interpret=interpret,
    )(tiles(log_weight.astype(jnp.float32)), tiles(pos.astype(jnp.float32)))
    return jnp.clip(out.reshape(batch_size, k_pad)[:, :k], 0, k - 1)


def sample_ancestral_index_pallas(log_weight, key, method: str = "systematic",
                                  interpret: bool = False):
    """Drop-in fused-kernel version of
    `aesmc_tpu.resampling.sample_ancestral_index` (same PRNG stream:
    positions are drawn exactly as in the XLA implementations)."""
    from .. import resampling

    log_weight = jnp.asarray(log_weight)
    batch_size, k = log_weight.shape
    if k > MAX_KERNEL_PARTICLES:
        raise ValueError(
            f"pallas resampler supports K <= {MAX_KERNEL_PARTICLES}; "
            f"shard the particle axis (aesmc_tpu.parallel) for K = {k}")
    dtype = jnp.result_type(float)
    if method == "systematic":
        u = jax.random.uniform(key, (batch_size, 1), dtype=dtype)
        pos = (u + jnp.arange(k, dtype=dtype)) / k
    elif method == "stratified":
        u = jax.random.uniform(key, (batch_size, k), dtype=dtype)
        pos = (u + jnp.arange(k, dtype=dtype)) / k
    elif method == "multinomial":
        pos = resampling._multinomial_positions(log_weight, key)
    else:
        raise ValueError(f"unsupported method: {method}")
    return searchsorted_cdf_pallas(jax.lax.stop_gradient(log_weight), pos,
                                   interpret=interpret)
