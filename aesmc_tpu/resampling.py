"""Particle resampling, fully on-device (the reference's TPU-hostile core).

The reference resampler (/root/reference/aesmc/inference.py:234-269) syncs
device->host, uses the *global* numpy RNG, and loops over the batch in
Python. Here every variant is a pure, batched, jittable JAX function with
an explicit PRNG key:

    normalize -> cumulative sum -> (sorted) inverse-CDF search -> indices

Semantics preserved from the reference:
- ancestor indices carry no gradient (`stop_gradient`, matching `.detach()`
  at /root/reference/aesmc/inference.py:254);
- systematic grid `(u + arange(K)) / K` with one uniform per batch row
  (/root/reference/aesmc/inference.py:250-251);
- cumulative weights renormalized by their final value to kill float
  accumulation error (/root/reference/aesmc/inference.py:257-261);
- `np.digitize(pos, cum)` == searchsorted(side='right')
  (/root/reference/aesmc/inference.py:263-264).

Variants: systematic (reference), stratified, multinomial (BASELINE.json
configs 2-3), plus differentiable soft resampling (gradient flows through
the weights via a score-function correction on the gathered particles).

`implementation='pallas'` routes to the fused Pallas TPU kernel in
`aesmc_tpu.ops.resample_pallas` (same signature, same outputs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import math as amath

METHODS = ("systematic", "stratified", "multinomial", "residual")


def _check_nan_eager(log_weight):
    """Reference parity: FloatingPointError on NaN log-weights
    (/root/reference/aesmc/inference.py:244-245). Only checkable eagerly;
    under jit, NaNs propagate (enable jax_debug_nans to trap them)."""
    try:
        has_nan = bool(jnp.isnan(log_weight).any())
    except (jax.errors.TracerBoolConversionError,
            jax.errors.ConcretizationTypeError):
        return
    if has_nan:
        raise FloatingPointError("log_weight contains nan element(s)")


def _normalized_cumsum(log_weight):
    """[B, K] log-weights -> [B, K] cumulative normalized weights with
    cum[:, -1] == 1 exactly (the reference's renormalization hack).

    The cumsum is forced MONOTONE with a running max: XLA's parallel
    prefix sum can emit eps-scale inversions at large K (measured ~1e-5
    of entries at K=512k on v5e), and a non-monotone CDF makes the
    inverse-CDF crossing ambiguous - the fused kernel's one-hot selector
    fired twice at inversion points while searchsorted counted once.
    cummax pins every implementation (XLA searchsorted, dense one-hot,
    Pallas merge) to the same well-defined bin edges.
    """
    w = amath.exponentiate_and_normalize(log_weight, dim=-1)
    cum = jax.lax.cummax(jnp.cumsum(w, axis=-1), axis=1)
    cum = cum / cum[:, -1:]
    # XLA lowers x/y as x * reciprocal(y) on TPU, so even x/x is not
    # exactly 1; positions are clamped strictly below 1.0, so the last
    # edge is pinned AT 1.0 to guarantee every position has a
    # strictly-greater CDF entry. Concatenation, not .at[].set: the
    # latter lowers to a scatter, which the dense path's backward must
    # stay free of.
    return jnp.concatenate(
        [cum[:, :-1], jnp.ones_like(cum[:, -1:])], axis=1)


def _searchsorted_right(cum, pos):
    """Batched searchsorted(side='right'): idx[b,k] = #{i : cum[b,i] <= pos[b,k]}.

    Both inputs sorted along the last axis. Method choice is
    TPU-informed: the default 'scan' binary search serializes K gathers
    (14 ms at [10, 10k] on v5e - it was 97% of the whole SMC step);
    'compare_all' wins for small rows, 'sort' for large ones. The fused
    Pallas kernel (implementation='pallas') replaces both.
    """
    k = cum.shape[-1]
    method = "compare_all" if k <= 2048 else "sort"
    find = functools.partial(jnp.searchsorted, side="right", method=method)
    return jax.vmap(find)(cum, pos)


def systematic_indices(log_weight, key):
    """Systematic resampling: one uniform per batch row on a regular grid."""
    log_weight = jnp.asarray(log_weight)
    num_particles = log_weight.shape[-1]
    cum = _normalized_cumsum(log_weight)
    pos = resampling_positions(log_weight, key, "systematic")
    idx = _searchsorted_right(cum, pos.astype(cum.dtype))
    return jnp.clip(idx, 0, num_particles - 1).astype(jnp.int32)


def stratified_indices(log_weight, key):
    """Stratified resampling: an independent uniform per grid stratum."""
    log_weight = jnp.asarray(log_weight)
    num_particles = log_weight.shape[-1]
    cum = _normalized_cumsum(log_weight)
    pos = resampling_positions(log_weight, key, "stratified")
    idx = _searchsorted_right(cum, pos.astype(cum.dtype))
    return jnp.clip(idx, 0, num_particles - 1).astype(jnp.int32)


def multinomial_indices(log_weight, key):
    """Multinomial resampling: iid categorical draws from the weights.

    Implemented by inverse-CDF with *sorted* uniforms generated via the
    exponential-spacings identity (S_k / S_{K+1} for S = cumsum of iid
    Exp(1) draws), which is O(K) with no sort and no K^2 Gumbel tensor
    (jax.random.categorical at shape [K] x logits [B, K] materializes a
    [K, B, K] array - 4 GB at the 10k-particle benchmark config).
    Returns the order statistics of the iid draws; marginals and
    offspring counts are identical to unsorted multinomial resampling.
    """
    log_weight = jnp.asarray(log_weight)
    pos = resampling_positions(log_weight, key, "multinomial")
    cum = _normalized_cumsum(log_weight)
    idx = _searchsorted_right(cum, pos.astype(cum.dtype))
    return jnp.clip(idx, 0, log_weight.shape[-1] - 1).astype(jnp.int32)


def _multinomial_positions(log_weight, key):
    """Sorted Uniform(0,1) order statistics via exponential spacings."""
    batch_size, num_particles = log_weight.shape
    e = jax.random.exponential(
        key, (batch_size, num_particles + 1),
        dtype=jnp.result_type(float))
    s = jnp.cumsum(e, axis=-1)
    return s[:, :-1] / s[:, -1:]


def residual_indices(log_weight, key):
    """Residual resampling (Liu & Chen 1998): every particle i gets
    floor(K * w_i) copies DETERMINISTICALLY; the remaining
    R = K - sum floor(K * w_i) slots are filled multinomially from the
    residual weights r_i propto K * w_i - floor(K * w_i). Unbiased
    (E[N_i] = K * w_i exactly) with strictly lower offspring-count
    variance than multinomial - the deterministic part carries no noise.

    Static-shape formulation: slot s takes the deterministic index
    searchsorted(cumsum(floor), s) while s < C (the per-row
    deterministic total) and an iid residual-categorical draw
    otherwise - exactly Multinomial(R, r) for the random block. The
    final vector is SORTED (counts are the sufficient statistic; every
    sampler here emits nondecreasing indices, which the sorted-gather
    kernels rely on).

    No fused-kernel path: the query set is not a monotone position grid
    on the unmodified CDF, so this method always runs the XLA route.
    """
    log_weight = jnp.asarray(log_weight)
    batch_size, k = log_weight.shape
    w = amath.exponentiate_and_normalize(log_weight, dim=-1)
    kw = k * w
    copies = jnp.floor(kw)                                    # [B, K]
    cum_copies = jnp.cumsum(copies, axis=1)
    det_total = cum_copies[:, -1:]                            # C, [B, 1]
    slots = jnp.broadcast_to(
        jnp.arange(k, dtype=cum_copies.dtype)[None], (batch_size, k))
    det_idx = _searchsorted_right(cum_copies, slots + 0.5)

    residual = kw - copies
    res_total = jnp.maximum(k - det_total, 1e-30)             # R, [B, 1]
    cum_res = jax.lax.cummax(jnp.cumsum(residual / res_total, axis=1),
                             axis=1)
    cum_res = jnp.concatenate(
        [cum_res[:, :-1], jnp.ones_like(cum_res[:, -1:])], axis=1)
    u = jax.random.uniform(key, (batch_size, k),
                           dtype=jnp.result_type(float))
    res_idx = _searchsorted_right(cum_res, u.astype(cum_res.dtype))

    idx = jnp.where(slots < det_total, det_idx, res_idx)
    idx = jnp.clip(idx, 0, k - 1).astype(jnp.int32)
    return jnp.sort(idx, axis=1)


_VARIANTS = {
    "systematic": systematic_indices,
    "stratified": stratified_indices,
    "multinomial": multinomial_indices,
    "residual": residual_indices,
}


def resampling_positions(log_weight, key, method: str = "systematic"):
    """The sorted inverse-CDF query positions of each variant: systematic
    grid (one uniform per row), stratified jitter, or sorted-uniform
    order statistics for multinomial. Shared by the XLA, dense and Pallas
    implementations, so the PRNG stream is identical across all three.

    Positions are clamped strictly below 1.0: at K ~ 2^22+ the f32 grid
    (u + j)/K rounds its top positions to exactly 1.0, where the
    normalized CDF also ends - leaving no strictly-greater CDF entry for
    the inverse-CDF crossing (the last output slot gathered nothing).
    With pos < 1 == cdf[-1], a crossing always exists and every
    implementation (count-based and crossing-based) agrees.
    """
    batch_size, k = jnp.shape(log_weight)
    dtype = jnp.result_type(float)
    below_one = jnp.nextafter(jnp.asarray(1.0, dtype),
                              jnp.asarray(0.0, dtype))
    if method == "systematic":
        u = jax.random.uniform(key, (batch_size, 1), dtype=dtype)
        pos = (u + jnp.arange(k, dtype=dtype)) / k
    elif method == "stratified":
        u = jax.random.uniform(key, (batch_size, k), dtype=dtype)
        pos = (u + jnp.arange(k, dtype=dtype)) / k
    elif method == "multinomial":
        pos = _multinomial_positions(log_weight, key)
    else:
        raise ValueError(f"unsupported method: {method}")
    return jnp.minimum(pos, below_one)


# Dense one-hot resampling path: at K below this, the particle gather is
# a one-hot MXU matmul whose VJP is a matmul transpose. Rationale
# (measured on v5e at the reference training config T=200 B=10 K=100):
# the backward of take_along_axis is an XLA scatter-add, and 200 tiny
# scatters dominated the AESMC training backward (14 ms of a 24 ms
# step); the dense formulation removes every scatter from the program.
# O(K^2) memory/flops bounds it to small K - exactly the regime where
# op-dispatch, not arithmetic, is the cost.
DENSE_GATHER_MAX_K = 1024


def dense_indices_and_gather(log_weight, pos, value):
    """Fused searchsorted + differentiable gather via one dense compare.

    le[b, j, i] = (cum[b, i] <= pos[b, j]) gives BOTH outputs:
    - ancestor indices: idx[b, j] = sum_i le[b, j, i] (searchsorted
      side='right', == np.digitize, matching
      /root/reference/aesmc/inference.py:263-264);
    - the one-hot ancestor selector: sel = le_{i-1} - le_i (exactly one
      1 per row), so gathered = sel @ value is an MXU matmul that passes
      values through exactly (HIGHEST precision; one nonzero product per
      output) and whose transpose (the training backward) is another
      matmul instead of a scatter.

    Args:
        log_weight: `[B, K]` (already detached by callers).
        pos: `[B, Kp]` sorted query positions in [0, 1).
        value: pytree of `[B, K, ...]` float leaves.

    Returns:
        (idx `[B, Kp]` int32, gathered pytree `[B, Kp, ...]`).
    """
    cum = _normalized_cumsum(log_weight)
    k = cum.shape[-1]
    le = cum[:, None, :] <= pos[:, :, None]                  # [B, Kp, K]
    idx = jnp.clip(jnp.sum(le.astype(jnp.int32), axis=-1),
                   0, k - 1).astype(jnp.int32)
    lef = le.astype(cum.dtype)
    le_prev = jnp.concatenate(
        [jnp.ones_like(lef[:, :, :1]), lef[:, :, :-1]], axis=-1)
    sel = jax.lax.stop_gradient(le_prev - lef)               # one-hot rows

    def gather(leaf):
        leaf = jnp.asarray(leaf)
        shape = leaf.shape
        flat = leaf.reshape(shape[0], shape[1], -1)          # [B, K, C]
        out = jnp.matmul(sel.astype(flat.dtype), flat,
                         precision=jax.lax.Precision.HIGHEST)
        return out.reshape((shape[0], sel.shape[1]) + shape[2:])

    return idx, jax.tree_util.tree_map(gather, value)


def sample_ancestral_index(log_weight, key, method: str = "systematic",
                           implementation: str = "auto"):
    """Sample `[batch, particle]` ancestor indices (no gradient).

    Drop-in TPU replacement for
    /root/reference/aesmc/inference.py:234-269 (which is
    systematic-only); `method` selects the variant.

    Args:
        log_weight: `[batch_size, num_particles]` unnormalized log-weights.
        key: PRNG key.
        method: 'systematic' | 'stratified' | 'multinomial'.
        implementation: 'auto' | 'xla' | 'pallas', or a callable
            `(log_weight, key) -> indices` (e.g. a distributed shard_map
            resampler from `aesmc_tpu.parallel.dist_resampling`).

    Returns:
        int32 `[batch_size, num_particles]` ancestor indices, detached.
    """
    if callable(implementation):
        log_weight = jnp.asarray(log_weight)
        _check_nan_eager(log_weight)
        return implementation(jax.lax.stop_gradient(log_weight), key)
    if method not in _VARIANTS:
        raise ValueError(
            f"method must be one of {METHODS}. currently = {method}")
    log_weight = jnp.asarray(log_weight)
    if log_weight.ndim != 2:
        raise ValueError(
            f"log_weight must be [batch, particles]. Got {log_weight.shape}")
    _check_nan_eager(log_weight)
    log_weight = jax.lax.stop_gradient(log_weight)

    if implementation == "auto":
        implementation = _auto_implementation(log_weight, method)
    if implementation == "pallas":
        if method == "residual":
            raise ValueError(
                "residual resampling has no fused kernel path (its "
                "query set is not a monotone position grid); use "
                "implementation='xla' or 'auto'")
        from .ops import resample_pallas
        return resample_pallas.sample_ancestral_index_pallas(
            log_weight, key, method=method)
    return _VARIANTS[method](log_weight, key)


def _auto_implementation(log_weight, method: str) -> str:
    return resolve_implementation(jnp.shape(log_weight), method, "auto")


def resolve_implementation(shape, method: str, implementation) -> str:
    """Resolves 'auto' to 'pallas' (fused kernel, real TPU, large K) or
    'xla'. Callables and explicit strings pass through."""
    if callable(implementation) or implementation in ("xla", "pallas"):
        return implementation
    try:
        on_tpu = jax.default_backend() == "tpu"
    except Exception:
        on_tpu = False
    # Soft resampling draws multinomially from the tempered mixture; its
    # fused path shares the multinomial kernel route.
    method = "multinomial" if method == "soft" else method
    if method == "residual":
        return "xla"  # no monotone position grid -> no fused kernel
    # Crossover measured on v5e end of round 2 (train step, T=200 B=10):
    # dense one-hot wins at K<=256 (10-13 ms vs pallas's ~18 ms fixed
    # cost), pallas from K=512 up (512: 18.9 vs 20.0; 1024: 26 vs 47;
    # 2048: 36 vs 102). Was 4096 in round 1, when the v1 kernel's
    # custom_vjp hit a JAX 0.9.0 MLIR bug below that (resolved by v5).
    # Round-3 batch sweep (benchmarks/crossover_probe_r3.py): the K=512
    # crossover is B-INVARIANT in time (B=10/64/128 all flip at 512 -
    # both paths scale ~linearly in B) - but the dense path's training
    # backward stores the [B, K, K] compare mask per timestep, which
    # EXCEEDS HBM at large B*K^2 (measured: B=128, K=512, T=200 tries a
    # 26 GB allocation). Route such shapes to the kernel regardless of
    # the time crossover (the 64 MB/step mask bound keeps T=200
    # training under ~13 GB).
    batch = shape[0] if len(shape) > 1 else 1
    dense_mask_bytes = 4 * batch * shape[-1] * shape[-1]
    if on_tpu and method in METHODS and (
            shape[-1] >= 512 or dense_mask_bytes > 64 * 1024 * 1024):
        try:
            from .ops import resample_pallas
            if resample_pallas.AVAILABLE and \
                    shape[-1] <= resample_pallas.LARGE_KERNEL_PARTICLES:
                return "pallas"
        except ImportError:
            pass
    return "xla"


# Integer dtypes whose full range is exactly representable in f32: the
# fused kernel moves value columns by masked SUMS of f32 (exactly one
# nonzero term per output slot, VPU - NOT the MXU, whose f32 matmuls
# accumulate at ~bf16 and would round integers > 256), so a round-trip
# through one f32 column is bit-exact for any value <= 2^24.
_SMALL_INT_DTYPES = ("bool", "int8", "uint8", "int16", "uint16")


def _split_columns(value):
    """Flattens a pytree of `[B, K, ...]` arrays into a list of `[B, K]`
    f32-transportable columns plus a rebuild function.

    Float leaves pass through unchanged. Integer leaves are transported
    exactly (round-5 discrete/HMM-path fix, VERDICT r4 #1 - before this,
    int32 particles silently bypassed the fused resample+gather kernel):

      - bool / 8-bit / 16-bit ints -> ONE f32 column (exact; see
        `_SMALL_INT_DTYPES`), cast back on rebuild.
      - int32 / uint32 -> TWO f32 columns holding the low and high 16
        bits (each in [-32768, 65535], exact in f32); rebuilt with
        `(hi << 16) | (lo & 0xFFFF)`, bit-exact for the full 32-bit
        range. Costs one extra fused column per 32-bit leaf.

    Returns (None, None) if any leaf is not fusable (e.g. 64-bit ints)."""
    leaves, treedef = jax.tree_util.tree_flatten(value)
    columns = []
    specs = []  # (shape, dtype, encoding, num_inner_columns)
    for leaf in leaves:
        leaf = jnp.asarray(leaf)
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            enc = "float"
        elif str(leaf.dtype) in _SMALL_INT_DTYPES:
            enc = "cast"
        elif str(leaf.dtype) in ("int32", "uint32"):
            enc = "pair16"
        else:
            return None, None
        specs.append((leaf.shape, leaf.dtype, enc))
        b, k = leaf.shape[:2]
        flat = leaf.reshape(b, k, -1)
        for d in range(flat.shape[-1]):
            col = flat[:, :, d]
            if enc == "float":
                columns.append(col)
            elif enc == "cast":
                columns.append(col.astype(jnp.float32))
            else:
                lo = jnp.bitwise_and(col, jnp.asarray(0xFFFF, col.dtype))
                hi = jnp.right_shift(col, jnp.asarray(16, col.dtype))
                columns.append(lo.astype(jnp.float32))
                columns.append(hi.astype(jnp.float32))

    def rebuild(gathered):
        out_leaves = []
        i = 0
        for shape, dtype, enc in specs:
            d = 1
            for s in shape[2:]:
                d *= s
            cols = []
            for _ in range(d):
                if enc == "float":
                    cols.append(gathered[i])
                    i += 1
                elif enc == "cast":
                    cols.append(gathered[i].astype(dtype))
                    i += 1
                else:
                    lo = gathered[i].astype(dtype)
                    hi = gathered[i + 1].astype(dtype)
                    i += 2
                    cols.append(jnp.bitwise_or(
                        jnp.left_shift(hi, jnp.asarray(16, dtype)),
                        jnp.bitwise_and(lo, jnp.asarray(0xFFFF, dtype))))
            stacked = jnp.stack(cols, axis=-1)
            out_leaves.append(stacked.reshape(shape))
        return jax.tree_util.tree_unflatten(treedef, out_leaves)

    return columns, rebuild


# Max feature columns fused into the resampling kernel (compile size
# grows with it; VMEM pressure is handled by resample_pallas.v5_fits);
# beyond this the separate sorted-gather kernel runs. Raised 8 -> 12 in
# round 2 (the v5 window kernels dropped per-column VMEM cost), so
# 10-12-dim latent models (lgssm_nd, VRNN-sized states) stay fused.
MAX_FUSED_COLUMNS = 12


def sample_ancestral_index_and_resample(log_weight, key, value,
                                        method: str = "systematic",
                                        implementation="auto",
                                        need_indices: bool = True):
    """Samples ancestor indices AND redistributes `value` in one shot.

    On the pallas path with few feature columns, the particle gather is
    FUSED into the resampling kernel's merge pass (one kernel instead of
    resample + gather); otherwise indices and gather run separately.
    Systematic resampling routes to the v5 flipped-merge kernel, which
    generates the position grid in-kernel (no [B, K] positions array, no
    cross-lane relayouts on the hot path).

    With `need_indices=False` (caller wants neither lineage tracing nor
    ancestor outputs) the v5 kernel skips the index computation and
    returns indices=None.

    Returns (indices `[B, K]` int32 - detached - or None, resampled
    value pytree).
    """
    if method not in _VARIANTS:
        raise ValueError(
            f"method must be one of {METHODS}. currently = {method}")
    log_weight = jnp.asarray(log_weight)
    _check_nan_eager(log_weight)
    log_weight = jax.lax.stop_gradient(log_weight)
    if implementation == "auto":
        implementation = _auto_implementation(log_weight, method)

    if callable(implementation) and getattr(implementation, "fused", False):
        if getattr(implementation, "soft", False):
            raise ValueError(
                "got a soft fused resampler (returns corrected weights) "
                "for plain resampling; use resampling_method='soft' / "
                "soft_resample_and_gather with it instead")
        # e.g. parallel.make_distributed_fused_resampler: indices and the
        # cross-shard particle exchange in one shard_map.
        return implementation(log_weight, key, value)

    if implementation == "xla" and method != "residual" and \
            log_weight.shape[1] <= DENSE_GATHER_MAX_K:
        leaves = jax.tree_util.tree_leaves(value)
        if all(jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.floating)
               for leaf in leaves):
            pos = resampling_positions(log_weight, key, method)
            return dense_indices_and_gather(log_weight, pos, value)

    if implementation == "pallas" and method == "residual":
        raise ValueError(
            "residual resampling has no fused kernel path; use "
            "implementation='xla' or 'auto'")
    if implementation == "pallas":
        columns, rebuild = _split_columns(value)
        if columns is not None and len(columns) <= MAX_FUSED_COLUMNS:
            from .ops import resample_pallas
            k = log_weight.shape[1]
            if method == "systematic":
                # v5 fast path: same PRNG stream (one uniform per row),
                # positions rebuilt inside the kernel. Whole-row VMEM
                # blocks to ~2M particles; beyond, the windowed v5-HBM
                # layout (512-row chunks, routed inside
                # resample_and_gather_systematic) covers ANY K at
                # 1.5-1.9x the v1 merge (measured to 12M, round 4).
                batch_size = log_weight.shape[0]
                u = jax.random.uniform(key, (batch_size, 1),
                                       dtype=jnp.result_type(float))
                idx, gathered = \
                    resample_pallas.resample_and_gather_systematic(
                        need_indices, log_weight, u, tuple(columns))
                return idx, rebuild(list(gathered))
            pos = resample_pallas.resampling_positions(
                log_weight, key, method)
            if not resample_pallas.v5_fits(k, k, len(columns)):
                # Large-K path: CDF in XLA; HBM sizes route to the
                # windowed v5-HBM layout inside resample_and_gather_cdf
                # (round 4 - a few MB of scratch at any K, so ALL
                # columns fuse into one call; the old whole-row scratch
                # forced one value column per call).
                cdf = _normalized_cumsum(log_weight)
                chunks = max(1, -(-k // resample_pallas.LARGE_K_CHUNK))
                hbm = k > resample_pallas.VMEM_RESIDENT_PARTICLES
                if hbm:
                    idx, gathered = resample_pallas.resample_and_gather_cdf(
                        chunks, True, cdf, pos, tuple(columns))
                    return idx, rebuild(list(gathered))
                idx = None
                gathered = []
                for col in columns:
                    idx, g = resample_pallas.resample_and_gather_cdf(
                        chunks, False, cdf, pos, (col,))
                    gathered.append(g[0])
                return idx, rebuild(gathered)
            idx, gathered = resample_pallas.resample_and_gather(
                log_weight, pos, tuple(columns))
            return idx, rebuild(list(gathered))

    idx = sample_ancestral_index(log_weight, key, method=method,
                                 implementation=implementation)
    return idx, resample_particles(value, idx,
                                   implementation=implementation)


def resample_particles(value, ancestral_index, implementation="xla"):
    """Gathers particles by ancestor index, exploiting sortedness.

    All three samplers here emit NONDECREASING indices (systematic and
    stratified by construction; multinomial returns order statistics), so
    when `implementation == 'pallas'` the fused sorted-gather kernel
    replaces XLA's minor-axis gather (~1.25 ms -> merge-scan at
    [10, 10k] on v5e). Integer leaves ride the same kernel via the
    exact f32 transport used by `_split_columns` (round-5 discrete-path
    fix); only 64-bit ints fall back to the XLA gather. For arbitrary
    (unsorted) indices use `state.resample`.
    """
    from . import state as _state

    if implementation != "pallas":
        return _state.resample(value, ancestral_index)

    from .ops import gather_pallas

    idx = jnp.asarray(ancestral_index)

    def gather(leaf):
        leaf = jnp.asarray(leaf)
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            return gather_pallas.gather_sorted_pallas(leaf, idx)
        if str(leaf.dtype) in _SMALL_INT_DTYPES:
            return gather_pallas.gather_sorted_pallas(
                leaf.astype(jnp.float32), idx).astype(leaf.dtype)
        if str(leaf.dtype) in ("int32", "uint32"):
            sixteen = jnp.asarray(16, leaf.dtype)
            mask = jnp.asarray(0xFFFF, leaf.dtype)
            enc = jnp.stack([jnp.bitwise_and(leaf, mask),
                             jnp.right_shift(leaf, sixteen)],
                            axis=-1).astype(jnp.float32)
            g = gather_pallas.gather_sorted_pallas(enc, idx)
            lo = g[..., 0].astype(leaf.dtype)
            hi = g[..., 1].astype(leaf.dtype)
            return jnp.bitwise_or(jnp.left_shift(hi, sixteen),
                                  jnp.bitwise_and(lo, mask))
        return _state.resample(leaf, idx)

    return jax.tree_util.tree_map(gather, value)


def soft_indices_and_weights(log_weight, key, alpha: float = 0.5):
    """Differentiable ('soft') resampling, Karkus et al. 2018 style.

    Samples ancestors multinomially from the tempered mixture
    q = alpha * w + (1 - alpha) / K and returns corrected next-step
    log-weights log(w[a] / q[a]) so the estimator stays unbiased while
    gradients flow into the pre-resampling weights. Not in the reference
    (stretch goal, BASELINE.json:11).

    Returns:
        (indices `[B, K]` int32 - detached,
         corrected log-weights `[B, K]` - differentiable w.r.t. log_weight)
    """
    log_weight = jnp.asarray(log_weight)
    log_w, log_q = _soft_tempered_log_weights(log_weight, alpha)
    idx = multinomial_indices(jax.lax.stop_gradient(log_q), key)
    log_w_sel = jnp.take_along_axis(log_w, idx, axis=1)
    log_q_sel = jnp.take_along_axis(log_q, idx, axis=1)
    return idx, log_w_sel - jax.lax.stop_gradient(log_q_sel)


def _soft_tempered_log_weights(log_weight, alpha: float):
    """(log_w, log_q) for soft resampling: normalized log-weights and
    the tempered mixture q = alpha*w + (1-alpha)/K, all in log space
    (underflowed weights would make log(w_sel) = -inf and its gradient
    NaN)."""
    _, num_particles = log_weight.shape
    log_w = amath.lognormexp(log_weight, dim=-1)
    log_q = jnp.logaddexp(
        jnp.log(alpha) + log_w,
        jnp.full_like(log_w, jnp.log((1.0 - alpha) / num_particles))
    ) if alpha < 1.0 else log_w
    return log_w, log_q


def soft_resample_and_gather(log_weight, key, value, alpha: float = 0.5,
                             implementation="auto",
                             need_indices: bool = True):
    """Soft resampling with the particle gather FUSED into the kernel.

    Same estimator as `soft_indices_and_weights` + a separate gather,
    but on the pallas path the latent columns AND the two weight columns
    (log_w, log_q) ride the same merge pass - one kernel instead of
    resample + three gathers. Gradients flow into `log_weight` through
    the gathered log_w column (the fused kernel's VJP differentiates the
    gathered values; indices/positions stay detached), exactly matching
    the unfused formula.

    With `need_indices=False` the fused kernel skips the ancestor-index
    emission (training without lineage outputs) and indices come back
    None; the XLA fallback still returns them.

    Returns (indices - detached - or None, corrected log-weights,
    resampled value).
    """
    log_weight = jnp.asarray(log_weight)
    _check_nan_eager(log_weight)
    if callable(implementation):
        if not getattr(implementation, "soft", False):
            raise ValueError(
                "soft resampling with a callable implementation needs a "
                "soft-aware fused resampler (e.g. "
                "parallel.make_distributed_fused_resampler("
                "method='soft')); got a callable without .soft")
        bound = getattr(implementation, "soft_alpha", None)
        if bound is not None and bound != alpha:
            raise ValueError(
                f"the distributed soft resampler was built with "
                f"soft_alpha={bound} but alpha={alpha} was requested; "
                f"rebuild it with the matching soft_alpha")
        return implementation(jnp.asarray(log_weight), key, value)
    _, num_particles = log_weight.shape
    if implementation == "auto":
        implementation = _auto_implementation(log_weight, "multinomial")

    log_w, log_q = _soft_tempered_log_weights(log_weight, alpha)
    lq_det = jax.lax.stop_gradient(log_q)

    if implementation == "pallas":
        columns, rebuild = _split_columns(value)
        from .ops import resample_pallas
        if (columns is not None
                and len(columns) + 2 <= MAX_FUSED_COLUMNS
                and resample_pallas.v5_fits(num_particles, num_particles,
                                            len(columns) + 2)):
            # Same PRNG stream AND the same strictly-below-1.0 clamp as
            # multinomial_indices(log_q, key).
            pos = resampling_positions(lq_det, key, "multinomial")
            idx, gathered = resample_pallas.resample_and_gather(
                lq_det, pos, tuple(columns) + (log_w, log_q),
                emit_idx=need_indices)
            val_cols = list(gathered[:-2])
            log_w_sel, log_q_sel = gathered[-2], gathered[-1]
            corrected = log_w_sel - jax.lax.stop_gradient(log_q_sel)
            return idx, corrected, rebuild(val_cols)

    # Unfused fallback, reusing the log_w/log_q computed above.
    idx = multinomial_indices(lq_det, key)
    log_w_sel = jnp.take_along_axis(log_w, idx, axis=1)
    log_q_sel = jnp.take_along_axis(log_q, idx, axis=1)
    corrected = log_w_sel - jax.lax.stop_gradient(log_q_sel)
    return idx, corrected, resample_particles(
        value, idx,
        implementation="pallas" if implementation == "pallas" else "xla")

