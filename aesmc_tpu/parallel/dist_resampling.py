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
5. particle exchange: all_gather of the source particles + local gather
   of the owned output slots (on TPU, fused with the search in one Pallas
   merge kernel via `distributed_systematic_resample`).

Gradients: indices are integers (no gradient), and callers stop-gradient
the weights, matching /root/reference/aesmc/inference.py:254.

The same `u` uniform must be used on every shard: pass the *same* PRNG key
replicated (shard_map in_specs P() for the key).
"""

from __future__ import annotations

import functools
import math as _stdmath

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import math as _math
from .. import resampling as _resampling


def _distributed_positions(key, method: str, batch_size: int,
                           k_local: int, axis_name: str,
                           data_axis_name: str | None):
    """This shard's slice `[B, K_local]` of the GLOBAL sorted inverse-CDF
    query positions of `resampling.resampling_positions(...)`.

    Randomness is drawn over the GLOBAL batch x particle grid and then
    sliced, so the stream is independent of the mesh layout and
    bit-matches the single-device sampler with the same key (the
    threefry generation is elementwise over iota counters, so XLA's
    loop fusion computes only the sliced window - no O(K_global)
    materialization per device).

    Positions are per-shard sorted for every method (systematic/
    stratified strata are slot-aligned; multinomial returns order
    statistics), which is what the Pallas merge kernels and the ring
    ownership masks rely on.
    """
    n = jax.lax.axis_size(axis_name)
    d = jax.lax.axis_index(axis_name)
    k_global = k_local * n
    dtype = jnp.result_type(float)
    below_one = jnp.nextafter(jnp.asarray(1.0, dtype),
                              jnp.asarray(0.0, dtype))
    if data_axis_name is not None:
        n_data = jax.lax.axis_size(data_axis_name)
        d_data = jax.lax.axis_index(data_axis_name)
        b_global = batch_size * n_data
        row0 = d_data * batch_size
    else:
        b_global = batch_size
        row0 = 0

    if method == "systematic":
        u_global = jax.random.uniform(key, (b_global, 1), dtype=dtype)
        u = jax.lax.dynamic_slice(u_global, (row0, 0), (batch_size, 1))
        slots = d * k_local + jnp.arange(k_local, dtype=dtype)
        pos = (u + slots) / k_global
    elif method == "stratified":
        u_global = jax.random.uniform(key, (b_global, k_global),
                                      dtype=dtype)
        u = jax.lax.dynamic_slice(u_global, (row0, d * k_local),
                                  (batch_size, k_local))
        slots = d * k_local + jnp.arange(k_local, dtype=dtype)
        pos = (u + slots) / k_global
    elif method == "multinomial":
        # Sorted-uniform order statistics via exponential spacings
        # (resampling._multinomial_positions): pos_j = S_j / S_{K+1}.
        # Each shard cumsums its slice; the shard prefix and the grand
        # total (including the extra K+1-th draw) come from one
        # n-scalar all_gather - the same layout as the CDF
        # normalization.
        e_global = jax.random.exponential(
            key, (b_global, k_global + 1), dtype=dtype)
        e = jax.lax.dynamic_slice(e_global, (row0, d * k_local),
                                  (batch_size, k_local))
        e_last = jax.lax.dynamic_slice(
            e_global, (row0, k_global), (batch_size, 1))[:, 0]
        local_cs = jnp.cumsum(e, axis=-1)                    # [B, K_local]
        local_sum = local_cs[:, -1]                          # [B]
        all_sums = jax.lax.all_gather(local_sum, axis_name)  # [n, B]
        total = jnp.sum(all_sums, axis=0) + e_last           # [B]
        prefix = jnp.cumsum(all_sums, axis=0) - all_sums     # exclusive
        my_prefix = jnp.take(prefix, d, axis=0)              # [B]
        pos = (my_prefix[:, None] + local_cs) / total[:, None]
    else:
        raise ValueError(f"unsupported method: {method}")
    return jnp.minimum(pos, below_one)


def _global_cdf_and_positions(log_weight, key, axis_name: str,
                              data_axis_name: str | None,
                              method: str = "systematic"):
    """Shared first half of distributed resampling: the replicated
    global CDF `[B, K]` and this shard's sorted position grid
    `[B, K_local]` (randomness drawn over the GLOBAL grid so it is
    independent of the mesh layout)."""
    log_weight = jax.lax.stop_gradient(jnp.asarray(log_weight))
    batch_size, k_local = log_weight.shape
    n = jax.lax.axis_size(axis_name)
    d = jax.lax.axis_index(axis_name)
    k_global = k_local * n

    # Distributed normalization. The local cumsum is cummax'd and the
    # shard sum taken from its LAST ELEMENT (not a separate jnp.sum),
    # so the concatenated global CDF is monotone within and across
    # shards (see resampling._normalized_cumsum on why).
    local_max = jnp.max(log_weight, axis=1, keepdims=True)
    global_max = jax.lax.pmax(local_max, axis_name)
    w = jnp.exp(log_weight - global_max)                     # [B, K_local]
    local_cumsum = jax.lax.cummax(jnp.cumsum(w, axis=1), axis=1)
    local_sum = local_cumsum[:, -1]                          # [B]
    all_sums = jax.lax.all_gather(local_sum, axis_name)      # [n, B]
    total = jnp.sum(all_sums, axis=0)                        # [B]
    prefix = jnp.cumsum(all_sums, axis=0) - all_sums         # exclusive
    my_prefix = prefix[d]                                    # [B]

    # Global CDF: local slice, then replicate.
    local_cum = (my_prefix[:, None] + local_cumsum) / total[:, None]
    cum_slices = jax.lax.all_gather(local_cum, axis_name, axis=1)
    global_cum = cum_slices.reshape(batch_size, k_global)
    # Reference renormalization hack: force the last edge to exactly 1
    # (/root/reference/aesmc/inference.py:259-261). The explicit pin
    # matters: XLA lowers x/y as x*reciprocal(y), so x/x can be 1 +- eps
    # and positions (clamped < 1) need a strictly-greater last edge.
    global_cum = global_cum / global_cum[:, -1:]
    global_cum = jnp.concatenate(
        [global_cum[:, :-1], jnp.ones_like(global_cum[:, -1:])], axis=1)

    pos = _distributed_positions(key, method, batch_size, k_local,
                                 axis_name, data_axis_name)
    return global_cum, pos.astype(global_cum.dtype), k_global


def _use_pallas(k_global: int) -> bool:
    """Route the per-shard global-CDF search / gather through the fused
    Pallas kernel on real TPUs (XLA searchsorted costs ~17 ms at K=100k;
    the merge kernel is O(K) in one VMEM pass)."""
    try:
        if jax.default_backend() != "tpu":
            return False
    except Exception:
        return False
    try:
        from ..ops import resample_pallas
        return (resample_pallas.AVAILABLE and
                k_global <= resample_pallas.MAX_KERNEL_PARTICLES)
    except ImportError:
        return False


def distributed_resampling_indices(log_weight, key, axis_name: str,
                                   data_axis_name: str | None = None,
                                   method: str = "systematic"):
    """Resampling inside `shard_map`; particle axis sharded.

    Args:
        log_weight: local shard `[B, K_local]` of the global `[B, K]`
            unnormalized log-weights.
        key: PRNG key, REPLICATED across the axis (same value everywhere).
        axis_name: mesh axis name the particle dim is sharded over.
        data_axis_name: mesh axis name the batch dim is sharded over, or
            None if the batch is not sharded.
        method: 'systematic' | 'stratified' | 'multinomial' (all three
            have per-shard sorted position grids, so the same owned-slot
            machinery serves them; BASELINE.json configs 2-3 name the
            latter two).

    Returns:
        `[B, K_local]` int32 GLOBAL ancestor indices for the output slots
        this shard owns (slots `[d*K_local, (d+1)*K_local)`).
    """
    global_cum, pos, k_global = _global_cdf_and_positions(
        log_weight, key, axis_name, data_axis_name, method=method)
    if _use_pallas(k_global):
        from ..ops import resample_pallas
        idx = resample_pallas.searchsorted_sorted_cdf_pallas(global_cum, pos)
    else:
        find = functools.partial(jnp.searchsorted, side="right")
        idx = jax.vmap(find)(global_cum, pos)
    return jnp.clip(idx, 0, k_global - 1).astype(jnp.int32)


def distributed_systematic_indices(log_weight, key, axis_name: str,
                                   data_axis_name: str | None = None):
    """Systematic special case of `distributed_resampling_indices`."""
    return distributed_resampling_indices(
        log_weight, key, axis_name, data_axis_name, method="systematic")


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


def distributed_systematic_resample(log_weight, key, value, axis_name: str,
                                    data_axis_name: str | None = None,
                                    method: str = "systematic"):
    """Fused distributed resampling inside `shard_map`: global ancestor
    indices AND redistributed particles in one pass.

    On TPU the inverse-CDF search of the gathered global CDF and the
    particle gather run in ONE Pallas merge kernel (CDF length K_global,
    position length K_local); elsewhere XLA search + gather. Returns
    (indices `[B, K_local]`, value pytree with `[B, K_local, ...]`
    leaves). `method` selects the position grid (systematic/stratified/
    multinomial; all per-shard sorted).
    """
    global_cum, pos, k_global = _global_cdf_and_positions(
        log_weight, key, axis_name, data_axis_name, method=method)

    leaves, treedef = jax.tree_util.tree_flatten(value)
    gathered_full = [jax.lax.all_gather(jnp.asarray(leaf), axis_name,
                                        axis=1, tiled=True)
                     for leaf in leaves]
    fusable = _use_pallas(k_global) and all(
        jnp.issubdtype(f.dtype, jnp.floating) for f in gathered_full)

    if fusable:
        from ..ops import resample_pallas
        columns = []
        dims = []
        for full in gathered_full:
            b, kg = full.shape[:2]
            flat = full.reshape(b, kg, -1)
            dims.append(flat.shape[-1])
            for dcol in range(flat.shape[-1]):
                columns.append(flat[:, :, dcol])
        idx, gathered_cols = resample_pallas.resample_and_gather_cdf(
            1, False, global_cum, pos, tuple(columns))
        idx = jnp.clip(idx, 0, k_global - 1).astype(jnp.int32)
        out_leaves = []
        it = iter(gathered_cols)
        for full, d, leaf in zip(gathered_full, dims, leaves):
            cols = [next(it) for _ in range(d)]
            stacked = jnp.stack(cols, axis=-1)
            out_leaves.append(stacked.reshape(jnp.asarray(leaf).shape))
        return idx, jax.tree_util.tree_unflatten(treedef, out_leaves)

    find = functools.partial(jnp.searchsorted, side="right")
    idx = jnp.clip(jax.vmap(find)(global_cum, pos),
                   0, k_global - 1).astype(jnp.int32)
    out_leaves = []
    for full, leaf in zip(gathered_full, leaves):
        expanded = idx.reshape(idx.shape + (1,) * (full.ndim - 2))
        out_leaves.append(jnp.take_along_axis(full, expanded, axis=1))
    return idx, jax.tree_util.tree_unflatten(treedef, out_leaves)


def _normalization_terms(log_weight, axis_name):
    """Distributed weight normalization shared by both exchanges:
    returns (w, local_cumsum [B, K_local], all_sums [n, B], total [B],
    prefix [n, B], renorm [B]) where `renorm` equals the all_gather
    path's `global_cum[:, -1]` (the reference's renormalize-by-last
    hack) bit-for-bit."""
    local_max = jnp.max(log_weight, axis=1, keepdims=True)
    global_max = jax.lax.pmax(local_max, axis_name)
    w = jnp.exp(log_weight - global_max)                     # [B, K_local]
    # Monotone local cumsum; shard sum = its last element (see
    # _global_cdf_and_positions on why).
    local_cumsum = jax.lax.cummax(jnp.cumsum(w, axis=1), axis=1)
    local_sum = local_cumsum[:, -1]                          # [B]
    all_sums = jax.lax.all_gather(local_sum, axis_name)      # [n, B]
    total = jnp.sum(all_sums, axis=0)                        # [B]
    prefix = jnp.cumsum(all_sums, axis=0) - all_sums         # exclusive
    renorm = (prefix[-1] + all_sums[-1]) / total             # [B]
    return w, local_cumsum, all_sums, total, prefix, renorm


def distributed_systematic_resample_streaming(
        log_weight, key, value, axis_name: str,
        data_axis_name: str | None = None,
        method: str = "systematic"):
    """Ring-streaming distributed resampling: indices AND the particle
    exchange with O(K/n) live memory per device.

    The all_gather variant (`distributed_systematic_resample`)
    materializes the full global CDF and particle set on every device -
    O(K) memory, which defeats particle sharding at the 1M x 256 scale
    (VERDICT round 1). Here each shard's (CDF slice, value columns)
    rotates around the particle-axis ring via `ppermute`; on each of the
    n visits a shard searches/gathers ONLY the output positions whose
    mass falls inside the visiting slice (systematic output slots are
    sorted, so each shard's owned positions form a contiguous run per
    source shard). Per-device live memory is O(K/n); total ICI traffic
    matches all_gather (a static-shape lower bound for the worst case -
    XLA has no ragged sends; the blocker at scale was memory, not ICI).

    Results are BIT-IDENTICAL to the all_gather path: the per-slice CDF
    values, the renormalize-by-last hack, and the searchsorted counts
    replicate its arithmetic exactly (ownership masks use the slice
    upper edges, which every shard recomputes from the same n-scalar
    all_gather).

    Args/returns: as `distributed_systematic_resample`.
    """
    log_weight = jax.lax.stop_gradient(jnp.asarray(log_weight))
    batch_size, k_local = log_weight.shape
    n = jax.lax.axis_size(axis_name)
    d = jax.lax.axis_index(axis_name)
    k_global = k_local * n

    w, local_cumsum, all_sums, total, prefix, renorm = \
        _normalization_terms(log_weight, axis_name)
    my_prefix = jnp.take(prefix, d, axis=0)                  # [B]
    local_cum = ((my_prefix[:, None] + local_cumsum) /
                 total[:, None]) / renorm[:, None]           # [B, K_local]
    # Pin the GLOBAL last edge (= the last shard's last entry) to
    # exactly 1.0, mirroring the all_gather path's renormalization (XLA
    # reciprocal-multiply division makes x/x only ~1 +- eps).
    pinned = jnp.concatenate(
        [local_cum[:, :-1], jnp.ones_like(local_cum[:, -1:])], axis=1)
    local_cum = jnp.where(d == n - 1, pinned, local_cum)
    # Upper edge of every shard's slice (same floats on every device).
    edges = ((prefix + all_sums) / total) / renorm           # [n, B]
    edges = jnp.concatenate(
        [edges[:-1], jnp.ones_like(edges[-1:])], axis=0)

    pos = _distributed_positions(key, method, batch_size, k_local,
                                 axis_name, data_axis_name)
    pos = pos.astype(local_cum.dtype)                        # [B, K_local]

    leaves, treedef = jax.tree_util.tree_flatten(value)
    leaves = [jnp.asarray(leaf) for leaf in leaves]
    use_pallas = _use_pallas(k_local) and all(
        jnp.issubdtype(leaf.dtype, jnp.floating) for leaf in leaves)

    def split_columns(leaf_list):
        columns = []
        dims = []
        for leaf in leaf_list:
            flat = leaf.reshape(batch_size, k_local, -1)
            dims.append(flat.shape[-1])
            for c in range(flat.shape[-1]):
                columns.append(flat[:, :, c])
        return columns, dims

    columns, dims = split_columns(leaves)
    perm = [(i, (i - 1) % n) for i in range(n)]              # pull ring

    idx = jnp.zeros((batch_size, k_local), jnp.int32)
    gathered = [jnp.zeros_like(col) for col in columns]
    visiting_cum = local_cum
    visiting_cols = columns
    for step in range(n):
        src = (d + step) % n                                 # [] traced
        lo = jnp.where(src == 0, jnp.zeros_like(total),
                       jnp.take(edges, jnp.maximum(src - 1, 0), axis=0))
        hi = jnp.take(edges, src, axis=0)
        mask = jnp.logical_and(pos >= lo[:, None], pos < hi[:, None])

        if use_pallas:
            from ..ops import resample_pallas
            local_idx, local_gath = \
                resample_pallas.resample_and_gather_cdf(
                    1, False, visiting_cum, pos, tuple(visiting_cols))
        else:
            find = functools.partial(jnp.searchsorted, side="right")
            local_idx = jax.vmap(find)(visiting_cum, pos)
            safe = jnp.clip(local_idx, 0, k_local - 1)
            local_gath = [jnp.take_along_axis(col, safe, axis=1)
                          for col in visiting_cols]
        local_idx = jnp.clip(local_idx, 0, k_local - 1).astype(jnp.int32)
        idx = jnp.where(mask, src.astype(jnp.int32) * k_local + local_idx,
                        idx)
        gathered = [jnp.where(mask, g, acc)
                    for g, acc in zip(local_gath, gathered)]

        if step < n - 1:
            visiting_cum = jax.lax.ppermute(visiting_cum, axis_name, perm)
            visiting_cols = [jax.lax.ppermute(col, axis_name, perm)
                             for col in visiting_cols]

    out_leaves = []
    it = iter(gathered)
    for leaf, dim in zip(leaves, dims):
        cols = [next(it) for _ in range(dim)]
        out_leaves.append(jnp.stack(cols, axis=-1).reshape(leaf.shape))
    return idx, jax.tree_util.tree_unflatten(treedef, out_leaves)


def distributed_soft_resample(log_weight, key, value, axis_name: str,
                              alpha: float = 0.5,
                              data_axis_name: str | None = None,
                              exchange: str = "allgather"):
    """Distributed differentiable ('soft') resampling inside `shard_map`.

    The sharded-particle-axis version of
    `resampling.soft_resample_and_gather` (Karkus et al. 2018, the
    BASELINE config-5 resampler): ancestors are drawn multinomially from
    the tempered mixture q = alpha*w + (1-alpha)/K and the next-step
    weights carry the correction log(w[a]/q[a]), so the estimator stays
    unbiased while gradients flow into the pre-resampling weights.

    Distribution of the math:
    - the weight normalization is a distributed logsumexp (pmax + psum
      over ICI, `math.distributed_logsumexp`);
    - the tempering is elementwise on the local shard;
    - the multinomial positions, the q-CDF, the index search and the
      particle exchange reuse the systematic machinery (multinomial
      positions are per-shard sorted order statistics);
    - the gathered log_w / log_q columns RIDE THE SAME EXCHANGE as the
      particle columns (all_gather or ring ppermute), so the correction
      is computed from values that arrived over ICI - and the exchange
      is differentiable (take_along_axis / the Pallas kernel's
      transposed-merge VJP), so d(corrected)/d(log_weight) matches the
      single-device formula.

    Args:
        log_weight: local shard `[B, K_local]` (differentiable).
        key: PRNG key, replicated.
        value: pytree of `[B, K_local, ...]` leaves.
        alpha: tempering in (0, 1]; alpha=1 is plain multinomial.
        axis_name / data_axis_name: mesh axis names.
        exchange: 'allgather' or 'ring' (O(K/n) live memory).

    Returns:
        (indices `[B, K_local]` int32 - detached,
         corrected log-weights `[B, K_local]` - differentiable,
         resampled value pytree).
    """
    log_weight = jnp.asarray(log_weight)
    n = jax.lax.axis_size(axis_name)
    k_global = log_weight.shape[1] * n
    # Distributed lognormexp (differentiable w.r.t. log_weight).
    log_w = log_weight - _math.distributed_logsumexp(
        log_weight, axis_name, axis=1)[:, None]
    log_q = jnp.logaddexp(
        jnp.log(alpha) + log_w,
        jnp.full_like(log_w, jnp.log((1.0 - alpha) / k_global))
    ) if alpha < 1.0 else log_w
    lq_det = jax.lax.stop_gradient(log_q)

    body = (distributed_systematic_resample if exchange == "allgather"
            else distributed_systematic_resample_streaming)
    idx, (val, log_w_sel, log_q_sel) = body(
        lq_det, key, (value, log_w, log_q), axis_name,
        data_axis_name=data_axis_name, method="multinomial")
    corrected = log_w_sel - jax.lax.stop_gradient(log_q_sel)
    return idx, corrected, val


def make_distributed_fused_resampler(mesh: Mesh,
                                     data_axis: str = "data",
                                     particle_axis: str = "particle",
                                     exchange: str = "allgather",
                                     method: str = "systematic",
                                     soft_alpha: float = 0.5):
    """A FUSED `(log_weight, key, value) -> (indices, value)` callable for
    `infer(resampling_implementation=...)`: indices and the particle
    exchange run in one shard_map (one Pallas merge kernel per shard per
    ring step on TPU). The engine detects the `.fused` attribute and
    skips its own gather.

    `exchange`: 'allgather' (replicates the global CDF + particles per
    device - fastest at small K) or 'ring' (streaming ppermute exchange,
    O(K/n) live memory per device - the layout for config-5 scale;
    bit-identical results).

    `method`: 'systematic' | 'stratified' | 'multinomial' | 'soft'.
    With 'soft' the returned callable carries `.soft = True`, takes the
    same `(log_weight, key, value)` arguments and returns
    `(indices, corrected_log_weights, value)` - differentiable soft
    resampling sharded over the mesh (BASELINE config 5); the tempering
    is `soft_alpha`, bound here (the engine validates its
    `soft_resampling_alpha` against `.soft_alpha`).
    """
    if exchange not in ("allgather", "ring"):
        raise ValueError(f"exchange must be 'allgather' or 'ring'. "
                         f"currently = {exchange}")
    if method not in _resampling.METHODS + ("soft",):
        raise ValueError(
            f"method must be one of {_resampling.METHODS + ('soft',)}. "
            f"currently = {method}")

    def _specs_for(value):
        leaves, treedef = jax.tree_util.tree_flatten(value)
        leaf_specs = [P(data_axis, particle_axis,
                        *([None] * (jnp.ndim(leaf) - 2)))
                      for leaf in leaves]
        return jax.tree_util.tree_unflatten(treedef, leaf_specs)

    if method == "soft":
        def resampler(log_weight, key, value):
            value_specs = _specs_for(value)
            f = jax.shard_map(
                lambda lw, v, k: distributed_soft_resample(
                    lw, k, v, particle_axis, alpha=soft_alpha,
                    data_axis_name=data_axis, exchange=exchange),
                mesh=mesh,
                in_specs=(P(data_axis, particle_axis), value_specs, P()),
                out_specs=(P(data_axis, particle_axis),
                           P(data_axis, particle_axis), value_specs),
                check_vma=False)
            return f(log_weight, value, key)

        resampler.fused = True
        resampler.soft = True
        resampler.soft_alpha = soft_alpha
        return resampler

    body = (distributed_systematic_resample if exchange == "allgather"
            else distributed_systematic_resample_streaming)

    def resampler(log_weight, key, value):
        value_specs = _specs_for(value)
        f = jax.shard_map(
            lambda lw, v, k: body(
                lw, k, v, particle_axis, data_axis_name=data_axis,
                method=method),
            mesh=mesh,
            in_specs=(P(data_axis, particle_axis), value_specs, P()),
            out_specs=(P(data_axis, particle_axis), value_specs),
            check_vma=False)
        return f(log_weight, value, key)

    resampler.fused = True
    return resampler


def make_distributed_ot_resampler(mesh: Mesh,
                                  data_axis: str = "data",
                                  particle_axis: str = "particle",
                                  epsilon: float = 0.5,
                                  num_iterations: int = 50,
                                  scale_cost: bool = True):
    """A `(log_weight, value) -> (value, new_log_weight)` callable for
    `infer(resampling_method='ot', resampling_implementation=...)`:
    DISTRIBUTED entropy-regularized ensemble-transport resampling over
    the sharded particle axis (ring-streamed Sinkhorn,
    `ot.distributed_ot_resample`). Each device does O(K_local *
    K_global) cost work per update - strong scaling of the O(K^2)
    total that made single-device OT unusable at config-5 scale.
    Carries `.ot = True`; epsilon/iterations are bound here (the
    engine's ot_* knobs are ignored when a callable is given).
    """
    from .. import ot as _ot

    def resampler(log_weight, value):
        leaves, treedef = jax.tree_util.tree_flatten(value)
        leaf_specs = [P(data_axis, particle_axis,
                        *([None] * (jnp.ndim(leaf) - 2)))
                      for leaf in leaves]
        value_specs = jax.tree_util.tree_unflatten(treedef, leaf_specs)
        f = jax.shard_map(
            lambda lw, v: _ot.distributed_ot_resample(
                lw, v, particle_axis, epsilon=epsilon,
                num_iterations=num_iterations, scale_cost=scale_cost),
            mesh=mesh,
            in_specs=(P(data_axis, particle_axis), value_specs),
            out_specs=(value_specs, P(data_axis, particle_axis)),
            check_vma=False)
        return f(log_weight, value)

    resampler.ot = True
    return resampler


def make_distributed_resampler(mesh: Mesh,
                               data_axis: str = "data",
                               particle_axis: str = "particle",
                               method: str = "systematic"):
    """A `(log_weight, key) -> indices` callable with explicit collectives.

    Signature-compatible with the `implementation=` hook of
    `aesmc_tpu.resampling.sample_ancestral_index` / `infer`: takes global
    `[B, K]` log-weights (sharded `(data, particle)`) and returns global
    `[B, K]` ancestor indices with the same sharding, computed via
    shard_map + ICI collectives instead of letting GSPMD partition the
    single-device formulation. `method` selects systematic/stratified/
    multinomial (BASELINE.json configs 2-3 name the latter two).
    """
    if method not in _resampling.METHODS:
        raise ValueError(
            f"method must be one of {_resampling.METHODS}. "
            f"currently = {method}")

    def resampler(log_weight, key):
        f = jax.shard_map(
            lambda lw, k: distributed_resampling_indices(
                lw, k, particle_axis, data_axis_name=data_axis,
                method=method),
            mesh=mesh,
            in_specs=(P(data_axis, particle_axis), P()),
            out_specs=P(data_axis, particle_axis),
            # pallas_call outputs carry no vma metadata; required for the
            # fused-kernel path inside shard_map.
            check_vma=False)
        return f(log_weight, key)

    return resampler


def make_distributed_systematic_resampler(mesh: Mesh,
                                          data_axis: str = "data",
                                          particle_axis: str = "particle"):
    """Systematic special case of `make_distributed_resampler`."""
    return make_distributed_resampler(mesh, data_axis, particle_axis,
                                      method="systematic")
