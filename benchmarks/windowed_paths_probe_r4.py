"""Round-4b probe: windowed v5-HBM layout for the REMAINING large-K paths.

The round-4 sweep (BENCH_NOTES "512-row chunk-alignment cliff") measured
the windowed layout only on the fused SYSTEMATIC forward; the router was
flipped there. Three other large-K paths still run older layouts:

  idx       - index-only systematic (`sample_ancestral_index_pallas`):
              whole-row v5-HBM when it fits, else chunked v1.
  sorted    - sorted-position fused search+gather (stratified /
              multinomial / distributed shard search via
              `resample_and_gather_cdf`): whole-row v5-HBM / chunked v1.
  rangesum  - the transposed-merge gather backward
              (`gather_backward_pallas`): whole-row v5-HBM range-sum to
              8M, else chunked v1 range mode.

Each section measures current-route vs windowed (64Ki-position chunks,
rpc=512 - the alignment rule) at the probe Ks, and checks exactness vs
XLA on the first call. argv: sections and/or K values.

Run: PYTHONPATH=/root/repo:/root/.axon_site \
       python benchmarks/windowed_paths_probe_r4.py [idx sorted rangesum] [K ...]
"""
import pathlib
import statistics as stdstats
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  str(pathlib.Path(__file__).resolve().parent.parent /
                      ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from aesmc_tpu import resampling as R  # noqa: E402
from aesmc_tpu.ops import resample_pallas as rp  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def chained(step, init, repeats=3, chain=10):
    @jax.jit
    def run(carry):
        def body(c, _):
            return step(c), None
        carry, _ = jax.lax.scan(body, carry, None, length=chain)
        return carry

    carry = run(init)
    float(jnp.sum(jax.tree_util.tree_leaves(carry)[0][:, :8]))
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        carry = run(init)
        float(jnp.sum(jax.tree_util.tree_leaves(carry)[0][:, :8]))
        ts.append(time.perf_counter() - t0)
    return stdstats.median(ts) / chain


def _searchsorted_ref(cdf, pos):
    k = cdf.shape[1]
    idx = jax.jit(jax.vmap(lambda c, p: jnp.searchsorted(
        c, p, side="right", method="sort")))(cdf, pos)
    return np.asarray(jnp.clip(idx, 0, k - 1))


def _setup(k, b=1):
    logw = jax.random.normal(jax.random.PRNGKey(0), (b, k)) * 3.0
    cdf = R._normalized_cumsum(logw)
    value = jax.random.normal(jax.random.PRNGKey(1), (b, k))
    return logw, cdf, value


def probe_idx(k):
    b = 1
    logw, cdf, _ = _setup(k, b)
    u = jax.random.uniform(jax.random.PRNGKey(2), (b, 1))
    wchunks = rp._hbm_windowed_chunk_count(k)

    # Exactness of the windowed idx-only call.
    pos = jnp.minimum((u + jnp.arange(k, dtype=jnp.float32)) / k,
                      jnp.float32(rp._BELOW_ONE))
    want = _searchsorted_ref(cdf, pos)
    got, _ = rp.systematic_search_gather_pallas(
        cdf, u, k, (), hbm_chunks=wchunks, hbm_windowed=True)
    mism = int((np.asarray(got) != want).sum())
    log(f"idx K={k}: windowed exactness mismatches {mism}/{b*k}")
    assert mism == 0

    def cur_step(carry):
        logw, key = carry
        key, sub = jax.random.split(key)
        idx = rp.sample_ancestral_index_pallas(logw, sub, "systematic")
        return logw + 1e-9 * idx[:, :1], key

    def win_step(carry):
        logw, key = carry
        key, sub = jax.random.split(key)
        uu = jax.random.uniform(sub, (b, 1))
        c = R._normalized_cumsum(logw)
        idx, _ = rp.systematic_search_gather_pallas(
            c, uu, k, (), hbm_chunks=wchunks, hbm_windowed=True)
        return logw + 1e-9 * idx[:, :1], key

    init = (logw, jax.random.PRNGKey(3))
    t_cur = chained(cur_step, init)
    t_win = chained(win_step, init)
    log(f"idx K={k}: current {t_cur*1e3:.2f} ms  windowed "
        f"{t_win*1e3:.2f} ms  ratio {t_cur/t_win:.2f}x")


def probe_sorted(k):
    b = 1
    logw, cdf, value = _setup(k, b)
    # Stratified positions: sorted, one uniform per slot.
    pos = R.resampling_positions(logw, jax.random.PRNGKey(2),
                                 "stratified")
    wchunks = rp._hbm_windowed_chunk_count(k)
    v1_chunks = rp._hbm_chunk_count(k)

    want = _searchsorted_ref(cdf, pos)
    got, (g,) = rp.sorted_search_gather_pallas(
        cdf, pos, (value,), hbm_chunks=wchunks, hbm_windowed=True)
    mism = int((np.asarray(got) != want).sum())
    gdev = float(np.abs(np.asarray(g) - np.asarray(jnp.take_along_axis(
        value, jnp.asarray(want), axis=1))).max())
    log(f"sorted K={k}: windowed exactness mismatches {mism}/{b*k} "
        f"gather dev {gdev}")
    assert mism == 0 and gdev == 0.0

    def cur_step(carry):
        v, key = carry
        key, sub = jax.random.split(key)
        p = R.resampling_positions(logw, sub, "stratified")
        _, (g,) = rp.resample_and_gather_cdf(v1_chunks, True, cdf, p,
                                             (v,))
        return g, key

    def win_step(carry):
        v, key = carry
        key, sub = jax.random.split(key)
        p = R.resampling_positions(logw, sub, "stratified")
        _, (g,) = rp.sorted_search_gather_pallas(
            cdf, p, (v,), hbm_chunks=wchunks, hbm_windowed=True)
        return g, key

    init = (value, jax.random.PRNGKey(3))
    t_cur = chained(cur_step, init)
    t_win = chained(win_step, init)
    log(f"sorted K={k}: current {t_cur*1e3:.2f} ms  windowed "
        f"{t_win*1e3:.2f} ms  ratio {t_cur/t_win:.2f}x")


def probe_rangesum(k):
    b = 1
    logw, cdf, _ = _setup(k, b)
    u = jax.random.uniform(jax.random.PRNGKey(2), (b, 1))
    pos = jnp.minimum((u + jnp.arange(k, dtype=jnp.float32)) / k,
                      jnp.float32(rp._BELOW_ONE))
    gint = jnp.round(jax.random.normal(jax.random.PRNGKey(3),
                                       (b, k)) * 3.0)
    wchunks = rp._hbm_windowed_chunk_count(k)
    v1_chunks = rp._hbm_chunk_count(k)
    lower = jnp.concatenate([jnp.zeros_like(cdf[:, :1]), cdf[:, :-1]], 1)
    upper = jnp.concatenate([cdf[:, :-1],
                             jnp.full_like(cdf[:, :1], 2.0)], 1)

    idx_ref = _searchsorted_ref(cdf, pos)
    want = np.asarray(jax.vmap(lambda g, i: jax.ops.segment_sum(
        g, i, num_segments=k))(gint, jnp.asarray(idx_ref)))
    _, (got,) = rp.range_sum_pallas(pos, lower, upper, [gint],
                                    hbm_chunks=wchunks,
                                    hbm_windowed=True)
    mism = int((np.asarray(got) != want).sum())
    log(f"rangesum K={k}: windowed exactness mismatches {mism}/{b*k}")
    assert mism == 0

    def cur_step(carry):
        g, key = carry
        (out,) = rp.gather_backward_pallas(cdf, pos, [g],
                                           chunks=v1_chunks,
                                           hbm_resident=True)
        return out, key

    def win_step(carry):
        g, key = carry
        _, (out,) = rp.range_sum_pallas(pos, lower, upper, [g],
                                        hbm_chunks=wchunks,
                                        hbm_windowed=True)
        return out, key

    init = (gint, jax.random.PRNGKey(4))
    t_cur = chained(cur_step, init)
    t_win = chained(win_step, init)
    log(f"rangesum K={k}: current {t_cur*1e3:.2f} ms  windowed "
        f"{t_win*1e3:.2f} ms  ratio {t_cur/t_win:.2f}x")


def main():
    log("backend:", jax.default_backend())
    args = sys.argv[1:]
    sections = [a for a in args if not a.isdigit()] or \
        ["idx", "sorted", "rangesum"]
    # 8,000,000: the current whole-row chunking lands on rpc=1016
    # (misaligned - the collapse case); 8,388,608: rpc=1024 (aligned -
    # the whole-row lucky case). Both matter for the routing decision.
    ks = [int(a) for a in args if a.isdigit()] or \
        [8_000_000, 8_388_608]
    for k in ks:
        for s in sections:
            {"idx": probe_idx, "sorted": probe_sorted,
             "rangesum": probe_rangesum}[s](k)


if __name__ == "__main__":
    main()
