"""v5 whole-row blocks at large K: exactness + timing vs the v1 chunked
and HBM-resident regimes.

  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/v5_large_probe.py
"""

import pathlib
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  str(pathlib.Path(__file__).parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import bench  # noqa: E402
from aesmc_tpu import resampling as R  # noqa: E402
from aesmc_tpu.ops import resample_pallas as rp  # noqa: E402

log = bench.log
log(f"backend: {jax.default_backend()}")

for b, k in [(10, 131_072), (4, 524_288), (2, 1_048_576), (1, 2_097_152)]:
    logw = jax.random.normal(jax.random.PRNGKey(0), (b, k)) * 3.0
    value = jax.random.normal(jax.random.PRNGKey(1), (b, k))
    u = jax.random.uniform(jax.random.PRNGKey(2), (b, 1),
                           dtype=jnp.float32)
    cdf = R._normalized_cumsum(logw)
    pos = jnp.minimum((u + jnp.arange(k, dtype=jnp.float32)) / k,
                      jnp.nextafter(jnp.float32(1.0), jnp.float32(0.0)))

    # exactness vs XLA search on the same cdf/pos
    idx_ref = jnp.clip(jax.vmap(lambda c, p: jnp.searchsorted(
        c, p, side="right", method="sort"))(cdf, pos), 0, k - 1)
    g_ref = jnp.take_along_axis(value, idx_ref, axis=1)
    if rp.v5_fits(k, k, 1, systematic=True):
        idx5, (g5,) = jax.jit(lambda c, uu: rp.systematic_search_gather_pallas(
            c, uu, k, (value,)))(cdf, u)
        mi = int((np.asarray(idx5) != np.asarray(idx_ref)).sum())
        gd = float(np.abs(np.asarray(g5) - np.asarray(g_ref)).max())
        log(f"B={b} K={k}: v5 exactness idx mism {mi}/{b*k}, gdev {gd}")

        def chain_v5(carry):
            logw_c, s = carry
            c2 = R._normalized_cumsum(logw_c)
            idx, (g,) = rp.systematic_search_gather_pallas(
                c2, u, k, (value,), emit_idx=False)
            return logw_c + 1e-9 * g, s + jnp.sum(g)

        t0 = time.time()
        dt5 = bench.timed_chained(chain_v5, (logw, jnp.float32(0)),
                                  chain=40)
        log(f"B={b} K={k}: v5 noidx {dt5*1e3:.2f} ms/call "
            f"(compile {time.time()-t0:.0f}s)")

    # v1 regimes for comparison
    chunks = max(1, -(-k // rp.LARGE_K_CHUNK))
    hbm = k > rp.VMEM_RESIDENT_PARTICLES

    def chain_v1(carry):
        logw_c, s = carry
        c2 = R._normalized_cumsum(logw_c)
        if k > rp.MAX_KERNEL_PARTICLES:
            idx, (g,) = rp.searchsorted_sorted_cdf_pallas(
                c2, pos, (value,), chunks=chunks, hbm_resident=hbm)
        else:
            idx, (g,) = rp.searchsorted_sorted_cdf_pallas(c2, pos,
                                                          (value,))
        return logw_c + 1e-9 * g, s + jnp.sum(idx)

    t0 = time.time()
    dt1 = bench.timed_chained(chain_v1, (logw, jnp.float32(0)), chain=40)
    log(f"B={b} K={k}: v1 ({'hbm' if hbm else 'chunked' if chunks > 1 else 'std'}) "
        f"{dt1*1e3:.2f} ms/call (compile {time.time()-t0:.0f}s)")

    # backward at large K through the v5 range kernel
    if rp.v5_fits(k, k, 1, range_sum=True, emit_idx=False):
        gint = jnp.round(jax.random.normal(jax.random.PRNGKey(3),
                                           (b, k)) * 3.0)
        bwd_ref = jax.vmap(lambda gr, ir: jax.ops.segment_sum(
            gr, ir, num_segments=k))(gint, idx_ref)
        (bwd5,) = rp.gather_backward_pallas(cdf, pos, [gint])
        mb = int((np.asarray(bwd5) != np.asarray(bwd_ref)).sum())
        log(f"B={b} K={k}: v5 range backward mism {mb}/{b*k}")

        def chain_bwd(carry):
            logw_c, s = carry
            c2 = R._normalized_cumsum(logw_c)
            (gb,) = rp.gather_backward_pallas(c2, pos, [gint])
            return logw_c + 1e-9 * gb, s + jnp.sum(gb)

        dtb = bench.timed_chained(chain_bwd, (logw, jnp.float32(0)),
                                  chain=40)
        log(f"B={b} K={k}: v5 range backward {dtb*1e3:.2f} ms/call")
