"""Micro-benchmark of the fused resampling kernel variants on TPU.

Times JUST the kernel (chained inside one jit to amortize the relay
RPC): index-only vs fused 1-value gather, at the headline shape
B=10, K=10000.

  AESMC_MERGE_ROWS=4 PYTHONPATH=/root/repo:/root/.axon_site \
      python benchmarks/kernel_probe.py
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

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import bench  # noqa: E402
from aesmc_tpu.ops import resample_pallas as rp  # noqa: E402

log = bench.log
B, K = 10, 10000
log(f"backend: {jax.default_backend()} MERGE_ROWS={rp.MERGE_ROWS} "
    f"B={B} K={K}")

key = jax.random.PRNGKey(0)
logw = jax.random.normal(key, (B, K))
value = jax.random.normal(jax.random.PRNGKey(1), (B, K))


def chain_idx(carry):
    logw_c, s = carry
    pos = rp.resampling_positions(logw_c, jax.random.PRNGKey(2),
                                  "systematic")
    idx = rp.searchsorted_cdf_pallas(logw_c, pos)
    return logw_c + 1e-9 * idx.astype(logw_c.dtype), s + jnp.sum(idx)


def chain_fused(carry):
    logw_c, s = carry
    pos = rp.resampling_positions(logw_c, jax.random.PRNGKey(2),
                                  "systematic")
    idx, (g,) = rp.searchsorted_cdf_pallas(logw_c, pos, (value,))
    return logw_c + 1e-9 * g, s + jnp.sum(idx)


def chain_empty(carry):
    logw_c, s = carry
    return logw_c * 0.9999 + 1e-6, s


CHAIN = 400
for name, fn in (("empty", chain_empty), ("idx-only", chain_idx),
                 ("fused-1col", chain_fused)):
    t0 = time.time()
    dt = bench.timed_chained(fn, (logw, jnp.float32(0)), chain=CHAIN)
    log(f"{name}: {dt*1e3:.3f} ms/call (chain={CHAIN}, "
        f"compile {time.time()-t0:.0f}s)")


def chain_v5(carry):
    logw_c, s = carry
    from aesmc_tpu import resampling as R
    cdf = R._normalized_cumsum(logw_c)
    u = jax.random.uniform(jax.random.PRNGKey(2), (B, 1), dtype=jnp.float32)
    idx, (g,) = rp.systematic_search_gather_pallas(cdf, u, K, (value,))
    return logw_c + 1e-9 * g, s + jnp.sum(idx)


def chain_v5_noidx(carry):
    logw_c, s = carry
    from aesmc_tpu import resampling as R
    cdf = R._normalized_cumsum(logw_c)
    u = jax.random.uniform(jax.random.PRNGKey(2), (B, 1), dtype=jnp.float32)
    _, (g,) = rp.systematic_search_gather_pallas(cdf, u, K, (value,),
                                                 emit_idx=False)
    return logw_c + 1e-9 * g, s + jnp.sum(g)


def chain_xla_cdf_only(carry):
    logw_c, s = carry
    from aesmc_tpu import resampling as R
    cdf = R._normalized_cumsum(logw_c)
    return logw_c + 1e-9 * cdf, s


for name, fn in (("xla-cdf-only", chain_xla_cdf_only),
                 ("v5 fused-1col", chain_v5),
                 ("v5 fused-1col-noidx", chain_v5_noidx)):
    t0 = time.time()
    dt = bench.timed_chained(fn, (logw, jnp.float32(0)), chain=CHAIN)
    log(f"{name}: {dt*1e3:.3f} ms/call (chain={CHAIN}, "
        f"compile {time.time()-t0:.0f}s)")
