"""v5-HBM vs v1-HBM sweep with RPC-amortized chained timing."""
import pathlib
import statistics as stdstats
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  str(pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from aesmc_tpu import resampling as R
from aesmc_tpu.ops import resample_pallas as rp


def chained(step, init, repeats=3, chain=10):
    @jax.jit
    def run(carry):
        def body(c, _):
            return step(c), None
        carry, _ = jax.lax.scan(body, carry, None, length=chain)
        return carry
    carry = run(init)
    float(jnp.sum(carry[0][:, :8]))
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        carry = run(init)
        float(jnp.sum(carry[0][:, :8]))
        ts.append(time.perf_counter() - t0)
    return stdstats.median(ts) / chain


def main():
    print("backend:", jax.default_backend(), file=sys.stderr)
    for k in (2_500_000, 3_000_000, 4_194_304, 5_000_000, 6_000_000,
              8_000_000):
        b = 1
        logw0 = jax.random.normal(jax.random.PRNGKey(0), (b, k)) * 3.0
        chunks = rp._hbm_chunk_count(k)

        def v5_step(carry):
            logw, key = carry
            key, sub = jax.random.split(key)
            u = jax.random.uniform(sub, (b, 1))
            cdf = R._normalized_cumsum(logw)
            _, (g,) = rp.systematic_search_gather_pallas(
                cdf, u, k, (logw,), emit_idx=False, hbm_chunks=chunks)
            return g, key

        def v1_step(carry):
            logw, key = carry
            key, sub = jax.random.split(key)
            u = jax.random.uniform(sub, (b, 1))
            cdf = R._normalized_cumsum(logw)
            pos = jnp.minimum((u + jnp.arange(k, dtype=jnp.float32)) / k,
                              jnp.float32(rp._BELOW_ONE))
            _, (g,) = rp.searchsorted_sorted_cdf_pallas(
                cdf, pos, (logw,), chunks=chunks, hbm_resident=True)
            return g, key

        init = (logw0, jax.random.PRNGKey(1))
        dt5 = chained(v5_step, init)
        dt1 = chained(v1_step, init)
        print(f"K={k:>9,}: v1 {dt1*1e3:7.2f} ms  v5-HBM {dt5*1e3:7.2f} ms"
              f"  speedup {dt1/dt5:.2f}x", flush=True)


if __name__ == "__main__":
    main()
