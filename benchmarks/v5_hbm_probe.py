"""Round-3 probe: v5-HBM window kernel vs the v1 HBM merge at 2M-8M.
PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/v5_hbm_probe.py"""
import pathlib
import statistics as stdstats
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  str(pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from aesmc_tpu import resampling as R
from aesmc_tpu.ops import resample_pallas as rp


def timed(fn, *args, repeats=5):
    out = fn(*args)
    jax.block_until_ready(out)
    float(jnp.sum(out[1][0]))
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(out[1][0]))
        ts.append(time.perf_counter() - t0)
    return stdstats.median(ts)


def main():
    print("backend:", jax.default_backend(), file=sys.stderr)
    for k in (3_000_000, 4_194_304, 8_000_000):
        b = 1
        key = jax.random.PRNGKey(42)
        logw = jax.random.normal(key, (b, k)) * 3.0
        value = jax.random.normal(jax.random.PRNGKey(1), (b, k))
        u = jax.random.uniform(jax.random.PRNGKey(2), (b, 1))
        cdf = R._normalized_cumsum(jax.lax.stop_gradient(logw))
        pos = jnp.minimum((u + jnp.arange(k, dtype=jnp.float32)) / k,
                          jnp.float32(rp._BELOW_ONE))
        chunks = rp._hbm_chunk_count(k)

        # exactness vs XLA
        idx_ref = jax.jit(jax.vmap(lambda c, p: jnp.searchsorted(
            c, p, side="right", method="sort")))(cdf, pos)
        idx_ref = np.asarray(jnp.clip(idx_ref, 0, k - 1))
        g_ref = np.asarray(jnp.take_along_axis(value, jnp.asarray(idx_ref), axis=1))

        v5h = jax.jit(lambda c, uu, v: rp.systematic_search_gather_pallas(
            c, uu, k, (v,), hbm_chunks=chunks))
        t0 = time.time()
        idx5, (g5,) = v5h(cdf, u, value)
        print(f"K={k}: v5-HBM compile {time.time()-t0:.0f}s", file=sys.stderr)
        m = int((np.asarray(idx5) != idx_ref).sum())
        gd = float(np.abs(np.asarray(g5) - g_ref).max())
        print(f"K={k}: v5-HBM idx mismatches {m}/{b*k}, gather dev {gd}")

        v1 = jax.jit(lambda c, p, v: rp.searchsorted_sorted_cdf_pallas(
            c, p, (v,), chunks=chunks, hbm_resident=True))
        idx1, (g1,) = v1(cdf, pos, value)
        m1 = int((np.asarray(idx1) != idx_ref).sum())
        print(f"K={k}: v1-HBM idx mismatches {m1}/{b*k}")

        dt5 = timed(v5h, cdf, u, value)
        dt1 = timed(v1, cdf, pos, value)
        print(f"K={k}: v1-HBM {dt1*1e3:.2f} ms  v5-HBM {dt5*1e3:.2f} ms  "
              f"speedup {dt1/dt5:.2f}x")

        # backward (range-sum) at 4M
        if k == 4_194_304:
            gint = jnp.round(jax.random.normal(jax.random.PRNGKey(3), (b, k)) * 3.0)
            bwd_ref = np.asarray(jax.vmap(
                lambda gr, ir: jax.ops.segment_sum(gr, ir, num_segments=k)
            )(gint, jnp.asarray(idx_ref)))
            bwd = jax.jit(lambda c, p, g: rp.gather_backward_pallas(
                c, p, [g], chunks=chunks, hbm_resident=True))
            t0 = time.time()
            (bwd_p,) = bwd(cdf, pos, gint)
            print(f"K={k}: backward compile {time.time()-t0:.0f}s", file=sys.stderr)
            mb = int((np.asarray(bwd_p) != bwd_ref).sum())
            print(f"K={k}: v5-HBM range-sum backward mismatches {mb}/{b*k}")


if __name__ == "__main__":
    main()
