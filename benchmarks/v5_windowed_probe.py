"""Round-4 probe: windowed-scratch v5-HBM kernel vs v1 and whole-row.

The whole-row v5-HBM layout collapses at 8M particles (96 MB scratch
oversubscribes VMEM: 0.30x v1, round-3 sweep). The windowed layout caps
scratch at a sliding [base, base+cap) CDF-row window (a few MB at any
K), re-based by in-kernel DMA as the monotone position tiles advance.
This probe measures all three layouts across 4.2M-8M to set the regime
routing. `argv`: optional K values.

Run: PYTHONPATH=/root/repo:/root/.axon_site \
       python benchmarks/v5_windowed_probe.py [K ...]
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

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from aesmc_tpu import resampling as R  # noqa: E402
from aesmc_tpu.ops import resample_pallas as rp  # noqa: E402


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
    ks = ([int(a) for a in sys.argv[1:]] or
          (4_194_304, 6_000_000, 8_000_000))
    for k in ks:
        b = 1
        logw0 = jax.random.normal(jax.random.PRNGKey(0), (b, k)) * 3.0
        chunks = rp._hbm_chunk_count(k)

        def mk_v5(windowed):
            def step(carry):
                logw, key = carry
                key, sub = jax.random.split(key)
                u = jax.random.uniform(sub, (b, 1))
                cdf = R._normalized_cumsum(logw)
                _, (g,) = rp.systematic_search_gather_pallas(
                    cdf, u, k, (logw,), emit_idx=False,
                    hbm_chunks=chunks, hbm_windowed=windowed)
                return g, key
            return step

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

        # Correctness spot-check on hardware first (vs the XLA route).
        key = jax.random.PRNGKey(7)
        u = jax.random.uniform(key, (b, 1))
        cdf = R._normalized_cumsum(logw0)
        idx_w, (g_w,) = rp.systematic_search_gather_pallas(
            cdf, u, k, (logw0,), hbm_chunks=chunks, hbm_windowed=True)
        pos = jnp.minimum((u + jnp.arange(k, dtype=jnp.float32)) / k,
                          jnp.float32(rp._BELOW_ONE))
        want = jnp.clip(
            jax.vmap(lambda c, p: jnp.searchsorted(c, p, side="right"))(
                cdf, pos), 0, k - 1)
        mism = int(jnp.sum(idx_w != want))
        gerr = float(jnp.max(jnp.abs(
            g_w - jnp.take_along_axis(logw0, want, 1))))
        print(f"K={k:>9,}: windowed exactness idx-mismatches={mism} "
              f"gather-err={gerr:.1e}", flush=True)

        init = (logw0, jax.random.PRNGKey(1))
        dtw = chained(mk_v5(True), init)
        dt1 = chained(v1_step, init)
        row = (f"K={k:>9,}: v1 {dt1*1e3:7.2f} ms  "
               f"v5-HBM-win {dtw*1e3:7.2f} ms ({dt1/dtw:.2f}x v1)")
        if rp.v5_hbm_fits(k, 1):
            dt5 = chained(mk_v5(False), init)
            row += f"  v5-HBM-row {dt5*1e3:7.2f} ms ({dt1/dt5:.2f}x v1)"
        print(row, flush=True)


if __name__ == "__main__":
    main()
