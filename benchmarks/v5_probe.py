"""v5 systematic kernel: hardware exactness + timing at the headline
shape, plus in-engine SMC step timing.

  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/v5_probe.py
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
log(f"backend: {jax.default_backend()} MERGE_ROWS={rp.MERGE_ROWS}")

# ---- exactness across shapes/seeds (incl. the division bit-match and
# degenerate weights exercising the window-extension while).
bad = 0
for seed in range(6):
    for b, k, scale in [(10, 10000, 1.0), (4, 16384, 6.0), (4, 131072, 3.0),
                        (2, 4096, 30.0), (3, 1024, 1.0)]:
        kk = jax.random.PRNGKey(seed * 100 + k % 97)
        logw = jax.random.normal(kk, (b, k)) * scale
        value = jax.random.normal(jax.random.PRNGKey(1), (b, k))
        ukey = jax.random.PRNGKey(seed)
        u = jax.random.uniform(ukey, (b, 1), dtype=jnp.float32)
        cdf = R._normalized_cumsum(logw)
        pos = jnp.minimum((u + jnp.arange(k, dtype=jnp.float32)) / k,
                          jnp.nextafter(jnp.float32(1.0), jnp.float32(0)))
        idx_ref = jnp.clip(jax.vmap(lambda c, p: jnp.searchsorted(
            c, p, side="right", method="sort"))(cdf, pos), 0, k - 1)
        g_ref = jnp.take_along_axis(value, idx_ref, axis=1)
        idx, (g,) = jax.jit(
            lambda c, uu: rp.systematic_search_gather_pallas(
                c, uu, k, (value,)))(cdf, u)
        mi = int((np.asarray(idx) != np.asarray(idx_ref)).sum())
        gd = float(np.abs(np.asarray(g) - np.asarray(g_ref)).max())
        if mi or gd:
            bad += 1
            log(f"MISMATCH seed={seed} B={b} K={k} scale={scale}: "
                f"idx {mi}/{b*k}, gdev {gd}")
log(f"exactness sweep: {'OK' if bad == 0 else f'{bad} FAILURES'}")

# ---- kernel timing at the headline shape.
B, K = 10, 10000
logw = jax.random.normal(jax.random.PRNGKey(0), (B, K))
value = jax.random.normal(jax.random.PRNGKey(1), (B, K))
u0 = jax.random.uniform(jax.random.PRNGKey(2), (B, 1), dtype=jnp.float32)

for name, emit in (("v5 fused-1col idx", True), ("v5 fused-1col noidx",
                                                 False)):
    def chain(carry, emit=emit):
        logw_c, s = carry
        cdf = R._normalized_cumsum(logw_c)
        idx, (g,) = rp.systematic_search_gather_pallas(
            cdf, u0, K, (value,), emit_idx=emit)
        extra = jnp.sum(idx) if emit else 0.0
        return logw_c + 1e-9 * g, s + extra

    t0 = time.time()
    dt = bench.timed_chained(chain, (logw, jnp.float32(0)), chain=400)
    log(f"{name}: {dt*1e3:.3f} ms/call (compile {time.time()-t0:.0f}s)")

# v1 comparison on the same machine state
def chain_v1(carry):
    logw_c, s = carry
    pos = rp.resampling_positions(logw_c, jax.random.PRNGKey(2),
                                  "systematic")
    cdf = R._normalized_cumsum(logw_c)
    idx, (g,) = rp.searchsorted_sorted_cdf_pallas(cdf, pos, (value,))
    return logw_c + 1e-9 * g, s + jnp.sum(idx)

dt = bench.timed_chained(chain_v1, (logw, jnp.float32(0)), chain=400)
log(f"v1 fused-1col: {dt*1e3:.3f} ms/call")

# ---- in-engine SMC headline step.
from aesmc_tpu import inference, statistics  # noqa: E402
from aesmc_tpu.models import lgssm  # noqa: E402

key = jax.random.PRNGKey(0)
initial = lgssm.Initial(0.0, 1.0)
transition = lgssm.Transition.create(0.9, 1.0)
emission = lgssm.Emission.create(1.0, 0.2)
proposal = lgssm.Proposal.create(1.0, 1.0, key)
T = 200
_, obs = statistics.sample_from_prior(initial, transition, emission,
                                      T, 10, key)

def smc_step(carry):
    lml, k2 = carry
    k2, sub = jax.random.split(k2)
    out = inference.infer(
        "smc", obs, initial, transition, emission, proposal, K,
        key=sub, return_log_marginal_likelihood=True,
        return_latents=False, return_log_weight=False)
    return lml + jnp.mean(out["log_marginal_likelihood"]), k2

t0 = time.time()
dt = bench.timed_chained(smc_step, (jnp.float32(0), key))
ps = 10 * K * T / dt
log(f"engine SMC T={T} B=10 K={K}: {dt*1e3:.2f} ms/call = "
    f"{ps/1e6:.1f} M particle-steps/s (compile {time.time()-t0:.0f}s)")
