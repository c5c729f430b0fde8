"""Large-K backward benchmark: transposed-merge pallas VJP vs XLA
segment_sum, on the fused resample+gather training path.

  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bwd_probe.py
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


def run(b, k, impl, chain=20):
    rp.BACKWARD_IMPL = impl
    key = jax.random.PRNGKey(0)
    logw = jax.random.normal(key, (b, k)) * 3.0
    v = jax.random.normal(jax.random.PRNGKey(1), (b, k))
    pos = R.resampling_positions(logw, jax.random.PRNGKey(2), "systematic")
    cdf = R._normalized_cumsum(logw)
    chunks = max(1, -(-k // rp.LARGE_K_CHUNK))
    hbm = k > rp.VMEM_RESIDENT_PARTICLES

    def loss(v_):
        if k > rp.MAX_KERNEL_PARTICLES:
            _, (g,) = rp.resample_and_gather_cdf(chunks, hbm, cdf, pos,
                                                 (v_,))
        else:
            _, (g,) = rp.resample_and_gather(logw, pos, (v_,))
        return jnp.sum(g * g)

    def step(carry):
        vv, s = carry
        val, grad = jax.value_and_grad(loss)(vv)
        return vv + 1e-9 * grad, s + val

    t0 = time.time()
    dt = bench.timed_chained(step, (v, jnp.float32(0)), chain=chain)
    log(f"B={b} K={k} impl={impl}: {dt*1e3:.2f} ms/step "
        f"(fwd+bwd, compile {time.time()-t0:.0f}s)")
    grad = jax.grad(loss)(v)
    return dt, np.asarray(grad)


for b, k in [(10, 10_000), (10, 131_072), (4, 524_288), (2, 1_048_576)]:
    dts = {}
    grads = {}
    for impl in ("pallas", "xla"):
        dts[impl], grads[impl] = run(b, k, impl)
    dev = float(np.abs(grads["pallas"] - grads["xla"]).max())
    scale = float(np.abs(grads["xla"]).max())
    log(f"B={b} K={k}: pallas/xla bwd speedup (full step) "
        f"{dts['xla']/dts['pallas']:.2f}x, grad max dev {dev:.2e} "
        f"(grad scale {scale:.2e})")
rp.BACKWARD_IMPL = "pallas"
