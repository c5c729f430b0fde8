"""Engine-integrated OT resampling on TPU: sustained SMC step cost at
moderate scale (blocked online log-Sinkhorn inside the scan).

  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/ot_engine_probe.py
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
from aesmc_tpu import inference, statistics  # noqa: E402
from aesmc_tpu.models import lgssm  # noqa: E402

log = bench.log
log(f"backend: {jax.default_backend()}")
key = jax.random.PRNGKey(0)
initial = lgssm.Initial(0.0, 1.0)
transition = lgssm.Transition.create(0.9, 1.0)
emission = lgssm.Emission.create(1.0, 0.2)
proposal = lgssm.Proposal.create(1.0, 1.0, key)

for T, B, K, iters in [(50, 4, 4096, 20), (50, 4, 16384, 20)]:
    _, obs = statistics.sample_from_prior(initial, transition, emission,
                                          T, B, key)

    def step(carry, T=T, K=K, iters=iters, obs=obs):
        lml, k2 = carry
        k2, sub = jax.random.split(k2)
        out = inference.infer(
            "smc", obs, initial, transition, emission, proposal, K,
            key=sub, resampling_method="ot", ot_num_iterations=iters,
            return_log_marginal_likelihood=True, return_latents=False,
            return_log_weight=False)
        return lml + jnp.mean(out["log_marginal_likelihood"]), k2

    t0 = time.time()
    dt = bench.timed_chained(step, (jnp.float32(0), key), chain=3)
    log(f"OT-SMC T={T} B={B} K={K} sinkhorn={iters}: {dt*1e3:.1f} "
        f"ms/call = {B*K*T/dt/1e6:.1f} M particle-steps/s "
        f"(compile {time.time()-t0:.0f}s)")
