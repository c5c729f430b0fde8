"""Large-K training: full AESMC train step at T=200 B=10 K=10k (v5
forward + range-sum backward throughout), plus the v5-routed sorted
gather.

  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/train10k_probe.py
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
import optax  # noqa: E402

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import bench  # noqa: E402
from aesmc_tpu import statistics, train as atrain  # noqa: E402
from aesmc_tpu.models import lgssm  # noqa: E402
from aesmc_tpu.ops import gather_pallas  # noqa: E402

log = bench.log
log(f"backend: {jax.default_backend()}")

# v5-routed sorted gather vs XLA take_along on hardware
B, K = 10, 10000
v = jax.random.normal(jax.random.PRNGKey(0), (B, K))
idx = jnp.sort(jax.random.randint(jax.random.PRNGKey(1), (B, K), 0, K),
               axis=1).astype(jnp.int32)
ref = jnp.take_along_axis(v, idx, axis=1)
got = jax.jit(gather_pallas.gather_sorted_pallas)(v, idx)
log(f"sorted gather v5 route: max dev "
    f"{float(jnp.abs(got - ref).max())}")

def chain_gather(carry):
    vv, s = carry
    g = gather_pallas.gather_sorted_pallas(vv, idx)
    return vv + 1e-9 * g, s + jnp.sum(g)

dt = bench.timed_chained(chain_gather, (v, jnp.float32(0)), chain=200)
log(f"sorted gather [10,10k]: {dt*1e3:.3f} ms/call")

# full AESMC train step at K=10k
key = jax.random.PRNGKey(0)
initial = lgssm.Initial(0.0, 1.0)
transition = lgssm.Transition.create(0.9, 1.0)
emission = lgssm.Emission.create(1.0, 0.2)
proposal = lgssm.Proposal.create(1.0, 1.0, key)
T = 200
_, obs = statistics.sample_from_prior(initial, transition, emission,
                                      T, B, key)
optimizer = optax.adam(1e-2)
comps = (initial, lgssm.Transition.create(0.5, 1.0), emission, proposal)
step = atrain.make_train_step(K, "aesmc", optimizer, jit=False)
opt_state = optimizer.init(comps)

def train_chain(carry):
    comps_, opt_state_, k2 = carry
    k2, sub = jax.random.split(k2)
    comps_, opt_state_, _ = step(comps_, opt_state_, obs, sub)
    return comps_, opt_state_, k2

t0 = time.time()
dt2 = bench.timed_chained(train_chain, (comps, opt_state, key))
log(f"AESMC train step T={T} B={B} K={K}: {dt2*1e3:.2f} ms = "
    f"{1/dt2:.2f} steps/s = {B*K*T/dt2/1e6:.1f} M particle-steps/s "
    f"(fwd+bwd+adam; compile {time.time()-t0:.0f}s)")
