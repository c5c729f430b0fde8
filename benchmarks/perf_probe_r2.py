"""Round-2 performance probes (run on the TPU).

Measures sustained times for the two BASELINE metrics under candidate
optimizations (scan unroll, PRNG impl) so changes land on data, not
guesses. Usage:

  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/perf_probe_r2.py \
      [--prng rbg] [--probe train|headline|all]
"""

import argparse
import pathlib
import sys
import time

parser = argparse.ArgumentParser()
parser.add_argument("--prng", default=None, choices=[None, "rbg",
                                                     "unsafe_rbg"])
parser.add_argument("--probe", default="all",
                    choices=["all", "train", "headline"])
parser.add_argument("--unrolls", default="1,2,5,10")
args = parser.parse_args()

import jax

jax.config.update("jax_compilation_cache_dir",
                  str(pathlib.Path(__file__).parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
if args.prng:
    jax.config.update("jax_default_prng_impl", args.prng)

import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import bench  # noqa: E402
from aesmc_tpu import inference, statistics, train as atrain  # noqa: E402
from aesmc_tpu.models import lgssm  # noqa: E402

log = bench.log
log(f"backend: {jax.default_backend()} prng: {args.prng or 'threefry'}")

key = jax.random.PRNGKey(0)
initial = lgssm.Initial(0.0, 1.0)
transition = lgssm.Transition.create(0.9, 1.0)
emission = lgssm.Emission.create(1.0, 0.2)
proposal = lgssm.Proposal.create(1.0, 1.0, key)
unrolls = [int(u) for u in args.unrolls.split(",")]

if args.probe in ("all", "headline"):
    T, B, K = 200, 10, 10000
    _, obs = statistics.sample_from_prior(initial, transition, emission,
                                          T, B, key)
    for unroll in unrolls:
        if unroll > 4:
            continue

        def smc_step(carry, unroll=unroll):
            lml, k = carry
            k, sub = jax.random.split(k)
            out = inference.infer(
                "smc", obs, initial, transition, emission, proposal, K,
                key=sub, scan_unroll=unroll,
                return_log_marginal_likelihood=True, return_latents=False,
                return_log_weight=False)["log_marginal_likelihood"]
            return lml + jnp.mean(out), k

        t0 = time.time()
        dt = bench.timed_chained(smc_step, (jnp.float32(0), key))
        log(f"headline SMC K={K} unroll={unroll}: {dt*1e3:.2f} ms "
            f"= {B*K*T/dt/1e6:.1f} M ps/s (compile {time.time()-t0:.0f}s)")

if args.probe in ("all", "train"):
    T2, B2, K2 = 200, 10, 100
    _, obs2 = statistics.sample_from_prior(initial, transition, emission,
                                           T2, B2, key)
    optimizer = optax.adam(1e-2)
    comps = (initial, lgssm.Transition.create(0.5, 1.0), emission, proposal)
    opt_state = optimizer.init(comps)
    for algorithm in ("aesmc", "iwae"):
        for unroll in unrolls:
            step = atrain.make_train_step(K2, algorithm, optimizer,
                                          scan_unroll=unroll, jit=False)

            def train_chain(carry, step=step):
                comps_, opt_state_, k = carry
                k, sub = jax.random.split(k)
                comps_, opt_state_, _ = step(comps_, opt_state_, obs2, sub)
                return comps_, opt_state_, k

            t0 = time.time()
            dt2 = bench.timed_chained(train_chain, (comps, opt_state, key))
            log(f"{algorithm} train K={K2} unroll={unroll}: "
                f"{dt2*1e3:.2f} ms = {1/dt2:.1f} steps/s "
                f"(compile {time.time()-t0:.0f}s)")
