"""Round-3: batch-aware dense/pallas crossover (VERDICT weak #4).
Train-step (fwd+bwd+adam) timing, dense one-hot (xla) vs pallas, over
a B x K grid around the measured B=10 crossover (K=512).
PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/crossover_probe_r3.py"""
import pathlib
import statistics as stdstats
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  str(pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import optax

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from aesmc_tpu import statistics, train as atrain
from aesmc_tpu.models import lgssm


def timed_chained(make_step, init, repeats=3, chain=5):
    @jax.jit
    def run(carry):
        def body(c, _):
            return make_step(c), None
        carry, _ = jax.lax.scan(body, carry, None, length=chain)
        return carry
    carry = run(init)
    float(jnp.sum(jax.tree_util.tree_leaves(carry)[0]))
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        carry = run(init)
        float(jnp.sum(jax.tree_util.tree_leaves(carry)[0]))
        ts.append(time.perf_counter() - t0)
    return stdstats.median(ts) / chain


def main():
    print("backend:", jax.default_backend(), file=sys.stderr)
    key = jax.random.PRNGKey(0)
    initial = lgssm.Initial(0.0, 1.0)
    transition = lgssm.Transition.create(0.9, 1.0)
    emission = lgssm.Emission.create(1.0, 0.2)
    proposal = lgssm.Proposal.create(1.0, 1.0, key)
    optimizer = optax.adam(1e-2)
    T = 200
    for B in (10, 64, 128):
        _, obs = statistics.sample_from_prior(
            initial, transition, emission, T, B, key)
        for K in (128, 256, 512):
            row = []
            for impl in ("xla", "pallas"):
                comps = (initial, lgssm.Transition.create(0.5, 1.0),
                         emission, proposal)
                step = atrain.make_train_step(
                    K, "aesmc", optimizer,
                    resampling_implementation=impl, jit=False)
                opt_state = optimizer.init(comps)

                def chain_fn(carry, step=step):
                    comps_, opt_state_, k = carry
                    k, sub = jax.random.split(k)
                    comps_, opt_state_, _ = step(comps_, opt_state_, obs,
                                                 sub)
                    return comps_, opt_state_, k

                dt = timed_chained(chain_fn, (comps, opt_state, key))
                row.append(dt * 1e3)
            winner = "dense" if row[0] < row[1] else "pallas"
            print(f"B={B:4d} K={K:4d}: dense {row[0]:7.1f} ms  "
                  f"pallas {row[1]:7.1f} ms  -> {winner}", flush=True)


if __name__ == "__main__":
    main()
