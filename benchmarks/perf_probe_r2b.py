"""Decompose the AESMC train step cost at the reference config
(T=200, B=10, K=100): forward-only vs grad vs full step, per algorithm.

  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/perf_probe_r2b.py
"""

import argparse
import pathlib
import sys
import time

parser = argparse.ArgumentParser()
parser.add_argument("--prng", default=None)
parser.add_argument("--unroll", type=int, default=1)
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
from aesmc_tpu import losses, statistics, train as atrain  # noqa: E402
from aesmc_tpu.models import lgssm  # noqa: E402

log = bench.log
log(f"backend: {jax.default_backend()} prng: {args.prng or 'threefry'} "
    f"unroll: {args.unroll}")

key = jax.random.PRNGKey(0)
initial = lgssm.Initial(0.0, 1.0)
transition = lgssm.Transition.create(0.9, 1.0)
emission = lgssm.Emission.create(1.0, 0.2)
proposal = lgssm.Proposal.create(1.0, 1.0, key)

T, B, K = 200, 10, 100
_, obs = statistics.sample_from_prior(initial, transition, emission,
                                      T, B, key)
comps = (initial, lgssm.Transition.create(0.5, 1.0), emission, proposal)

for algorithm in ("aesmc", "iwae"):
    def fwd_step(carry, algorithm=algorithm):
        total, k = carry
        k, sub = jax.random.split(k)
        loss = losses.get_loss(obs, K, algorithm, *comps, key=sub,
                               scan_unroll=args.unroll)
        return total + loss, k

    dt = bench.timed_chained(fwd_step, (jnp.float32(0), key))
    log(f"{algorithm} forward-only: {dt*1e3:.2f} ms")

    def grad_step(carry, algorithm=algorithm):
        total, k = carry
        k, sub = jax.random.split(k)

        def loss_fn(comps_):
            return losses.get_loss(obs, K, algorithm, *comps_, key=sub,
                                   scan_unroll=args.unroll)

        loss, grads = jax.value_and_grad(loss_fn)(comps)
        leaves = [jnp.sum(leaf) for leaf in jax.tree_util.tree_leaves(grads)]
        return total + loss + sum(leaves), k

    dt = bench.timed_chained(grad_step, (jnp.float32(0), key))
    log(f"{algorithm} value_and_grad: {dt*1e3:.2f} ms")

# remat variant: recompute instead of storing residuals.
def grad_step_remat(carry):
    total, k = carry
    k, sub = jax.random.split(k)

    def loss_fn(comps_):
        return losses.get_loss(obs, K, "aesmc", *comps_, key=sub,
                               remat=True, scan_unroll=args.unroll)

    loss, grads = jax.value_and_grad(loss_fn)(comps)
    leaves = [jnp.sum(leaf) for leaf in jax.tree_util.tree_leaves(grads)]
    return total + loss + sum(leaves), k

dt = bench.timed_chained(grad_step_remat, (jnp.float32(0), key))
log(f"aesmc value_and_grad remat: {dt*1e3:.2f} ms")
