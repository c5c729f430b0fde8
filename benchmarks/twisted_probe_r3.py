"""TPU probe: cost of twisting at scale + evidence-variance payoff.

Two questions:
1. Overhead: twisted SMC adds only elementwise VPU math per step
   (closed-form Gaussian moments + the quadratic corrections). At the
   headline shape (T=200, B=10, K=10k, stochastic volatility), how much
   slower than the bootstrap filter through the same engine?
2. Payoff: at that shape, how much does a 2-iteration learned twist cut
   the evidence-estimate variance across seeds?

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/twisted_probe_r3.py
"""

import pathlib
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  str(pathlib.Path(__file__).resolve().parent.parent /
                      ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from aesmc_tpu import statistics, twisted  # noqa: E402
from aesmc_tpu.models import stochastic_volatility as sv  # noqa: E402

T, B, K = 200, 10, 10_000
MU, PHI, SIGMA, BETA = 0.0, 0.95, 0.6, 0.8
CHAIN = 20


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed_chained(fn, key, repeats=3):
    """Amortize the ~28 ms tunnel fetch over CHAIN chained calls."""

    def chained(k):
        def body(carry, _):
            k_, acc = carry
            k_, sub = jax.random.split(k_)
            z = fn(sub)
            return (k_, acc + jnp.sum(z)), None

        (_, acc), _ = jax.lax.scan(body, (k, 0.0), None, length=CHAIN)
        return acc

    jc = jax.jit(chained)
    float(jc(key))  # compile + warm
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(jc(key))
        times.append(time.perf_counter() - t0)
    return min(times) / CHAIN


def main():
    key = jax.random.PRNGKey(0)
    initial = sv.Initial.create(MU, PHI, SIGMA)
    transition = sv.Transition.create(MU, PHI, SIGMA)
    emission = sv.Emission.create(BETA)
    _, obs = statistics.sample_from_prior(
        initial, transition, emission, T, B, key=key)
    spec = twisted.GaussianSSMSpec(
        initial_loc=MU, initial_scale=SIGMA / np.sqrt(1 - PHI ** 2),
        transition_scale=SIGMA, mean_fn=lambda x, t: MU + PHI * (x - MU))
    zero = twisted.QuadraticTwist.zeros(T, B)

    def run(tw):
        return lambda k: twisted.twisted_smc(
            obs, spec, emission, tw, num_particles=K, key=k,
            return_latents=False, return_log_weight=False,
        )["log_marginal_likelihood"]

    t0 = timed_chained(run(zero), jax.random.PRNGKey(1))
    log(f"bootstrap (zero twist): {t0*1e3:8.2f} ms/call = "
        f"{T*B*K/t0/1e6:8.1f} M particle-steps/s")

    log("learning twist (2 ADP iterations at K=2048)...")
    t_learn0 = time.perf_counter()
    learned, _ = twisted.learn_twist(
        obs, spec, emission, num_particles=2048,
        key=jax.random.PRNGKey(2), num_iterations=2)
    learned = jax.tree_util.tree_map(jax.block_until_ready, learned)
    log(f"  learn_twist wall: {time.perf_counter()-t_learn0:.1f} s")

    t1 = timed_chained(run(learned), jax.random.PRNGKey(3))
    log(f"twisted (learned):      {t1*1e3:8.2f} ms/call = "
        f"{T*B*K/t1/1e6:8.1f} M particle-steps/s "
        f"(overhead {100*(t1/t0-1):.1f}%)")

    # Evidence variance across seeds, both at the SAME particle budget.
    nseeds = 16
    vrun0 = jax.jit(jax.vmap(run(zero)))
    vrun1 = jax.jit(jax.vmap(run(learned)))
    keys = jax.random.split(jax.random.PRNGKey(9), nseeds)
    z0 = np.asarray(vrun0(keys))  # [nseeds, B]
    z1 = np.asarray(vrun1(keys))
    sd0, sd1 = z0.std(0).mean(), z1.std(0).mean()
    log(f"logZ sd across {nseeds} seeds (mean over batch): "
        f"bootstrap {sd0:.4f}  twisted {sd1:.4f}  ratio {sd0/sd1:.1f}x")


if __name__ == "__main__":
    main()
