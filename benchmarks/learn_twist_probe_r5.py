"""learn_twist compile-vs-compute split (round 5; VERDICT r4 weak #4).

Round 4 recorded "76-161 s wall for one ADP pass at K=2048" with no
split. Round 5 jitted the two phase programs (one iteration, one
scoring call) so they compile once and are reused across
iterations/candidates. This probe reports, on the round-4 config
(stochastic-volatility-like misspecified model, K=2048):

  - wall time of the FIRST learn_twist call (compile + run)
  - wall time of a SECOND call with different keys (cached programs:
    the sustained cost of an ADP pass)
  - per-iteration sustained time from a 4-iteration run

Run: PYTHONPATH=/root/repo:/root/.axon_site \
       python benchmarks/learn_twist_probe_r5.py
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

from aesmc_tpu import statistics, twisted  # noqa: E402
from aesmc_tpu.models import stochastic_volatility  # noqa: E402


def main():
    key = jax.random.PRNGKey(0)
    print(f"backend: {jax.default_backend()}", flush=True)
    T, B, K = 100, 4, 2048

    comps = stochastic_volatility.make_model()
    initial, transition, emission = comps[0], comps[1], comps[2]
    _, obs = statistics.sample_from_prior(initial, transition, emission,
                                          T, B, key)
    mu = transition.mu
    phi = jnp.tanh(transition.raw_phi)
    sigma = jnp.exp(transition.log_sigma)
    stationary = sigma / jnp.sqrt(1.0 - phi ** 2)
    spec = twisted.GaussianSSMSpec(
        initial_loc=mu, initial_scale=stationary,
        transition_scale=sigma,
        mean_fn=lambda prev, t: mu + phi * (prev - mu))

    def one_pass(k, iters=1, keep="best"):
        tw, info = twisted.learn_twist(
            obs, spec, emission, num_particles=K, key=k,
            num_iterations=iters, fit_jitter=1.5,
            max_precision_ratio=4.0, keep=keep,
            keep_num_particles=256, keep_num_seeds=2)
        out = info["scores"] if keep == "best" else \
            info["log_marginal_likelihood"]
        return float(jnp.sum(out))

    t0 = time.perf_counter()
    s1 = one_pass(jax.random.PRNGKey(1))
    t_first = time.perf_counter() - t0
    print(f"first call (compile+run), 1 iter keep=best: "
          f"{t_first:.1f} s  (score sum {s1:.1f})", flush=True)

    t0 = time.perf_counter()
    s2 = one_pass(jax.random.PRNGKey(2))
    t_second = time.perf_counter() - t0
    print(f"second call (cached programs):              "
          f"{t_second:.1f} s  (score sum {s2:.1f})", flush=True)

    t0 = time.perf_counter()
    one_pass(jax.random.PRNGKey(3), iters=4, keep="last")
    t_four = time.perf_counter() - t0
    print(f"4-iteration keep=last run: {t_four:.1f} s = "
          f"{t_four/4:.2f} s/iteration sustained", flush=True)


if __name__ == "__main__":
    main()
