"""Round-3 TPU probe: pairwise vs rejection PaRIS backward sampling.

Question (CLAUDE.md pending-TPU-work): at what K does rejection
backward sampling (O(K*N) per round, `lax.while_loop`) overtake the
O(K^2) pairwise tile on a v5e, and how far does it scale?

Workload: scalar LGSSM (the headline model), T=25, B=2, additive
functional h(x_prev, x_t) = x_t (smoothed sum of latents), N=2 backward
draws. Pairwise is skipped above K=16,384 (the [B, K, K] tile alone is
>=2 GB there).

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/smoothing_probe_r3.py
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

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from aesmc_tpu import smoothing  # noqa: E402
from aesmc_tpu.models import lgssm  # noqa: E402

T, B = 25, 2
KS = (4_096, 16_384, 65_536, 262_144, 1_048_576)
PAIRWISE_MAX_K = 16_384


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    key = jax.random.PRNGKey(0)
    initial = lgssm.Initial(0.0, 1.0)
    transition = lgssm.Transition.create(0.9, 1.0)
    emission = lgssm.Emission.create(1.0, 0.2)
    proposal = lgssm.Proposal.create(1.0, 1.0, key)

    obs_key, run_key = jax.random.split(key)
    # Observations generated from the model (fixture lesson: off-model
    # obs give huge Jensen bias and swamp comparisons).
    from aesmc_tpu import statistics
    _, observations = statistics.sample_from_prior(
        initial, transition, emission, T, B, key=obs_key)

    def h(prev, cur, time):
        del prev, time
        return cur

    def run_one(backward, num_particles):
        def call(k):
            return smoothing.paris(
                observations, initial, transition, emission, proposal,
                num_particles=num_particles, h=h, key=k,
                num_backward_draws=2, backward=backward)

        jcall = jax.jit(call)
        out = jcall(run_key)
        jnp.asarray(out["smoothed"]).block_until_ready()
        float(jnp.sum(out["smoothed"]))  # force through the relay
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = jcall(run_key)
            float(jnp.sum(out["smoothed"]))
            times.append(time.perf_counter() - t0)
        dt = min(times)
        extra = {}
        if backward == "rejection":
            extra["accept_rate"] = float(jnp.mean(
                out["backward_accept_rate"]))
            extra["unconverged"] = int(jnp.sum(
                out["backward_unconverged"]))
        return dt, float(jnp.mean(out["smoothed"])), extra

    rows = []
    for k in KS:
        for backward in ("pairwise", "rejection"):
            if backward == "pairwise" and k > PAIRWISE_MAX_K:
                continue
            dt, smoothed, extra = run_one(backward, k)
            ms_per_obs = dt / T * 1e3
            rows.append((k, backward, ms_per_obs, smoothed, extra))
            log(f"K={k:>9,} {backward:<9} {ms_per_obs:8.3f} ms/obs "
                f"(total {dt*1e3:7.1f} ms, smoothed={smoothed:+.4f}) "
                f"{extra}")

    log("\nsummary (ms per observation):")
    for k, backward, ms, smoothed, extra in rows:
        log(f"  K={k:>9,} {backward:<9} {ms:8.3f}")


if __name__ == "__main__":
    main()
