"""Decompose the HMM bench rows' per-step cost (round 4, ninth sitting).

The first TPU measurement of the HMM rows (bench_extended.py hmm) came
in at 22.9-30.2 M particle-steps/s - ~13x under the LGSSM headline at
the identical T=200 B=10 K=10k shape. Same engine, same resampler; the
differences are int32 particles (a different fused-kernel value-column
path) and [B, K, D] categorical model math. This probe isolates which.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/hmm_gap_probe_r4.py
"""

import pathlib
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  str(pathlib.Path(__file__).parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp  # noqa: E402

from aesmc_tpu import inference, statistics  # noqa: E402
from aesmc_tpu.models import hmm, lgssm  # noqa: E402

T, B, K = 200, 10, 10_000
CHAIN = 10


def timed_chained(make_step, init, repeats=3, chain=CHAIN):
    @jax.jit
    def run(carry):
        def body(c, _):
            return make_step(c), None
        carry, _ = jax.lax.scan(body, carry, None, length=chain)
        return carry

    carry = run(init)
    float(jnp.sum(jax.tree_util.tree_leaves(carry)[0]))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        carry = run(init)
        float(jnp.sum(jax.tree_util.tree_leaves(carry)[0]))
        best = min(best, time.perf_counter() - t0)
    return best / chain


def row(name, comps, obs, **kwargs):
    def step(carry):
        acc, k = carry
        k, sub = jax.random.split(k)
        out = inference.infer(
            "smc", obs, *comps, num_particles=K, key=sub,
            return_log_marginal_likelihood=True, return_latents=False,
            return_log_weight=False, **kwargs)["log_marginal_likelihood"]
        return acc + jnp.mean(out), k

    dt = timed_chained(step, (jnp.float32(0), jax.random.PRNGKey(0)))
    print(f"{name:44s}{dt*1e3:9.2f} ms = {B*K*T/dt/1e6:7.1f} M ps/s",
          flush=True)


def main():
    key = jax.random.PRNGKey(0)
    print(f"backend: {jax.default_backend()}", flush=True)

    hm_boot = hmm.make_model(num_states=8, proposal="bootstrap")
    _, obs = statistics.sample_from_prior(hm_boot[0], hm_boot[1],
                                          hm_boot[2], T, B, key)
    row("HMM bootstrap, auto (=pallas)", hm_boot, obs)
    row("HMM bootstrap, xla resampling", hm_boot, obs,
        resampling_implementation="xla")
    row("HMM bootstrap, never resample (ESS 1e-6)", hm_boot, obs,
        resampling_criterion=1e-6)

    # A/B the round-5 one-hot masked-sum lookup fix against the pre-r5
    # int-indexed gather path (env toggle read at trace time).
    import os
    os.environ["AESMC_HMM_INDEX_GATHER"] = "1"
    try:
        row("HMM bootstrap, auto, PRE-R5 index gathers", hm_boot, obs)
    finally:
        del os.environ["AESMC_HMM_INDEX_GATHER"]

    # LGSSM control at the identical shape.
    lg = (lgssm.Initial(0.0, 1.0), lgssm.Transition.create(0.9, 1.0),
          lgssm.Emission.create(1.0, 0.2),
          lgssm.Proposal.create(1.0, 1.0, key))
    _, lobs = statistics.sample_from_prior(lg[0], lg[1], lg[2], T, B, key)
    row("LGSSM control, auto", lg, lobs)


if __name__ == "__main__":
    main()
