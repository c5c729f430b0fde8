"""Round-3 per-component breakdown of the headline SMC step (VERDICT #3).

The tunnel historically blocks xprof; this measures by systematic
ablation: each row removes or isolates one component of the T=200 B=10
K=10k SMC step, all timed with the chained-scan harness (one scalar
fetch per measurement). Also attempts a jax.profiler trace capture.

Run: PYTHONPATH=/root/repo:/root/.axon_site python
     benchmarks/headline_breakdown_r3.py
"""
import pathlib
import statistics as stdstats
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  str(pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from aesmc_tpu import inference, resampling, statistics
from aesmc_tpu.models import lgssm
from aesmc_tpu.ops import resample_pallas as rp

T, B, K = 200, 10, 10000


def timed_chained(make_step, init, repeats=5, chain=5):
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
    _, obs = statistics.sample_from_prior(initial, transition, emission,
                                          T, B, key)

    def infer_step(algorithm, **kw):
        def step(carry):
            lml, k = carry
            k, sub = jax.random.split(k)
            out = inference.infer(
                algorithm, obs, initial, transition, emission, proposal,
                K, key=sub, return_log_marginal_likelihood=True,
                return_latents=False, return_log_weight=False,
                **kw)["log_marginal_likelihood"]
            return lml + jnp.mean(out), k
        return step

    rows = {}
    rows["full smc (headline)"] = timed_chained(
        infer_step("smc"), (jnp.float32(0), key))
    rows["is mode (no resample, no per-step lse)"] = timed_chained(
        infer_step("is"), (jnp.float32(0), key))
    rows["smc, xla-dense resampler"] = timed_chained(
        infer_step("smc", resampling_implementation="xla"),
        (jnp.float32(0), key))
    for unroll in (2, 4):
        rows[f"full smc, scan_unroll={unroll}"] = timed_chained(
            infer_step("smc", scan_unroll=unroll), (jnp.float32(0), key))

    # Isolated resample+gather loop: CDF + v5 kernel only, data-dependent
    # chain through the gathered column.
    logw0 = jax.random.normal(key, (B, K))

    def resample_only(carry):
        logw, k = carry
        k, sub = jax.random.split(k)
        u = jax.random.uniform(sub, (B, 1))
        _, (g,) = rp.resample_and_gather_systematic(
            False, logw, u, (logw,))
        return g, k

    rows["resample+gather kernel loop (CDF + v5)"] = timed_chained(
        resample_only, (logw0, key), chain=5 * T) * 1  # per call = per step

    # CDF only.
    def cdf_only(carry):
        logw, k = carry
        return resampling._normalized_cumsum(logw) + logw * 1e-9, k

    rows["normalized-cumsum (CDF) loop"] = timed_chained(
        cdf_only, (logw0, key), chain=5 * T)

    # per-step logsumexp contribution
    def lse_only(carry):
        logw, k = carry
        c = jax.nn.logsumexp(logw, axis=1)
        return logw + c[:, None] * 1e-9, k

    rows["per-step logsumexp loop"] = timed_chained(
        lse_only, (logw0, key), chain=5 * T)

    base = rows["full smc (headline)"]
    print(f"\n{'row':46s} {'ms/call':>9s} {'us/step':>9s}")
    for name, dt in rows.items():
        per_step = dt * 1e6 / T if "loop" not in name else dt * 1e6
        ms = dt * 1e3 if "loop" not in name else dt * 1e3 * T
        print(f"{name:46s} {ms:9.2f} {per_step:9.1f}")
    print(f"\nheadline {B*K*T/base/1e6:.1f} M particle-steps/s")

    # xprof attempt
    try:
        trace_dir = "/tmp/xprof_r3"
        with jax.profiler.trace(trace_dir):
            step = infer_step("smc")
            c = step((jnp.float32(0), key))
            float(c[0])
        import os
        n = sum(len(fs) for _, _, fs in os.walk(trace_dir))
        print(f"xprof trace captured: {trace_dir} ({n} files)")
    except Exception as e:
        print(f"xprof trace failed: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
