"""SQMC step-cost breakdown (round 5; VERDICT r4 missing #4).

The round-4 wave table has SQMC at 60.9 ms vs plain SMC's 3.55 ms at
T=100 B=1 K=4096 (17x) with a one-sentence attribution ("per-step
Hilbert sort + Sobol, both sequential-ish, VPU-bound") and no split.
This probe measures each per-step ingredient in isolation with the
chained harness, at the wave shape and at K=16,384:

  1. scrambled Sobol generation ([K, 2] per step)
  2. the Hilbert/value argsort of the particle cloud ([B, K])
  3. the point-set first-coordinate argsort ([B, K])
  4. CDF + searchsorted + gathers (the inverse-CDF resample)
  5. quantile-transform proposal + model log-probs (via plain SMC)
  6. the full sqmc_infer step (the row being decomposed)

Run: PYTHONPATH=/root/repo:/root/.axon_site \
       python benchmarks/sqmc_probe_r5.py
"""

import pathlib
import sys
import time
from functools import partial

import jax

jax.config.update("jax_compilation_cache_dir",
                  str(pathlib.Path(__file__).parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from aesmc_tpu import inference, sqmc, statistics  # noqa: E402
from aesmc_tpu import math as amath  # noqa: E402
from aesmc_tpu.models import lgssm  # noqa: E402

T, B = 100, 1
CHAIN = 10


def timed_scan(name, body, init, length, repeats=3):
    """Time a jitted lax.scan of `body` over `length` steps x CHAIN."""
    @jax.jit
    def run(carry):
        def outer(c, _):
            c, _ = jax.lax.scan(body, c, None, length=length)
            return c, None
        c, _ = jax.lax.scan(outer, carry, None, length=CHAIN)
        return c

    carry = run(init)
    float(jnp.sum(jax.tree_util.tree_leaves(carry)[0]))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        carry = run(init)
        float(jnp.sum(jax.tree_util.tree_leaves(carry)[0]))
        best = min(best, time.perf_counter() - t0)
    per_step = best / (CHAIN * length)
    print(f"{name:<48} {per_step*1e6:9.1f} us/step "
          f"({per_step*length*1e3:7.2f} ms per T={length} sweep)",
          flush=True)
    return per_step


def make_problem(K):
    key = jax.random.PRNGKey(0)
    A_, Q_, EM_, R_ = 0.9, 1.0, 1.0, 0.5
    initial = lgssm.Initial(0.0, 1.0)
    transition = lgssm.Transition.create(A_, np.sqrt(Q_))
    emission = lgssm.Emission.create(EM_, np.sqrt(R_))
    prec_t = 1.0 / Q_ + EM_ ** 2 / R_
    prec_0 = 1.0 + EM_ ** 2 / R_
    proposal = lgssm.Proposal(
        lin_0_weight=jnp.asarray((EM_ / R_) / prec_0),
        lin_0_bias=jnp.asarray(0.0),
        lin_t_weight=jnp.asarray([(A_ / Q_) / prec_t,
                                  (EM_ / R_) / prec_t]),
        lin_t_bias=jnp.asarray(0.0),
        scale_0=float(np.sqrt(1 / prec_0)),
        scale_t=float(np.sqrt(1 / prec_t)))
    comps = (initial, transition, emission, proposal)
    _, obs = statistics.sample_from_prior(initial, transition, emission,
                                          T, B, key)
    return comps, obs, key


def decompose(K):
    print(f"\n==== K={K} T={T} B={B} ====", flush=True)
    comps, obs, key = make_problem(K)

    # 1. Sobol generation (dim=2, per step, per batch row).
    def sobol_body(c, _):
        acc, k = c
        k, sub = jax.random.split(k)
        pts = jax.vmap(lambda kk: sqmc.sobol_points(K, 2, key=kk))(
            jax.random.split(sub, B))
        return (acc + jnp.sum(pts[:, 0]), k), None
    t_sobol = timed_scan("sobol_points [B,K,2]", sobol_body,
                         (jnp.float32(0), key), T)

    # 2. Particle-cloud argsort ([B, K] f32 values; D=1 so the Hilbert
    #    sort IS a value argsort).
    x0 = jax.random.normal(key, (B, K))

    def sort_body(c, _):
        acc, x = c
        o = jnp.argsort(x, axis=-1)
        xs = jnp.take_along_axis(x, o, axis=-1)
        return (acc + xs[:, 0].sum(), xs * 1.000001), None
    t_sort = timed_scan("argsort+gather [B,K] (x1)", sort_body,
                        (jnp.float32(0), x0), T)

    # 3. CDF + searchsorted + index gathers (inverse-CDF core).
    lw0 = jax.random.normal(key, (B, K)) * 0.1
    u0 = jnp.sort(jax.random.uniform(key, (B, K)), axis=-1)

    def icdf_body(c, _):
        acc, lw = c
        w = amath.exponentiate_and_normalize(lw, dim=1)
        cdf = jnp.cumsum(w, axis=1)
        pos = jnp.clip(
            jax.vmap(partial(jnp.searchsorted, side="right"))(cdf, u0),
            0, K - 1)
        g = jnp.take_along_axis(lw, pos, axis=1)
        return (acc + g[:, 0], lw * 1.000001), None
    t_icdf = timed_scan("cumsum+searchsorted+gather", icdf_body,
                        (jnp.zeros((B,)), lw0), T)

    # 5/6. Plain SMC and full SQMC sweeps (whole T inside one jit).
    def smc_run(c, _):
        acc, k = c
        k, sub = jax.random.split(k)
        out = inference.infer(
            "smc", obs, *comps, num_particles=K, key=sub,
            return_log_marginal_likelihood=True, return_latents=False,
            return_log_weight=False)
        return (acc + jnp.mean(out["log_marginal_likelihood"]), k), None
    t_smc = timed_scan("plain SMC full sweep", smc_run,
                       (jnp.float32(0), key), 1)

    def make_sqmc_run(impl):
        def sqmc_run(c, _):
            acc, k = c
            k, sub = jax.random.split(k)
            out = sqmc.sqmc_infer(
                obs, *comps, num_particles=K, key=sub,
                resampling_implementation=impl,
                return_log_marginal_likelihood=True,
                return_latents=False, return_log_weight=False)
            return (acc + jnp.mean(out["log_marginal_likelihood"]),
                    k), None
        return sqmc_run

    t_sqmc = timed_scan("SQMC full sweep (xla icdf)",
                        make_sqmc_run("xla"), (jnp.float32(0), key), 1)
    t_sqmc_p = timed_scan("SQMC full sweep (pallas fused icdf)",
                          make_sqmc_run("pallas"),
                          (jnp.float32(0), key), 1)
    print(f"  pallas-route speedup: {t_sqmc / t_sqmc_p:.2f}x",
          flush=True)

    step_sqmc = t_sqmc / T
    step_smc = t_smc / T
    print(f"  accounted: sobol {t_sobol*1e6:.1f} + 2x sort "
          f"{2*t_sort*1e6:.1f} + icdf {t_icdf*1e6:.1f} "
          f"+ smc-model-math {step_smc*1e6:.1f} us "
          f"= {(t_sobol + 2*t_sort + t_icdf + step_smc)*1e6:.1f} "
          f"vs SQMC {step_sqmc*1e6:.1f} us/step", flush=True)


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    for K in (4096, 16_384):
        decompose(K)


if __name__ == "__main__":
    main()
