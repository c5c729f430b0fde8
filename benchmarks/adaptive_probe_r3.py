"""Round-3 probe: adaptive-ESS headline after emit_idx skip + config-5
soft 1M train step. Run on TPU: PYTHONPATH=/root/repo:/root/.axon_site
python benchmarks/adaptive_probe_r3.py"""
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

from aesmc_tpu import inference, statistics, train as atrain
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
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        carry = run(init)
        float(jnp.sum(jax.tree_util.tree_leaves(carry)[0]))
        times.append(time.perf_counter() - t0)
    return stdstats.median(times) / chain


def main():
    print("backend:", jax.default_backend(), file=sys.stderr)
    key = jax.random.PRNGKey(0)
    initial = lgssm.Initial(0.0, 1.0)
    transition = lgssm.Transition.create(0.9, 1.0)
    emission = lgssm.Emission.create(1.0, 0.2)
    proposal = lgssm.Proposal.create(1.0, 1.0, key)

    T, B, K = 200, 10, 10000
    _, obs = statistics.sample_from_prior(initial, transition, emission,
                                          T, B, key)

    for label, crit in (("always", "always"), ("adaptive-0.5", 0.5)):
        def smc_step(carry, crit=crit):
            lml, k = carry
            k, sub = jax.random.split(k)
            out = inference.infer(
                "smc", obs, initial, transition, emission, proposal, K,
                key=sub, resampling_criterion=crit,
                return_log_marginal_likelihood=True,
                return_latents=False,
                return_log_weight=False)["log_marginal_likelihood"]
            return lml + jnp.mean(out), k
        dt = timed_chained(smc_step, (jnp.float32(0), key))
        print(f"{label}: {dt*1e3:.2f} ms = {B*K*T/dt/1e6:.1f} M "
              f"particle-steps/s")

    # config-5 soft 1M train step
    import optax
    T5, B5, K5 = 10, 2, 1_000_000
    _, obs5 = statistics.sample_from_prior(initial, transition, emission,
                                           T5, B5, key)
    optimizer = optax.adam(1e-2)
    comps = (initial, lgssm.Transition.create(0.5, 1.0), emission, proposal)
    step_soft = atrain.make_train_step(K5, "aesmc", optimizer,
                                       resampling_method="soft", jit=False)
    opt_state = optimizer.init(comps)

    def soft_chain(carry):
        comps_, opt_state_, k = carry
        k, sub = jax.random.split(k)
        comps_, opt_state_, _ = step_soft(comps_, opt_state_, obs5, sub)
        return comps_, opt_state_, k

    t0 = time.time()
    dt5 = timed_chained(soft_chain, (comps, opt_state, key), repeats=3,
                        chain=3)
    print(f"soft 1M train step T={T5} B={B5}: {dt5*1e3:.1f} ms/step "
          f"(compile {time.time()-t0:.0f}s) = "
          f"{B5*K5*T5/dt5/1e6:.1f} M particle-steps/s")


if __name__ == "__main__":
    main()
