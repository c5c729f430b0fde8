"""Bisect the online-filter vs offline-engine per-step gap (round 4).

bench.py's device-plane serving row (200 `online.step_fn` updates inside
one jit via `batched_steps`) measured 2.07 ms/step at the headline shape
(LGSSM T=200 B=10 K=10k) while the offline `infer` scan body costs
0.25 ms/step on the same model. Same model, same resampler, same shape -
so ~1.8 ms/step of the serving number is step_fn-side overhead, not
physics. This probe A/Bs the two paths and strips step_fn features one
at a time to find it.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/serving_gap_probe_r4.py
"""

import time

import jax
import jax.numpy as jnp

from aesmc_tpu import inference, online, statistics
from aesmc_tpu.models import lgssm

T, B, K = 200, 10, 10_000
CHAIN = 40


def timed(fn, *args, repeats=3):
    # Warm up with a scalar fetch, exactly as the timed loop does:
    # block_until_ready returns early through the tunnel (CLAUDE.md), so
    # the first timed repeat could otherwise overlap residual warmup.
    out = fn(*args)
    leaves = [x for x in jax.tree_util.tree_leaves(out)
              if hasattr(x, "block_until_ready")]
    _ = float(leaves[0].reshape(-1)[0])
    best = float("inf")
    for _ in range(repeats):
        t0 = time.time()
        out = fn(*args)
        leaves = [x for x in jax.tree_util.tree_leaves(out)
                  if hasattr(x, "block_until_ready")]
        _ = float(leaves[0].reshape(-1)[0])
        best = min(best, time.time() - t0)
    return best


def main():
    key = jax.random.PRNGKey(0)
    initial = lgssm.Initial(0.0, 1.0)
    transition = lgssm.Transition.create(0.9, 1.0)
    emission = lgssm.Emission.create(1.0, 0.2)
    proposal = lgssm.Proposal.create(1.0, 1.0, key)
    _, obs = statistics.sample_from_prior(initial, transition, emission,
                                          T, B, key)
    print(f"backend: {jax.default_backend()}", flush=True)

    # --- offline engine, chained (the headline measurement pattern).
    @jax.jit
    def offline_chain(k):
        def body(acc, _):
            k2 = jax.random.fold_in(k, acc.astype(jnp.int32)[()] % 7)
            out = inference.infer("smc", obs, initial, transition, emission,
                                  proposal, K, key=k2,
                                  return_log_marginal_likelihood=True,
                                  return_latents=False,
                                  return_log_weight=False)
            return acc + out["log_marginal_likelihood"].sum(), None

        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=CHAIN)
        return acc

    dt = timed(offline_chain, key) / (CHAIN * T)
    print(f"offline infer scan body:        {dt*1e6:8.1f} us/step", flush=True)

    # --- online step via batched_steps, default features (bench.py row).
    def run_variant(name, chain=4, **kwargs):
        init_fn, step_fn = online.make_online_filter(
            initial, transition, emission, proposal, K, **kwargs)
        keys = online.split_step_keys(key, T + 1)

        @jax.jit
        def dev(k0):
            fs = init_fn(obs[0], k0)
            def body(st, inp):
                def inner(st2, inp2):
                    st2, info = step_fn(st2, inp2[0], inp2[1])
                    return st2, info["log_pred"]
                st, lp = jax.lax.scan(inner, st, (obs[1:], keys[1:T]))
                return st, lp[-1].sum()
            fs, acc = jax.lax.scan(body, fs, None, length=chain)
            return acc

        dtv = timed(dev, keys[0]) / (chain * (T - 1))
        print(f"{name:32s}{dtv*1e6:8.1f} us/step", flush=True)
        return dtv

    run_variant("online default:")
    run_variant("online adaptive 0.5:", resampling_criterion=0.5)
    run_variant("online multinomial:", resampling_method="multinomial")
    run_variant("online xla impl:", resampling_implementation="xla")


if __name__ == "__main__":
    main()
