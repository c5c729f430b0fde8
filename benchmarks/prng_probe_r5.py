"""PRNG-impl A/B for deep-model sweeps (round 5; VERDICT r4 missing #2).

The round-5 VRNN ablation (vrnn_ablation_r5.py) measured the per-step
proposal sampling - threefry bits + erf_inv on [B, K, 64] - at 23.9 ms
of the 71.0 ms aesmc sweep (34%). JAX's 'rbg' / 'unsafe_rbg' key impls
use the TPU's hardware RNG instructions for bit generation instead of
threefry's 20-round software block cipher. The engine is PRNG-impl
agnostic (keys thread through jax.random.split / typed key arrays), so
the impl is a USER KNOB: pass `key=jax.random.key(seed, impl='rbg')`.

This probe A/Bs the full VRNN-wide aesmc/iwae sweeps and the sampling
micro-row across impls, plus the LGSSM headline shape (expected ~flat:
its per-step sampling is [B, K] scalars, kernel-bound elsewhere).

Caveat documented in API.md: rbg's split/fold_in stream-independence
guarantees are weaker than threefry's (see the JAX PRNG design note);
default stays threefry, rbg is the deep-model throughput knob.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/prng_probe_r5.py
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

from aesmc_tpu import inference, statistics  # noqa: E402
from aesmc_tpu.models import lgssm, vrnn  # noqa: E402

T, B, K = 64, 16, 4096
LD, HD, OD, MLPH = 64, 256, 64, 256
CHAIN = 3


def timed(name, fn, init, per=1):
    jfn = jax.jit(fn)
    try:
        carry = jfn(init)
        float(jnp.sum(jax.tree_util.tree_leaves(carry)[0]))
    except Exception as e:  # noqa: BLE001 - report and keep probing
        print(f"{name:<56} FAILED: {type(e).__name__}: {e}", flush=True)
        return None
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        carry = jfn(init)
        float(jnp.sum(jax.tree_util.tree_leaves(carry)[0]))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:<56} {best/per*1e3:9.3f} ms/unit", flush=True)
    return best / per


def main():
    print(f"backend: {jax.default_backend()}  T={T} B={B} K={K} "
          f"L={LD} H={HD} mlp={MLPH}", flush=True)
    setup_key = jax.random.PRNGKey(0)
    comps = vrnn.make_model(latent_dim=LD, hidden_dim=HD, obs_dim=OD,
                            key=setup_key, mlp_hidden=MLPH)
    initial, encoder, transition, emission, proposal = comps
    _, obs = vrnn.generate(encoder, initial, transition, emission,
                           T, B, setup_key)

    impls = [("threefry", jax.random.key(0, impl="threefry2x32")),
             ("rbg", jax.random.key(0, impl="rbg")),
             ("unsafe_rbg", jax.random.key(0, impl="unsafe_rbg"))]

    # Sampling micro-row: normal [B, K, LD] per step.
    for name, key in impls:
        def prng(c):
            acc, k = c
            def body(cc, _):
                a, kk = cc
                kk, sub = jax.random.split(kk)
                z = jax.random.normal(sub, (B, K, LD))
                return (a + jnp.sum(z[0, 0]), kk), None
            (acc, k), _ = jax.lax.scan(body, (acc, k), None,
                                       length=T * CHAIN)
            return acc, k
        timed(f"PRNG normal [B,K,{LD}] x T, {name}", prng,
              (jnp.float32(0), key), per=CHAIN)

    # Full VRNN-wide sweeps.
    for alg in ("aesmc", "iwae"):
        for name, key in impls:
            def full(c, alg=alg):
                acc, k = c
                def body(cc, _):
                    a, kk = cc
                    kk, sub = jax.random.split(kk)
                    loss = vrnn.vrnn_loss(obs, K, alg, initial, encoder,
                                          transition, emission, proposal,
                                          key=sub)
                    return (a + loss, kk), None
                (acc, k), _ = jax.lax.scan(body, (acc, k), None,
                                           length=CHAIN)
                return acc, k
            timed(f"vrnn_loss {alg} full sweep (T={T}), {name}", full,
                  (jnp.float32(0), key), per=CHAIN)

    # LGSSM headline shape (T=200 B=10 K=10k): expected ~flat.
    lT, lB, lK = 200, 10, 10_000
    lg = (lgssm.Initial(0.0, 1.0), lgssm.Transition.create(0.9, 1.0),
          lgssm.Emission.create(1.0, 0.2),
          lgssm.Proposal.create(1.0, 1.0, setup_key))
    _, lobs = statistics.sample_from_prior(lg[0], lg[1], lg[2], lT, lB,
                                           setup_key)
    for name, key in impls:
        def smc(c):
            acc, k = c
            def body(cc, _):
                a, kk = cc
                kk, sub = jax.random.split(kk)
                out = inference.infer(
                    "smc", lobs, *lg, num_particles=lK, key=sub,
                    return_log_marginal_likelihood=True,
                    return_latents=False, return_log_weight=False)
                return (a + jnp.mean(out["log_marginal_likelihood"]),
                        kk), None
            (acc, k), _ = jax.lax.scan(body, (acc, k), None, length=10)
            return acc, k
        dt = timed(f"LGSSM headline T=200 B=10 K=10k, {name}", smc,
                   (jnp.float32(0), key), per=10)
        if dt:
            print(f"    = {lB*lK*lT/dt/1e6:.1f} M ps/s", flush=True)


if __name__ == "__main__":
    main()
