"""VRNN-wide roofline ablation (round 5; VERDICT r4 missing #2).

The round-4 MFU probe put VRNN-wide (L=64 H=256 mlp=256, K=4096) at
0.66 TFLOP/s = 0.34% MXU peak and called it "HBM/VPU-bound" - but the
implied traffic is ~1% of HBM peak too, so neither roofline axis binds
and the floor claim was unsupported. This probe decomposes the step by
systematic ablation (the round-3 headline-breakdown pattern):

  1. full vrnn_loss (aesmc: resampling every step)
  2. vrnn_loss iwae (same math, NO resampling)
  3. the two MLP stacks alone on the same shapes (pure MXU ceiling)
  4. PRNG normal [B, K, Dz] per step (proposal sampling cost)
  5. log_prob chain alone (3x MultivariateNormalDiag on [B, K, Dz])
  6. wide-state resample alone (XLA take_along route, 64 columns)

Together with the bytes-accessed columns now in mfu_probe_r4.py this
names the binding component arithmetically.

Run: PYTHONPATH=/root/repo:/root/.axon_site \
       python benchmarks/vrnn_ablation_r5.py
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

from aesmc_tpu import resampling  # noqa: E402
from aesmc_tpu import distributions as dists  # noqa: E402
from aesmc_tpu.models import vrnn  # noqa: E402

T, B, K = 64, 16, 4096
LD, HD, OD, MLPH = 64, 256, 64, 256
CHAIN = 3


def timed(name, fn, init, per=1):
    jfn = jax.jit(fn)
    carry = jfn(init)
    float(jnp.sum(jax.tree_util.tree_leaves(carry)[0]))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        carry = jfn(init)
        float(jnp.sum(jax.tree_util.tree_leaves(carry)[0]))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:<52} {best/per*1e3:9.3f} ms/unit", flush=True)
    return best / per


def main():
    key = jax.random.PRNGKey(0)
    print(f"backend: {jax.default_backend()}  T={T} B={B} K={K} "
          f"L={LD} H={HD} mlp={MLPH}", flush=True)
    comps = vrnn.make_model(latent_dim=LD, hidden_dim=HD, obs_dim=OD,
                            key=key, mlp_hidden=MLPH)
    initial, encoder, transition, emission, proposal = comps
    _, obs = vrnn.generate(encoder, initial, transition, emission,
                           T, B, key)

    # 1/2. Full loss, aesmc vs iwae (resampling on/off), CHAIN sweeps.
    for alg in ("aesmc", "iwae"):
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
        timed(f"vrnn_loss {alg} full sweep (T={T})", full,
              (jnp.float32(0), key), per=CHAIN)

    # 3. The two MLP stacks at step shapes, T-step scan x CHAIN.
    tb = transition.replace(h_seq=jnp.zeros((T, B, HD)))
    eb = emission.replace(h_seq=jnp.zeros((T, B, HD)))
    z0 = jax.random.normal(key, (B, K, LD))

    def mlps(c, _=None):
        def body(z, _):
            x = jnp.concatenate(
                [z, jnp.broadcast_to(jnp.zeros((B, 1, HD)),
                                     (B, K, HD))], axis=-1)
            loc_t = tb.prior_net(x)[..., :LD]
            loc_e = eb.decoder(x)
            return z + 1e-9 * (loc_t + loc_e[..., :LD]), None
        def outer(z, _):
            z, _ = jax.lax.scan(body, z, None, length=T)
            return z, None
        z, _ = jax.lax.scan(outer, c, None, length=CHAIN)
        return z
    timed(f"transition+emission MLPs alone (T={T})", mlps, z0,
          per=CHAIN)

    # 4. PRNG: normal [B, K, LD] per step.
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
    timed(f"PRNG normal [B,K,{LD}] per step (T={T})", prng,
          (jnp.float32(0), key), per=CHAIN)

    # 5. log_prob chain: 3x MVN-diag log_prob on [B, K, LD].
    def lps(c):
        z, acc = c
        def body(cc, _):
            zz, a = cc
            d = dists.MultivariateNormalDiag(zz, jnp.ones_like(zz))
            lp = d.log_prob(zz * 0.99) + d.log_prob(zz * 1.01) + \
                d.log_prob(zz)
            return (zz + 1e-9 * lp[..., None], a + lp[0, 0]), None
        (z, acc), _ = jax.lax.scan(body, (z, acc), None,
                                   length=T * CHAIN)
        return z, acc
    timed(f"3x MVN log_prob [B,K,{LD}] per step (T={T})", lps,
          (z0, jnp.float32(0)), per=CHAIN)

    # 6. Wide-state resample alone (64 columns -> XLA take_along).
    lw0 = jax.random.normal(key, (B, K)) * 0.1

    def res(c):
        z, lw, k = c
        def body(cc, _):
            zz, lww, kk = cc
            kk, sub = jax.random.split(kk)
            _, g = resampling.sample_ancestral_index_and_resample(
                lww, sub, zz, method="systematic",
                implementation="pallas", need_indices=False)
            return (g, lww * 1.000001, kk), None
        (z, lw, k), _ = jax.lax.scan(body, (z, lw, k), None,
                                     length=T * CHAIN)
        return z, lw, k
    timed(f"fused resample+gather [B,K,{LD}] per step (T={T})", res,
          (z0, lw0, key), per=CHAIN)


if __name__ == "__main__":
    main()
