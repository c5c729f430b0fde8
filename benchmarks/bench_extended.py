"""Extended benchmarks: BASELINE.json configs 2-4 on the real TPU.

Not run by the driver (bench.py is the one-line headline); run manually:
    PYTHONPATH=.:/root/.axon_site python benchmarks/bench_extended.py
"""

import pathlib
import statistics as stdstats
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  str(pathlib.Path(__file__).parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def timed_chained(make_step, init, repeats=3, chain=40):
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


def bench_infer(name, comps, obs, num_particles, T, B, **kwargs):
    from aesmc_tpu import inference

    def step(carry):
        acc, k = carry
        k, sub = jax.random.split(k)
        out = inference.infer(
            "smc", obs, *comps, num_particles=num_particles, key=sub,
            return_log_marginal_likelihood=True, return_latents=False,
            return_log_weight=False, **kwargs)["log_marginal_likelihood"]
        return acc + jnp.mean(out), k

    dt = timed_chained(step, (jnp.float32(0), jax.random.PRNGKey(0)))
    print(f"{name}: {dt*1e3:.2f} ms/infer = "
          f"{B*num_particles*T/dt/1e6:.1f} M particle-steps/s", flush=True)


def main():
    from aesmc_tpu import statistics
    from aesmc_tpu.models import (bouncing_ball, lgssm_nd,
                                  stochastic_volatility, vrnn)

    key = jax.random.PRNGKey(0)
    print(f"backend: {jax.default_backend()}", flush=True)

    # Config 2: 10-dim LGSSM, 1000 particles, multinomial resampling.
    T, B, K = 100, 10, 1000
    comps = lgssm_nd.make_model(dim=10, key=key)
    _, obs = statistics.sample_from_prior(comps[0], comps[1], comps[2],
                                          T, B, key)
    bench_infer(f"10-dim LGSSM T={T} B={B} K={K} multinomial",
                comps, obs, K, T, B, resampling_method="multinomial")

    # Config 3: stochastic volatility, systematic + stratified.
    T, B, K = 200, 10, 1000
    sv = stochastic_volatility.make_model()
    _, obs = statistics.sample_from_prior(sv[0], sv[1], sv[2], T, B, key)
    for method in ("systematic", "stratified"):
        bench_infer(f"stoch-vol T={T} B={B} K={K} {method}",
                    sv, obs, K, T, B, resampling_method=method)

    # Config 4: bouncing ball, 64-step sequences, MLP proposal.
    T, B, K = 64, 16, 256
    bb = bouncing_ball.make_model(key, num_pixels=32, hidden=64)
    _, obs = statistics.sample_from_prior(bb[0], bb[1], bb[2], T, B, key)
    bench_infer(f"bouncing-ball T={T} B={B} K={K}", bb, obs, K, T, B)

    # VRNN (deep recurrent SSM).
    T, B, K = 64, 16, 256
    initial, encoder, transition, emission, proposal = vrnn.make_model(
        latent_dim=8, hidden_dim=32, obs_dim=16, key=key)
    _, obs = vrnn.generate(encoder, initial, transition, emission, T, B,
                           key)

    def step(carry):
        acc, k = carry
        k, sub = jax.random.split(k)
        loss = vrnn.vrnn_loss(obs, K, "aesmc", initial, encoder, transition,
                              emission, proposal, key=sub)
        return acc + loss, k

    dt = timed_chained(step, (jnp.float32(0), key))
    print(f"VRNN T={T} B={B} K={K} aesmc loss: {dt*1e3:.2f} ms = "
          f"{B*K*T/dt/1e6:.1f} M particle-steps/s", flush=True)

    # Lorenz-96 chaotic data assimilation (round-3 model family):
    # bootstrap vs the auto-built UKF assimilation proposal.
    from aesmc_tpu.models import lorenz
    T, B, K = 50, 8, 1024
    lz_boot = lorenz.make_model(dim=8, emission_scale=0.5,
                                proposal="bootstrap")
    _, obs = statistics.sample_from_prior(lz_boot[0], lz_boot[1],
                                          lz_boot[2], T, B, key)
    bench_infer(f"Lorenz-96 D=8 T={T} B={B} K={K} bootstrap",
                lz_boot, obs, K, T, B)
    # Closed-form diagonal update (default). The generic per-particle
    # UKF path (linearization='unscented') measured 1017.7 ms here -
    # TPU-batched tiny [8, 8] Cholesky lowers to serialized scalar
    # code; see BENCH_NOTES "Lorenz-96 rows".
    lz_assim = lorenz.make_model(dim=8, emission_scale=0.5)
    bench_infer(f"Lorenz-96 D=8 T={T} B={B} K={K} assimilation (diag)",
                lz_assim, obs, K, T, B)

    # Discrete-latent HMM (round-3 model family): int32 particles, with
    # the closed-form fully-adapted proposal vs bootstrap. Exercises the
    # integer-column path through the fused resample+gather at the
    # headline shape.
    from aesmc_tpu.models import hmm
    T, B, K = 200, 10, 10_000
    hm = hmm.make_model(num_states=8, proposal="optimal")
    _, obs = statistics.sample_from_prior(hm[0], hm[1], hm[2], T, B, key)
    bench_infer(f"HMM D=8 T={T} B={B} K={K} fully-adapted",
                hm, obs, K, T, B)
    hm_boot = hmm.make_model(num_states=8, proposal="bootstrap")
    bench_infer(f"HMM D=8 T={T} B={B} K={K} bootstrap",
                hm_boot, obs, K, T, B)

    # Particle Gibbs (PGAS) sweep rate - the posterior-sampling module.
    from aesmc_tpu import csmc, statistics as astats
    from aesmc_tpu.models import lgssm as _lgssm
    T, B, K = 50, 4, 256
    initial = _lgssm.Initial(0.0, 1.0)
    transition = _lgssm.Transition.create(0.9, 1.0)
    emission = _lgssm.Emission.create(1.0, 0.2)
    proposal = _lgssm.Proposal.create(1.0, 1.0, key)
    lat, obs = astats.sample_from_prior(initial, transition, emission,
                                        T, B, key)

    def pg_step(carry):
        ref, k = carry
        k, sub = jax.random.split(k)
        new_ref, _ = csmc.particle_gibbs_step(
            ref, obs, initial, transition, emission, proposal, K, sub,
            ancestor_sampling=True)
        return new_ref, k

    dt = timed_chained(pg_step, (jnp.asarray(lat), key))
    print(f"Particle Gibbs (PGAS) T={T} B={B} K={K}: {dt*1e3:.2f} ms/"
          f"sweep = {1/dt:.1f} sweeps/s", flush=True)


if __name__ == "__main__":
    main()
