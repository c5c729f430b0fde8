"""Round-3 probe: compute_dtype='bfloat16' on the deep-model rows.
PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/bf16_probe_r3.py"""
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

from aesmc_tpu import losses, statistics
from aesmc_tpu.models import bouncing_ball, vrnn


def timed_chained(make_step, init, repeats=3, chain=5):
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


def vrnn_row(name, latent, hidden, obs_dim, mlp_hidden, T, B, K, key):
    for dt_name in (None, "bfloat16"):
        initial, encoder, transition, emission, proposal = vrnn.make_model(
            latent_dim=latent, hidden_dim=hidden, obs_dim=obs_dim, key=key,
            mlp_hidden=mlp_hidden, compute_dtype=dt_name)
        _, obs = vrnn.generate(encoder, initial, transition, emission,
                               T, B, key)

        def step(carry):
            acc, k = carry
            k, sub = jax.random.split(k)
            loss = vrnn.vrnn_loss(obs, K, "aesmc", initial, encoder,
                                  transition, emission, proposal, key=sub)
            return acc + loss, k

        dt = timed_chained(step, (jnp.float32(0), key))
        print(f"{name} [{dt_name or 'f32'}]: {dt*1e3:.2f} ms = "
              f"{B*K*T/dt/1e6:.1f} M particle-steps/s", flush=True)


def bb_row(name, num_pixels, hidden, T, B, K, key):
    for dt_name in (None, "bfloat16"):
        comps = bouncing_ball.make_model(key, num_pixels=num_pixels,
                                         hidden=hidden,
                                         compute_dtype=dt_name)
        _, obs = statistics.sample_from_prior(comps[0], comps[1], comps[2],
                                              T, B, key)

        def step(carry):
            acc, k = carry
            k, sub = jax.random.split(k)
            loss = losses.get_loss(obs, K, "aesmc", *comps, key=sub)
            return acc + loss, k

        dt = timed_chained(step, (jnp.float32(0), key))
        print(f"{name} [{dt_name or 'f32'}]: {dt*1e3:.2f} ms = "
              f"{B*K*T/dt/1e6:.1f} M particle-steps/s", flush=True)


def main():
    print("backend:", jax.default_backend(), file=sys.stderr)
    key = jax.random.PRNGKey(0)
    # The round-2 bench rows.
    vrnn_row("VRNN bench-row T=64 B=16 K=256 h=32", 8, 32, 16, 32,
             64, 16, 256, key)
    bb_row("bouncing-ball bench-row T=64 B=16 K=256 h=64", 32, 64,
           64, 16, 256, key)
    # Scaled rows where the nets dominate (production-sized MLP/GRU).
    vrnn_row("VRNN-large T=64 B=16 K=1024 h=256 mlp=256", 32, 256, 64,
             256, 64, 16, 1024, key)
    bb_row("bouncing-ball-large T=64 B=16 K=1024 h=512", 64, 512,
           64, 16, 1024, key)


if __name__ == "__main__":
    main()
