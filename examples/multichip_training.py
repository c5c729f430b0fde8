"""Multi-chip AESMC training over a ('data', 'particle') mesh.

On real multi-chip hardware this runs as-is; on a single-host dev box it
demonstrates the identical code path on virtual CPU devices (set before
any jax backend initializes):

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
        JAX_PLATFORMS=cpu PYTHONPATH=. python examples/multichip_training.py
"""

import os
import pathlib
import sys

if "xla_force_host_platform_device_count" not in os.environ.get(
        "XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                               " --xla_force_host_platform_device_count=8")

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

if os.environ.get("PALLAS_AXON_POOL_IPS"):
    # This dev box force-registers a single tunneled TPU; switch to the
    # virtual CPU mesh for the multi-device demo.
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import optax

from aesmc_tpu import parallel, statistics
from aesmc_tpu.models import lgssm


def main():
    n = jax.device_count()
    data, particle = (2, n // 2) if n % 2 == 0 and n > 1 else (1, n)
    mesh = parallel.make_mesh(data=data, particle=particle)
    print(f"devices: {n}, mesh: data={data} x particle={particle}")

    key = jax.random.PRNGKey(0)
    initial = lgssm.Initial(0.0, 1.0)
    true_transition = lgssm.Transition.create(0.9, 1.0)
    emission = lgssm.Emission.create(1.0, 0.1)
    proposal = lgssm.Proposal.create(1.0, 1.0, key)

    batch_size, num_particles, num_timesteps = 4 * data, 64 * particle, 25
    _, obs = statistics.sample_from_prior(
        initial, true_transition, emission, num_timesteps, batch_size, key)
    obs = parallel.shard_batch(obs, mesh)

    optimizer = optax.adam(5e-2)
    components = (initial, lgssm.Transition.create(0.0, 1.0), emission,
                  proposal)
    # Explicit collective resampling: distributed normalization +
    # global-CDF search + cross-shard particle exchange in one shard_map
    # (fused into one Pallas kernel per shard on real TPUs).
    fused = parallel.make_distributed_fused_resampler(mesh)
    step = parallel.make_sharded_train_step(
        num_particles, "aesmc", optimizer, mesh,
        resampling_implementation=fused)
    opt_state = optimizer.init(components)

    for i in range(60):
        key, sub = jax.random.split(key)
        components, opt_state, loss = step(components, opt_state, obs, sub)
        if i % 10 == 0:
            print(f"step {i:3d}  loss {float(loss):9.2f}  "
                  f"transition.mult {float(components[1].mult):.3f}")
    print(f"final transition.mult = {float(components[1].mult):.3f} "
          f"(true 0.9)")

    # ---- Config-5 layout: DIFFERENTIABLE soft resampling distributed
    # over the mesh with the O(K/n)-memory ring exchange (BASELINE
    # config 5: "1M particles x batch 256 sharded ... with
    # differentiable soft/OT resampling"). Gradients flow into the
    # pre-resampling weights through the exchanged correction columns.
    soft = parallel.make_distributed_fused_resampler(
        mesh, exchange="ring", method="soft", soft_alpha=0.5)
    soft_step = parallel.make_sharded_train_step(
        num_particles, "aesmc", optimizer, mesh,
        resampling_method="soft", resampling_implementation=soft)
    comps2 = (initial, lgssm.Transition.create(0.0, 1.0), emission,
              proposal)
    opt_state2 = optimizer.init(comps2)
    for i in range(30):
        key, sub = jax.random.split(key)
        comps2, opt_state2, loss = soft_step(comps2, opt_state2, obs, sub)
    print(f"distributed SOFT resampling (ring): final transition.mult = "
          f"{float(comps2[1].mult):.3f} (true 0.9), loss {float(loss):.2f}")

    # ---- Distributed OT resampling: ring-streamed Sinkhorn (each
    # device does O(K_local * K_global) cost work per update).
    from aesmc_tpu import inference

    dist_ot = parallel.make_distributed_ot_resampler(
        mesh, num_iterations=15)
    out = jax.jit(lambda o, k: inference.infer(
        "smc", o, initial, true_transition, emission, proposal,
        num_particles, key=k, resampling_method="ot",
        resampling_implementation=dist_ot, mesh=mesh,
        return_log_marginal_likelihood=True, return_latents=False,
        return_log_weight=False))(obs, key)
    print(f"distributed OT resampling: log-ml = "
          f"{[round(float(v), 2) for v in out['log_marginal_likelihood']]}")


if __name__ == "__main__":
    main()
