"""Sharded training: pjit the fused train step over a device mesh.

Components (parameters) are replicated; observations are sharded over the
'data' axis; per-step latents/log-weights carry ('data', 'particle')
sharding constraints inside the scan (see `infer(mesh=...)`). XLA inserts
the gradient psums and the resampling collectives; the loss batch-mean
(/root/reference/aesmc/losses.py:64) becomes a cross-'data' mean
automatically.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import losses


def shard_batch(observations, mesh: Mesh, data_axis: str = "data"):
    """Places stacked `[T, B, ...]` observations with B sharded over
    `data_axis` (leading time axis replicated)."""
    def place(x):
        spec = P(None, data_axis, *([None] * (jnp.ndim(x) - 2)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(place, observations)


def make_sharded_train_step(num_particles: int, algorithm: str,
                            optimizer: optax.GradientTransformation,
                            mesh: Mesh,
                            resampling_method: str = "systematic",
                            resampling_implementation="auto",
                            data_axis: str = "data",
                            particle_axis: str = "particle") -> Callable:
    """Builds the pjit-compiled multi-chip train step.

    Returns `(components, opt_state, observations, key) ->
    (components, opt_state, loss)`; pass observations through
    `shard_batch` (or leave unsharded - the constraint on the loss inputs
    pulls them into place).
    """

    def step(components, opt_state, observations, key):
        def loss_fn(components_):
            initial, transition, emission, proposal = components_
            return losses.get_loss(
                observations, num_particles, algorithm, initial, transition,
                emission, proposal, key=key,
                resampling_method=resampling_method,
                resampling_implementation=resampling_implementation,
                mesh=mesh, data_axis=data_axis, particle_axis=particle_axis)

        loss, grads = jax.value_and_grad(loss_fn)(components)
        updates, opt_state = optimizer.update(grads, opt_state, components)
        components = optax.apply_updates(components, updates)
        return components, opt_state, loss

    replicated = NamedSharding(mesh, P())
    return jax.jit(
        step,
        in_shardings=(replicated, replicated, None, replicated),
        out_shardings=(replicated, replicated, replicated))
