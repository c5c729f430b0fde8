"""Device-mesh construction helpers."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def make_mesh(data: int = 1, particle: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """A 2-D `('data', 'particle')` mesh over `data * particle` devices.

    `data` shards the batch axis (the loss mean over batch becomes a
    cross-shard mean, /root/reference/aesmc/losses.py:64); `particle`
    shards the particle axis (per-timestep weight normalization and
    resampling become collectives, SURVEY.md S5.8).
    """
    if devices is None:
        devices = jax.devices()
    n = data * particle
    if len(devices) < n:
        raise ValueError(
            f"mesh needs {n} devices, found {len(devices)}")
    grid = np.asarray(devices[:n]).reshape(data, particle)
    return Mesh(grid, ("data", "particle"))


def data_particle_specs(mesh: Mesh):
    """(observation, state) NamedShardings for `[T, B, ...]` observations
    and `[B, K, ...]` state arrays on a ('data','particle') mesh."""
    obs = NamedSharding(mesh, PartitionSpec(None, "data"))
    state = NamedSharding(mesh, PartitionSpec("data", "particle"))
    return obs, state
