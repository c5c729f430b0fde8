"""Shared GSPMD sharding-constraint helpers.

One home for the particle-cloud constraint closure that was previously
copy-pasted into inference.py, online.py, rbpf.py and smoothing.py
(round-5 review consolidation). smc2.py keeps its own variant: its
leading axis is the theta-particle axis with different rank rules.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["make_cloud_constrainer"]


def make_cloud_constrainer(mesh, data_axis, particle_axis):
    """Returns `constrain(tree, lead_dims=1)` pinning cloud shardings.

    Each array leaf is annotated `[None * (lead_dims - 1), data_axis,
    particle_axis, None...]` via `jax.lax.with_sharding_constraint` -
    i.e. a `[.., B, K, ...]` cloud with the batch axis on `data_axis`
    and the particle axis on `particle_axis` of `mesh`, where
    `lead_dims` counts the axes up to and including B (use 2 for
    `[T, B, K, ...]` stacked clouds). Identity when `mesh is None`, so
    call sites need no branching.
    """
    if mesh is None:
        def identity(tree, lead_dims=1):
            del lead_dims
            return tree
        return identity

    from jax.sharding import NamedSharding, PartitionSpec

    def constrain(tree, lead_dims=1):
        def leaf(x):
            spec = PartitionSpec(
                *([None] * (lead_dims - 1)), data_axis, particle_axis,
                *([None] * (jnp.ndim(x) - lead_dims - 1)))
            return jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, spec))
        return jax.tree_util.tree_map(leaf, tree)

    return constrain
