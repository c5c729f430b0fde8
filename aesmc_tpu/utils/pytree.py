"""Pytree helpers."""

from __future__ import annotations

import jax


def unstack(tree, axis: int = 0):
    """Splits a stacked `[T, ...]` pytree into a list of T pytrees -
    list-of-timesteps view for reference-style consumers (the engine
    returns stacked arrays; see aesmc_tpu.inference)."""
    leaves = jax.tree_util.tree_leaves(tree)
    length = leaves[0].shape[axis]
    return [jax.tree_util.tree_map(
        lambda x: jax.lax.index_in_dim(x, t, axis, keepdims=False), tree)
        for t in range(length)]
