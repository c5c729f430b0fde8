"""A minimal MLP as a flax pytree dataclass.

Weights are plain jnp arrays (trainable leaves); the structure is static.
Matmuls batch over arbitrary leading dims - `[batch, particle, features]`
inputs stay one `dot_general`, which is what the MXU wants.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class MLP:
    weights: Any   # tuple of [in, out] arrays
    biases: Any    # tuple of [out] arrays
    activation: str = struct.field(pytree_node=False, default="tanh")

    @classmethod
    def create(cls, sizes: Tuple[int, ...], key, activation: str = "tanh"):
        keys = jax.random.split(key, len(sizes) - 1)
        weights, biases = [], []
        for k, (fan_in, fan_out) in zip(keys, zip(sizes[:-1], sizes[1:])):
            bound = 1.0 / np.sqrt(fan_in)
            weights.append(jax.random.uniform(
                k, (fan_in, fan_out), minval=-bound, maxval=bound))
            biases.append(jnp.zeros((fan_out,)))
        return cls(weights=tuple(weights), biases=tuple(biases),
                   activation=activation)

    def __call__(self, x):
        act = getattr(jax.nn, self.activation) if self.activation else None
        n = len(self.weights)
        for i, (w, b) in enumerate(zip(self.weights, self.biases)):
            x = jnp.dot(x, w) + b
            if act is not None and i < n - 1:
                x = act(x)
        return x
