"""A minimal MLP as a flax pytree dataclass.

Weights are plain jnp arrays (trainable leaves); the structure is static.
Matmuls batch over arbitrary leading dims - `[batch, particle, features]`
inputs stay one `dot_general`, which is what the MXU wants.

`compute_dtype='bfloat16'` is the standard TPU mixed-precision lever for
the deep models (VRNN, bouncing-ball), whose cost is MLP/GRU matmuls:
parameters STAY f32 (the optimizer state and updates are untouched),
matmul INPUTS are cast to bf16, and the MXU accumulates in f32
(`preferred_element_type`), so activations/log-probs downstream remain
f32. The particle-weight arithmetic (logsumexp, CDF, resampling) never
sees bf16.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


def mixed_dot(x, w, compute_dtype: Optional[str]):
    """`x @ w`, optionally with bf16 (or other) inputs and f32 MXU
    accumulation. With `compute_dtype=None` this is a plain f32 dot."""
    if compute_dtype is None:
        return jnp.dot(x, w)
    dt = jnp.dtype(compute_dtype)
    return jnp.dot(x.astype(dt), w.astype(dt),
                   preferred_element_type=jnp.float32)


@struct.dataclass
class MLP:
    weights: Any   # tuple of [in, out] arrays
    biases: Any    # tuple of [out] arrays
    activation: str = struct.field(pytree_node=False, default="tanh")
    # None = full f32; 'bfloat16' = bf16 matmul inputs, f32 accumulation
    # and f32 biases/activations (params stay f32 leaves either way).
    compute_dtype: Optional[str] = struct.field(pytree_node=False,
                                                default=None)

    @classmethod
    def create(cls, sizes: Tuple[int, ...], key, activation: str = "tanh",
               compute_dtype: Optional[str] = None):
        keys = jax.random.split(key, len(sizes) - 1)
        weights, biases = [], []
        for k, (fan_in, fan_out) in zip(keys, zip(sizes[:-1], sizes[1:])):
            bound = 1.0 / np.sqrt(fan_in)
            weights.append(jax.random.uniform(
                k, (fan_in, fan_out), minval=-bound, maxval=bound))
            biases.append(jnp.zeros((fan_out,)))
        return cls(weights=tuple(weights), biases=tuple(biases),
                   activation=activation, compute_dtype=compute_dtype)

    def __call__(self, x):
        act = getattr(jax.nn, self.activation) if self.activation else None
        n = len(self.weights)
        for i, (w, b) in enumerate(zip(self.weights, self.biases)):
            x = mixed_dot(x, w, self.compute_dtype) + b
            if act is not None and i < n - 1:
                x = act(x)
        return x
