"""N-dimensional linear-Gaussian SSM (BASELINE.json config 2).

    x_0 ~ N(mu0, q0^2 I)
    x_t = A x_{t-1} + N(0, diag(q^2))
    y_t = C x_t + N(0, diag(r^2))

The reference only ships the scalar LGSSM (/root/reference/test/models/
lgssm.py); this is the 10-dim config the rebuild targets ("10-dim LGSSM:
learn transition/emission params with AESMC loss, 1000 particles,
multinomial resampling", BASELINE.json:8). The transition/emission means
are batched matmuls over `[batch, particle, D]` latents - MXU work, kept
in a single dot per step.

The proposal is a learned affine function of (previous latent, current
observation) with per-dimension scales - the Kalman-gain structure.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .. import distributions as dists
from ..state import BatchShapeMode


@struct.dataclass
class Initial:
    loc: Any
    scale: float = struct.field(pytree_node=False)

    @classmethod
    def create(cls, dim: int, loc: float = 0.0, scale: float = 1.0):
        return cls(loc=jnp.full((dim,), float(loc)), scale=float(scale))

    def __call__(self):
        return dists.MultivariateNormalDiag(
            self.loc, self.scale * jnp.ones_like(self.loc))


@struct.dataclass
class Transition:
    """x_t = A x_{t-1} + eps, eps ~ N(0, diag(scale^2)); A trainable.

    With `create(..., train_scale=False)` (the default) the noise scale
    is a STATIC aux field (a tuple of floats, not a pytree leaf), so no
    optimizer - including ones with non-gradient terms like adamw's
    decoupled weight decay - can touch it. With `train_scale=True` it is
    a trainable leaf.
    """

    matrix: Any                       # [D, D]
    scale: Any                        # [D] leaf (None when frozen)
    frozen_scale: Any = struct.field(pytree_node=False, default=None)

    @classmethod
    def create(cls, matrix, scale, train_scale: bool = False):
        matrix = jnp.asarray(matrix, dtype=jnp.result_type(float))
        dim = matrix.shape[0]
        scale = jnp.broadcast_to(
            jnp.asarray(scale, dtype=matrix.dtype), (dim,))
        if train_scale:
            return cls(matrix=matrix, scale=scale)
        return cls(matrix=matrix, scale=None,
                   frozen_scale=tuple(float(s) for s in scale))

    @property
    def noise_scale(self):
        """The [D] noise scale, whether trainable or frozen."""
        return self.scale if self.scale is not None \
            else jnp.asarray(self.frozen_scale, jnp.result_type(float))

    def __call__(self, previous_latents=None, time=None,
                 previous_observations=None):
        prev = previous_latents[-1]                    # [B, K, D]
        loc = prev @ self.matrix.T
        return dists.MultivariateNormalDiag(
            loc, self.noise_scale.astype(loc.dtype) * jnp.ones_like(loc),
            batch_shape_mode=BatchShapeMode.FULLY_EXPANDED)


@struct.dataclass
class Emission:
    """y_t = C x_t + eps, eps ~ N(0, diag(scale^2)); C trainable.

    Scale freezing follows `Transition`: static aux field unless
    `create(..., train_scale=True)`.
    """

    matrix: Any                       # [D_obs, D]
    scale: Any                        # [D_obs] leaf (None when frozen)
    frozen_scale: Any = struct.field(pytree_node=False, default=None)

    @classmethod
    def create(cls, matrix, scale, train_scale: bool = False):
        matrix = jnp.asarray(matrix, dtype=jnp.result_type(float))
        d_obs = matrix.shape[0]
        scale = jnp.broadcast_to(
            jnp.asarray(scale, dtype=matrix.dtype), (d_obs,))
        if train_scale:
            return cls(matrix=matrix, scale=scale)
        return cls(matrix=matrix, scale=None,
                   frozen_scale=tuple(float(s) for s in scale))

    @property
    def noise_scale(self):
        """The [D_obs] noise scale, whether trainable or frozen."""
        return self.scale if self.scale is not None \
            else jnp.asarray(self.frozen_scale, jnp.result_type(float))

    def __call__(self, latents=None, time=None, previous_observations=None):
        loc = latents[-1] @ self.matrix.T
        return dists.MultivariateNormalDiag(
            loc, self.noise_scale.astype(loc.dtype) * jnp.ones_like(loc),
            batch_shape_mode=BatchShapeMode.FULLY_EXPANDED)


@struct.dataclass
class Proposal:
    """q(x_t | x_{t-1}, y_t) = N(W_x x_{t-1} + W_y y_t + b, diag(exp(ls)))."""

    w_prev: Any                       # [D, D]
    w_obs: Any                        # [D, D_obs]
    bias: Any                         # [D]
    log_scale: Any                    # [D]
    w_obs_0: Any                      # [D, D_obs] (time-0 branch)
    bias_0: Any                       # [D]
    log_scale_0: Any                  # [D]

    @classmethod
    def create(cls, dim: int, obs_dim: int, key=None, init_scale: float = 1.0):
        if key is None:
            key = jax.random.PRNGKey(0)
        keys = jax.random.split(key, 3)
        s = 1.0 / np.sqrt(dim + obs_dim)
        return cls(
            w_prev=jax.random.uniform(keys[0], (dim, dim), minval=-s,
                                      maxval=s),
            w_obs=jax.random.uniform(keys[1], (dim, obs_dim), minval=-s,
                                     maxval=s),
            bias=jnp.zeros((dim,)),
            log_scale=jnp.full((dim,), float(np.log(init_scale))),
            w_obs_0=jax.random.uniform(keys[2], (dim, obs_dim), minval=-s,
                                       maxval=s),
            bias_0=jnp.zeros((dim,)),
            log_scale_0=jnp.full((dim,), float(np.log(init_scale))))

    def __call__(self, previous_latents=None, time=None, observations=None):
        if time == 0:
            obs = observations[0]                     # [B, D_obs]
            loc = jnp.einsum("bo,do->bd", obs, self.w_obs_0) + self.bias_0
            return dists.MultivariateNormalDiag(
                loc, jnp.exp(self.log_scale_0) * jnp.ones_like(loc),
                batch_shape_mode=BatchShapeMode.BATCH_EXPANDED)
        prev = previous_latents[-1]                   # [B, K, D]
        obs = observations[time]                      # [B, D_obs]
        loc = (prev @ self.w_prev.T +
               jnp.einsum("bo,do->bd", obs, self.w_obs)[:, None, :] +
               self.bias)
        return dists.MultivariateNormalDiag(
            loc, jnp.exp(self.log_scale) * jnp.ones_like(loc),
            batch_shape_mode=BatchShapeMode.FULLY_EXPANDED)


def make_model(dim: int = 10, obs_dim: int = None, key=None,
               spectral_radius: float = 0.9,
               transition_scale: float = 1.0,
               emission_scale: float = 0.1):
    """A well-posed random D-dim LGSSM (stable transition matrix)."""
    if obs_dim is None:
        obs_dim = dim
    if key is None:
        key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    a = jax.random.normal(k1, (dim, dim)) / np.sqrt(dim)
    # Spectral radius on host (eig has no TPU lowering; setup-time only).
    eigmax = float(np.max(np.abs(np.linalg.eigvals(np.asarray(a)))))
    a = a * (spectral_radius / eigmax)
    c = jax.random.normal(k2, (obs_dim, dim)) / np.sqrt(dim)
    return (Initial.create(dim),
            Transition.create(a, transition_scale),
            Emission.create(c, emission_scale),
            Proposal.create(dim, obs_dim, k3))
