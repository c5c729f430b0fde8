"""Nonlinear stochastic-volatility SSM (BASELINE.json config 3).

    x_0 ~ N(mu, sigma^2 / (1 - phi^2))          (stationary prior)
    x_t = mu + phi (x_{t-1} - mu) + N(0, sigma^2)
    y_t = exp(x_t / 2) * N(0, beta^2)

The canonical nonlinear/heteroscedastic benchmark for particle methods
(not in the reference, which is linear-Gaussian only). Parameters are
learned in unconstrained space: phi via tanh, sigma/beta via exp.
The proposal is a learned affine-in-(x_{t-1}, log y_t^2) Gaussian.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .. import distributions as dists
from ..state import BatchShapeMode


def _phi(raw):
    return jnp.tanh(raw)


@struct.dataclass
class Initial:
    mu: Any
    raw_phi: Any
    log_sigma: Any

    @classmethod
    def create(cls, mu=0.0, phi=0.95, sigma=0.2):
        return cls(mu=jnp.asarray(float(mu)),
                   raw_phi=jnp.asarray(float(np.arctanh(phi))),
                   log_sigma=jnp.asarray(float(np.log(sigma))))

    def __call__(self):
        sigma = jnp.exp(self.log_sigma)
        phi = _phi(self.raw_phi)
        stationary = sigma / jnp.sqrt(1.0 - phi ** 2)
        return dists.Normal(self.mu, stationary)


@struct.dataclass
class Transition:
    mu: Any
    raw_phi: Any
    log_sigma: Any

    @classmethod
    def create(cls, mu=0.0, phi=0.95, sigma=0.2):
        return cls(mu=jnp.asarray(float(mu)),
                   raw_phi=jnp.asarray(float(np.arctanh(phi))),
                   log_sigma=jnp.asarray(float(np.log(sigma))))

    def __call__(self, previous_latents=None, time=None,
                 previous_observations=None):
        prev = previous_latents[-1]
        loc = self.mu + _phi(self.raw_phi) * (prev - self.mu)
        return dists.Normal(loc, jnp.exp(self.log_sigma),
                            batch_shape_mode=BatchShapeMode.FULLY_EXPANDED)


@struct.dataclass
class Emission:
    log_beta: Any

    @classmethod
    def create(cls, beta=1.0):
        return cls(log_beta=jnp.asarray(float(np.log(beta))))

    def __call__(self, latents=None, time=None, previous_observations=None):
        x = latents[-1]
        scale = jnp.exp(self.log_beta + x / 2.0)
        return dists.Normal(jnp.zeros_like(x), scale,
                            batch_shape_mode=BatchShapeMode.FULLY_EXPANDED)


@struct.dataclass
class Proposal:
    """q(x_t | x_{t-1}, y_t) = N(w0 x_{t-1} + w1 log(y_t^2 + eps) + b,
    exp(ls)^2); time-0 branch affine in log(y_0^2 + eps)."""

    w_prev: Any
    w_obs: Any
    bias: Any
    log_scale: Any
    w_obs_0: Any
    bias_0: Any
    log_scale_0: Any

    @classmethod
    def create(cls, key=None, init_scale=0.3):
        del key  # deterministic small init works well here
        z = jnp.asarray(0.0)
        return cls(w_prev=jnp.asarray(0.9), w_obs=z, bias=z,
                   log_scale=jnp.asarray(float(np.log(init_scale))),
                   w_obs_0=z, bias_0=z,
                   log_scale_0=jnp.asarray(float(np.log(init_scale))))

    @staticmethod
    def _feat(y):
        return jnp.log(y ** 2 + 1e-4)

    def __call__(self, previous_latents=None, time=None, observations=None):
        if time == 0:
            y = observations[0]
            loc = self.w_obs_0 * self._feat(y) + self.bias_0
            return dists.Normal(
                loc, jnp.exp(self.log_scale_0),
                batch_shape_mode=BatchShapeMode.BATCH_EXPANDED)
        prev = previous_latents[-1]                  # [B, K]
        y = observations[time]                       # [B]
        loc = (self.w_prev * prev +
               self.w_obs * self._feat(y)[:, None] + self.bias)
        return dists.Normal(loc, jnp.exp(self.log_scale),
                            batch_shape_mode=BatchShapeMode.FULLY_EXPANDED)


def make_model(mu=0.0, phi=0.95, sigma=0.2, beta=0.7, key=None):
    return (Initial.create(mu, phi, sigma),
            Transition.create(mu, phi, sigma),
            Emission.create(beta),
            Proposal.create(key))
