"""Conjugate-Gaussian test model (a one-timestep VAE).

Capability parity with /root/reference/test/models/gaussian.py:6-73:
learnable prior mean, learnable observation std, learnable affine
amortized proposal, the closed-form optimal proposal parameters, and a
training-stats callback.

Components are flax struct pytrees: their jnp-array fields ARE the
trainable parameters (differentiated directly by `jax.grad`); Python
float fields are static non-trainable constants.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
import numpy as np
from flax import struct

from .. import distributions as dists
from ..state import BatchShapeMode


@struct.dataclass
class Prior:
    """p(x) = N(mean, std^2); `mean` trainable
    (ref /root/reference/test/models/gaussian.py:6-13)."""

    mean: Any
    std: float = struct.field(pytree_node=False)

    @classmethod
    def create(cls, init_mean, std):
        return cls(mean=jnp.asarray(float(init_mean)), std=float(std))

    def __call__(self):
        return dists.Normal(self.mean, self.std)


@struct.dataclass
class Likelihood:
    """p(y|x) = N(x, exp(log_std)^2); `log_std` trainable
    (ref /root/reference/test/models/gaussian.py:16-24)."""

    log_std: Any

    @classmethod
    def create(cls, init_std):
        return cls(log_std=jnp.log(jnp.asarray(float(init_std))))

    def __call__(self, latents=None, time=None, previous_observations=None):
        return dists.Normal(latents[-1], jnp.exp(self.log_std),
                            batch_shape_mode=BatchShapeMode.FULLY_EXPANDED)


@struct.dataclass
class InferenceNetwork:
    """q(x|y) = N(mult*y + bias, exp(log_std)^2); all three trainable
    (ref /root/reference/test/models/gaussian.py:27-38)."""

    mult: Any
    bias: Any
    log_std: Any

    @classmethod
    def create(cls, init_mult, init_bias, init_std):
        return cls(mult=jnp.asarray(float(init_mult)),
                   bias=jnp.asarray(float(init_bias)),
                   log_std=jnp.log(jnp.asarray(float(init_std))))

    def __call__(self, previous_latents=None, time=None, observations=None):
        loc = self.mult * observations[0] + self.bias
        return dists.Normal(loc, jnp.exp(self.log_std),
                            batch_shape_mode=BatchShapeMode.BATCH_EXPANDED)


def get_proposal_params(prior_mean, prior_std, obs_std):
    """Closed-form optimal proposal N(mult*y + offset, std^2) for the
    conjugate model (ref /root/reference/test/models/gaussian.py:41-47)."""
    posterior_var = 1.0 / (1.0 / prior_std ** 2 + 1.0 / obs_std ** 2)
    posterior_std = np.sqrt(posterior_var)
    multiplier = posterior_var / obs_std ** 2
    offset = posterior_var * prior_mean / prior_std ** 2
    return multiplier, offset, posterior_std


class TrainingStats:
    """Per-iteration parameter-history callback
    (ref /root/reference/test/models/gaussian.py:50-73). Stores plain
    floats - no retained autograd graphs (SURVEY.md S2.4 item 7)."""

    def __init__(self, logging_interval: int = 100, verbose: bool = True):
        self.prior_mean_history = []
        self.obs_std_history = []
        self.q_mult_history = []
        self.q_bias_history = []
        self.q_std_history = []
        self.iteration_idx_history = []
        self.loss_history = []
        self.logging_interval = logging_interval
        self.verbose = verbose

    def __call__(self, epoch_idx, epoch_iteration_idx, loss, initial,
                 transition, emission, proposal):
        self.prior_mean_history.append(float(initial.mean))
        self.obs_std_history.append(float(jnp.exp(emission.log_std)))
        self.q_mult_history.append(float(proposal.mult))
        self.q_bias_history.append(float(proposal.bias))
        self.q_std_history.append(float(jnp.exp(proposal.log_std)))
        self.loss_history.append(float(loss))
        self.iteration_idx_history.append(epoch_iteration_idx)
        if self.verbose and epoch_iteration_idx % self.logging_interval == 0:
            print('Iteration: {} - Loss: {}'.format(
                epoch_iteration_idx, float(loss)))
