"""1-D linear-Gaussian SSM test model (the flagship workload).

Capability parity with /root/reference/test/models/lgssm.py:10-144:
non-trainable initial distribution, learnable transition/emission
multipliers, an affine proposal with explicit batch-shape-mode tagging
(time-0 vs time-t branches), exact posterior via the Kalman smoother, and
a training-stats callback tracking ||theta - theta*|| and posterior-mean
L2 against the exact smoother.

Note: the reference proposal uses `scale_0` in both time branches
(/root/reference/test/models/lgssm.py:72 - `scale_t` is never read, an
apparent bug); here the t>=1 branch uses `scale_t`. The reference tests
pass equal values for both, so numerics are unchanged on those configs.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .. import distributions as dists
from .. import inference as ainference
from .. import statistics as astatistics
from .. import train as atrain
from ..state import BatchShapeMode
from . import kalman


@struct.dataclass
class Initial:
    """p(x_0) = N(loc, scale^2), non-trainable
    (ref /root/reference/test/models/lgssm.py:10-16)."""

    loc: float = struct.field(pytree_node=False)
    scale: float = struct.field(pytree_node=False)

    def __call__(self):
        return dists.Normal(self.loc, self.scale)


@struct.dataclass
class Transition:
    """p(x_t | x_{t-1}) = N(mult * x_{t-1}, scale^2); `mult` trainable
    (ref /root/reference/test/models/lgssm.py:19-30)."""

    mult: Any
    scale: float = struct.field(pytree_node=False)

    @classmethod
    def create(cls, init_mult, scale):
        return cls(mult=jnp.asarray(float(init_mult)), scale=float(scale))

    def __call__(self, previous_latents=None, time=None,
                 previous_observations=None):
        return dists.Normal(self.mult * previous_latents[-1], self.scale,
                            batch_shape_mode=BatchShapeMode.FULLY_EXPANDED)


@struct.dataclass
class Emission:
    """p(y_t | x_t) = N(mult * x_t, scale^2); `mult` trainable
    (ref /root/reference/test/models/lgssm.py:33-42)."""

    mult: Any
    scale: float = struct.field(pytree_node=False)

    @classmethod
    def create(cls, init_mult, scale):
        return cls(mult=jnp.asarray(float(init_mult)), scale=float(scale))

    def __call__(self, latents=None, time=None, previous_observations=None):
        return dists.Normal(self.mult * latents[-1], self.scale,
                            batch_shape_mode=BatchShapeMode.FULLY_EXPANDED)


@struct.dataclass
class Proposal:
    """Affine amortized proposal with time-0 / time-t branches
    (ref /root/reference/test/models/lgssm.py:45-72).

    q(x_0 | y_0)          = N(w0 * y_0 + b0, scale_0^2)
    q(x_t | x_{t-1}, y_t) = N(w[0] * x_{t-1} + w[1] * y_t + b, scale_t^2)

    The `time == 0` branch resolves statically: the engine passes the
    Python int 0 at the hoisted initial step and a TimeIndex (known >= 1)
    inside the scan.
    """

    lin_0_weight: Any
    lin_0_bias: Any
    lin_t_weight: Any  # shape [2]: (prev-latent mult, observation mult)
    lin_t_bias: Any
    scale_0: float = struct.field(pytree_node=False)
    scale_t: float = struct.field(pytree_node=False)

    @classmethod
    def create(cls, scale_0, scale_t, key=None):
        """Random affine init, matching torch nn.Linear's U(-1/sqrt(in),
        1/sqrt(in)) fan-in initialization used by the reference."""
        if key is None:
            key = jax.random.PRNGKey(0)
        k1, k2, k3, k4 = jax.random.split(key, 4)
        u = lambda k, shape, bound: jax.random.uniform(
            k, shape, minval=-bound, maxval=bound)
        return cls(
            lin_0_weight=u(k1, (), 1.0),
            lin_0_bias=u(k2, (), 1.0),
            lin_t_weight=u(k3, (2,), 1.0 / np.sqrt(2.0)),
            lin_t_bias=u(k4, (), 1.0 / np.sqrt(2.0)),
            scale_0=float(scale_0),
            scale_t=float(scale_t))

    def __call__(self, previous_latents=None, time=None, observations=None):
        if time == 0:
            loc = self.lin_0_weight * observations[0] + self.lin_0_bias
            return dists.Normal(
                loc, self.scale_0,
                batch_shape_mode=BatchShapeMode.BATCH_EXPANDED)
        else:
            previous_latent = previous_latents[-1]          # [B, K]
            obs_t = observations[time]                      # [B]
            loc = (self.lin_t_weight[0] * previous_latent +
                   self.lin_t_weight[1] * obs_t[:, None] +
                   self.lin_t_bias)
            return dists.Normal(
                loc, self.scale_t,
                batch_shape_mode=BatchShapeMode.FULLY_EXPANDED)


@struct.dataclass
class Lookahead:
    """Exact one-step predictive log p(y_t | x_{t-1}) for the auxiliary PF.

    For the LGSSM the APF lookahead score has a closed form:
    y_t | x_{t-1} ~ N(em * tr * x_{t-1}, em^2 * tr_scale^2 + em_scale^2).
    Pass as `infer(..., lookahead=Lookahead.create(...))`; this is the
    FULLY-ADAPTED auxiliary particle filter for this model (no reference
    counterpart - the reference resamples blindly).
    """

    transition_mult: Any
    emission_mult: Any
    transition_scale: float = struct.field(pytree_node=False)
    emission_scale: float = struct.field(pytree_node=False)

    @classmethod
    def create(cls, transition_mult, transition_scale, emission_mult,
               emission_scale):
        return cls(transition_mult=jnp.asarray(float(transition_mult)),
                   emission_mult=jnp.asarray(float(emission_mult)),
                   transition_scale=float(transition_scale),
                   emission_scale=float(emission_scale))

    def __call__(self, previous_latents=None, time=None, observations=None):
        loc = (self.emission_mult * self.transition_mult *
               previous_latents[-1])                         # [B, K]
        scale = jnp.sqrt((self.emission_mult * self.transition_scale) ** 2 +
                         self.emission_scale ** 2)
        obs_t = observations[time]                           # [B]
        return dists.Normal(loc, scale).log_prob(obs_t[:, None])


def optimal_proposal_scales(initial_scale, transition_scale, emission_mult,
                            emission_scale):
    """Analytically optimal proposal stds for the LGSSM
    (ref /root/reference/test/test_losses.py:103-110, after
    tuananhle.co.uk/notes/optimal-proposal-lgssm.html)."""
    def scale(prior_scale):
        v = prior_scale ** 2
        return np.sqrt(v - v * emission_mult /
                       (emission_scale ** 2 + v * emission_mult ** 2) *
                       emission_mult * v)
    return scale(initial_scale), scale(transition_scale)


def lgssm_true_posterior(observations, initial_loc, initial_scale,
                         transition_mult, transition_bias, transition_scale,
                         emission_mult, emission_bias, emission_scale):
    """Exact smoothed posterior (means, variances) via the Kalman oracle.

    Signature parity with /root/reference/test/models/lgssm.py:75-88
    (which wraps pykalman; here the native `aesmc_tpu.models.kalman`
    smoother is used). Returns (means [T, 1], variances [T, 1, 1]) in
    pykalman's shape convention.
    """
    params = kalman.KalmanParams(
        initial_mean=float(initial_loc),
        initial_variance=float(initial_scale) ** 2,
        transition_mult=float(transition_mult),
        transition_offset=float(transition_bias),
        transition_variance=float(transition_scale) ** 2,
        emission_mult=float(emission_mult),
        emission_offset=float(emission_bias),
        emission_variance=float(emission_scale) ** 2)
    means, variances = kalman.kalman_smoother(
        np.asarray(observations, dtype=np.float64).reshape(-1), params)
    return means[:, None], variances[:, None, None]


class TrainingStats:
    """Callback tracking ||theta - theta*|| and the mean L2 between
    IS-estimated posterior means and the exact smoother on held-out
    sequences (ref /root/reference/test/models/lgssm.py:91-144)."""

    def __init__(self, initial_loc, initial_scale, true_transition_mult,
                 transition_scale, true_emission_mult, emission_scale,
                 num_timesteps, num_test_obs, test_inference_num_particles,
                 saving_interval=100, logging_interval=100, key=None,
                 verbose: bool = True):
        if key is None:
            key = jax.random.PRNGKey(42)
        self.true_transition_mult = true_transition_mult
        self.true_emission_mult = true_emission_mult
        self.test_inference_num_particles = test_inference_num_particles
        self.saving_interval = saving_interval
        self.logging_interval = logging_interval
        self.verbose = verbose
        self.p_l2_history = []
        self.q_l2_history = []
        self.iteration_idx_history = []
        self.initial = Initial(initial_loc, initial_scale)
        self.true_transition = Transition.create(true_transition_mult,
                                                 transition_scale)
        self.true_emission = Emission.create(true_emission_mult,
                                             emission_scale)
        data_key, self.key = jax.random.split(key)
        dataloader = atrain.get_synthetic_dataloader(
            self.initial, self.true_transition, self.true_emission,
            num_timesteps, num_test_obs, key=data_key)
        self.test_obs = next(iter(dataloader))  # [T, num_test_obs]
        test_obs_np = np.asarray(self.test_obs)
        self.true_posterior_means = np.stack([
            lgssm_true_posterior(
                test_obs_np[:, i], initial_loc, initial_scale,
                true_transition_mult, 0.0, transition_scale,
                true_emission_mult, 0.0, emission_scale)[0].reshape(-1)
            for i in range(num_test_obs)], axis=0)  # [num_test_obs, T]

        def held_out_posterior_means(proposal, key):
            result = ainference.infer(
                'is', self.test_obs, self.initial, self.true_transition,
                self.true_emission, proposal,
                self.test_inference_num_particles, key=key)
            # latents [T, B, K] -> value [B, K, T] for empirical_mean.
            value = jnp.transpose(result['latents'], (1, 2, 0))
            return astatistics.empirical_mean(value, result['log_weight'])

        self._held_out_posterior_means = jax.jit(held_out_posterior_means)

    def __call__(self, epoch_idx, epoch_iteration_idx, loss, initial,
                 transition, emission, proposal):
        if epoch_iteration_idx % self.saving_interval == 0:
            self.p_l2_history.append(float(np.linalg.norm(
                np.array([float(transition.mult), float(emission.mult)]) -
                np.array([self.true_transition_mult,
                          self.true_emission_mult]))))
            self.key, subkey = jax.random.split(self.key)
            posterior_means = np.asarray(
                self._held_out_posterior_means(proposal, subkey))
            self.q_l2_history.append(float(np.mean(np.linalg.norm(
                self.true_posterior_means - posterior_means, axis=1))))
            self.iteration_idx_history.append(epoch_iteration_idx)

        if self.verbose and epoch_iteration_idx % self.logging_interval == 0:
            print('Iteration {}: Loss = {}'.format(
                epoch_iteration_idx, float(loss)))
