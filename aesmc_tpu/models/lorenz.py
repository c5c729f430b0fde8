"""Lorenz-96 chaotic state-space model (beyond parity).

The standard nonlinear/chaotic filtering benchmark (Lorenz 1996; the
workhorse testbed of the data-assimilation literature): D coupled ODEs

    dx_i/dt = (x_{i+1} - x_{i-2}) x_{i-1} - x_i + F

with cyclic indexing, chaotic at F = 8. The SSM discretizes the flow
with one RK4 step of length `dt` plus additive Gaussian process noise,
and observes a subset of components linearly:

    x_t = rk4(x_{t-1}) + N(0, q^2 I)      y_t = x_t[obs] + N(0, r^2 I)

No reference counterpart (/root/reference only ships linear-Gaussian
and conjugate-Gaussian test models); this is the model family where the
auto-linearized EKF/UKF proposals (`aesmc_tpu.proposals`) earn their
keep - the locally-optimal proposal is intractable and hand-deriving
one is real work, while `lorenz.assimilation_proposal(...)` builds it
from the RK4 mean function automatically.

TPU shape: the RK4 step is pure `jnp.roll` arithmetic on `[..., D]`
arrays - vectorizes over [B, K] with no reshapes, fuses into the scan
body; the proposal's per-particle sigma-point/Jacobian work batches as
[B*K]-sized einsums on the MXU.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .. import distributions as dists
from .. import proposals as _proposals
from ..state import BatchShapeMode

__all__ = ["lorenz96_drift", "rk4_step", "Initial", "Transition",
           "Emission", "BootstrapProposal", "assimilation_proposal",
           "make_model"]


def lorenz96_drift(x, forcing: float = 8.0):
    """dx/dt of the Lorenz-96 system; `x` is `[..., D]`, D >= 4."""
    xp1 = jnp.roll(x, -1, axis=-1)
    xm1 = jnp.roll(x, 1, axis=-1)
    xm2 = jnp.roll(x, 2, axis=-1)
    return (xp1 - xm2) * xm1 - x + forcing


def rk4_step(x, dt: float = 0.05, forcing: float = 8.0):
    """One classical Runge-Kutta-4 step of the Lorenz-96 flow."""
    f = lambda z: lorenz96_drift(z, forcing)
    k1 = f(x)
    k2 = f(x + 0.5 * dt * k1)
    k3 = f(x + 0.5 * dt * k2)
    k4 = f(x + dt * k3)
    return x + (dt / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)


@struct.dataclass
class Initial:
    """p(x_0) = N(loc, scale^2 I): a cloud around the attractor (the
    conventional spin-up initialization `F * 1 + noise`)."""

    dim: int = struct.field(pytree_node=False)
    forcing: float = struct.field(pytree_node=False, default=8.0)
    scale: float = struct.field(pytree_node=False, default=1.0)

    def __call__(self):
        loc = jnp.full((self.dim,), self.forcing)
        # Break the symmetric fixed point x = F * 1 (an equilibrium of
        # the drift): nudge one coordinate, as in the standard spin-up.
        loc = loc.at[0].add(0.01)
        return dists.MultivariateNormalDiag(
            loc, jnp.full((self.dim,), self.scale))


@struct.dataclass
class Transition:
    """p(x_t | x_{t-1}) = N(rk4(x_{t-1}), q^2 I)."""

    dim: int = struct.field(pytree_node=False)
    dt: float = struct.field(pytree_node=False, default=0.05)
    forcing: float = struct.field(pytree_node=False, default=8.0)
    scale: float = struct.field(pytree_node=False, default=0.5)

    def mean(self, x):
        return rk4_step(x, self.dt, self.forcing)

    def __call__(self, previous_latents=None, time=None,
                 previous_observations=None):
        loc = self.mean(previous_latents[-1])
        return dists.MultivariateNormalDiag(
            loc, jnp.full_like(loc, self.scale),
            batch_shape_mode=BatchShapeMode.FULLY_EXPANDED)


@struct.dataclass
class Emission:
    """p(y_t | x_t) = N(x_t[obs_indices], r^2 I) - linear partial
    observation (every component when obs_indices is None)."""

    dim: int = struct.field(pytree_node=False)
    obs_indices: Any = struct.field(pytree_node=False, default=None)
    scale: float = struct.field(pytree_node=False, default=1.0)

    def observe(self, x):
        if self.obs_indices is None:
            return x
        return x[..., np.asarray(self.obs_indices)]

    def __call__(self, latents=None, time=None,
                 previous_observations=None):
        loc = self.observe(latents[-1])
        return dists.MultivariateNormalDiag(
            loc, jnp.full_like(loc, self.scale),
            batch_shape_mode=BatchShapeMode.FULLY_EXPANDED)


@struct.dataclass
class BootstrapProposal:
    """q = p: prior at t=0, transition kernel at t >= 1."""

    initial: Initial
    transition: Transition

    def __call__(self, previous_latents=None, time=None,
                 observations=None):
        if time == 0:
            return self.initial()
        return self.transition(previous_latents=previous_latents,
                               time=time)


def assimilation_proposal(initial: Initial, transition: Transition,
                          emission: Emission,
                          linearization: str = "diagonal",
                          unscented_kappa: float = 1.0):
    """The locally-optimal proposal for this model: one Kalman
    measurement update of N(rk4(x_{t-1}), q^2 I) against the linear
    observation operator, per particle.

    `linearization='diagonal'` (default) uses the CLOSED FORM: with
    diagonal process noise and a component-selection observation, the
    posterior is diagonal - observed components get the precision-
    weighted scalar update (m/q^2 + y/r^2) / (1/q^2 + 1/r^2), the rest
    keep the prior. Pure elementwise arithmetic: measured 4.7 ms vs the
    generic path's 1018 ms at [8, 1024] on v5e (benchmarks/
    bench_extended.py) - TPU-batched tiny [D, D] Cholesky factors in
    `proposals.ekf_proposal` lower to serialized scalar code, so the
    general machinery is 200x off for a model this structured.

    'extended' / 'unscented' route through the generic
    `aesmc_tpu.proposals.ekf_proposal`; on this model all three agree
    to sigma-point rounding (the emission is exactly linear and the
    propagated prior diagonal) - asserted in tests/test_lorenz.py."""
    d = transition.dim
    obs = (np.arange(d) if emission.obs_indices is None
           else np.asarray(emission.obs_indices))
    initial_dist = initial()

    if linearization == "diagonal":
        obs_mask = np.zeros((d,), np.float32)
        obs_mask[obs] = 1.0
        obs_mask = jnp.asarray(obs_mask)                  # [D]
        r2 = float(emission.scale) ** 2

        def scatter_obs(y):
            """Expands y [.., Do] to [.., D] with zeros elsewhere."""
            out = jnp.zeros(y.shape[:-1] + (d,), y.dtype)
            return out.at[..., jnp.asarray(obs)].set(y)

        def condition_diag(m, q2, y_full):
            """Per-component conjugate update where observed."""
            post_var = 1.0 / (1.0 / q2 + obs_mask / r2)
            post_mean = post_var * (m / q2 + obs_mask * y_full / r2)
            return post_mean, jnp.sqrt(post_var)

        def proposal(previous_latents=None, time=None,
                     observations=None):
            if previous_latents is None:
                y0 = scatter_obs(jnp.asarray(observations[0]))  # [B, D]
                m0 = jnp.asarray(initial_dist.loc)
                q2 = jnp.asarray(initial_dist.scale_diag) ** 2
                loc, scale = condition_diag(m0, q2, y0)
                return dists.MultivariateNormalDiag(
                    loc, jnp.broadcast_to(scale, loc.shape),
                    batch_shape_mode=BatchShapeMode.BATCH_EXPANDED)
            x_prev = previous_latents[-1]                 # [B, K, D]
            y = scatter_obs(jnp.asarray(observations[time]))  # [B, D]
            m = transition.mean(x_prev)
            loc, scale = condition_diag(
                m, jnp.float32(transition.scale) ** 2, y[:, None, :])
            return dists.MultivariateNormalDiag(
                loc, jnp.broadcast_to(scale, loc.shape),
                batch_shape_mode=BatchShapeMode.FULLY_EXPANDED)

        return proposal

    def emission_mean(x):
        return x[obs]

    return _proposals.ekf_proposal(
        transition_mean=lambda x: rk4_step(x, transition.dt,
                                           transition.forcing),
        transition_cov=transition.scale ** 2 * jnp.eye(d),
        emission_mean=emission_mean,
        emission_cov=emission.scale ** 2 * jnp.eye(len(obs)),
        initial_mean=initial_dist.loc,
        initial_cov=jnp.diag(jnp.asarray(initial_dist.scale_diag) ** 2),
        linearization=linearization,
        unscented_kappa=unscented_kappa)


def make_model(dim: int = 8, dt: float = 0.05, forcing: float = 8.0,
               transition_scale: float = 0.5, emission_scale: float = 1.0,
               obs_indices: Optional[Sequence[int]] = None,
               proposal: str = "assimilation"):
    """(initial, transition, emission, proposal) for the engine.

    `proposal`: 'bootstrap' or 'assimilation' (auto EKF/UKF; default).
    `obs_indices`: observed components (default: all; the classic hard
    setting observes every other component, e.g. `range(0, dim, 2)`).
    """
    initial = Initial(dim=dim, forcing=forcing)
    transition = Transition(dim=dim, dt=dt, forcing=forcing,
                            scale=transition_scale)
    emission = Emission(dim=dim,
                        obs_indices=(tuple(obs_indices)
                                     if obs_indices is not None else None),
                        scale=emission_scale)
    if proposal == "bootstrap":
        prop = BootstrapProposal(initial=initial, transition=transition)
    elif proposal == "assimilation":
        prop = assimilation_proposal(initial, transition, emission)
    else:
        raise ValueError(
            "proposal must be 'bootstrap' or 'assimilation'. "
            f"currently = {proposal}")
    return initial, transition, emission, prop
