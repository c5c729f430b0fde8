"""Bouncing-ball deep SSM with an amortized MLP proposal
(BASELINE.json config 4: "Amortized MLP proposal network on synthetic
bouncing-ball sequences (VRNN-style deep SSM), 64-step sequences").

A ball bounces elastically in [0, 1]:

    latent x_t = (position p_t, velocity v_t) in R^2
    p_t = reflect(p_{t-1} + dt * v_{t-1}) + noise
    v_t = v_{t-1} (sign-flipped at bounces) + noise
    y_t = render(p_t) + noise   -- a P-pixel 1-D "video" frame: Gaussian
                                   bump of width `blur` centered at p_t

Emission runs through a learned MLP decoder (VRNN-style deep emission);
the proposal is an amortized MLP encoder over (previous latent, current
frame). All dense layers batch over `[batch, particle, .]` - single
dot_generals on the MXU.

The reflection uses the triangular-wave identity so dynamics stay smooth
and jit-friendly (no data-dependent branching).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .. import distributions as dists
from ..state import BatchShapeMode
from ..utils import MLP

NUM_PIXELS = 32
DT = 0.1


def reflect(p):
    """Positions folded into [0, 1] with elastic reflection (triangular
    wave): reflect(p) = 1 - |mod(p, 2) - 1|."""
    return 1.0 - jnp.abs(jnp.mod(p, 2.0) - 1.0)


def reflected_velocity_sign(p):
    """-1 where the unfolded position sits on a descending segment."""
    return jnp.where(jnp.mod(p, 2.0) < 1.0, 1.0, -1.0)


def render(position, num_pixels: int = NUM_PIXELS, blur: float = 0.08):
    """[...] positions -> [..., P] Gaussian-bump frames."""
    grid = jnp.linspace(0.0, 1.0, num_pixels)
    diff = position[..., None] - grid
    return jnp.exp(-0.5 * (diff / blur) ** 2)


@struct.dataclass
class Initial:
    position_scale: float = struct.field(pytree_node=False, default=0.25)
    velocity_scale: float = struct.field(pytree_node=False, default=1.0)

    def __call__(self):
        loc = jnp.array([0.5, 0.0])
        scale = jnp.array([self.position_scale, self.velocity_scale])
        return dists.MultivariateNormalDiag(loc, scale)


@struct.dataclass
class Transition:
    log_pos_noise: Any
    log_vel_noise: Any

    @classmethod
    def create(cls, pos_noise=0.01, vel_noise=0.05):
        return cls(log_pos_noise=jnp.asarray(float(np.log(pos_noise))),
                   log_vel_noise=jnp.asarray(float(np.log(vel_noise))))

    def __call__(self, previous_latents=None, time=None,
                 previous_observations=None):
        prev = previous_latents[-1]                     # [..., 2]
        p, v = prev[..., 0], prev[..., 1]
        raw = p + DT * v
        new_p = reflect(raw)
        new_v = v * reflected_velocity_sign(raw)
        loc = jnp.stack([new_p, new_v], axis=-1)
        scale = jnp.stack(
            [jnp.exp(self.log_pos_noise) * jnp.ones_like(new_p),
             jnp.exp(self.log_vel_noise) * jnp.ones_like(new_v)], axis=-1)
        return dists.MultivariateNormalDiag(
            loc, scale, batch_shape_mode=BatchShapeMode.FULLY_EXPANDED)


@struct.dataclass
class Emission:
    """Deep emission: frame loc = renderer + learned MLP residual."""

    decoder: Any                     # MLP [2 -> hidden -> P]
    log_noise: Any
    num_pixels: int = struct.field(pytree_node=False, default=NUM_PIXELS)
    use_decoder: bool = struct.field(pytree_node=False, default=True)

    @classmethod
    def create(cls, key=None, noise=0.05, hidden=64,
               num_pixels=NUM_PIXELS, use_decoder=True,
               compute_dtype=None):
        if key is None:
            key = jax.random.PRNGKey(0)
        decoder = MLP.create((2, hidden, num_pixels), key,
                             compute_dtype=compute_dtype)
        # Zero the output layer: the decoder starts as a no-op residual.
        decoder = decoder.replace(weights=(
            decoder.weights[0], jnp.zeros_like(decoder.weights[1])))
        return cls(decoder=decoder,
                   log_noise=jnp.asarray(float(np.log(noise))),
                   num_pixels=num_pixels, use_decoder=use_decoder)

    def __call__(self, latents=None, time=None, previous_observations=None):
        x = latents[-1]                                 # [..., 2]
        loc = render(x[..., 0], self.num_pixels)
        if self.use_decoder:
            loc = loc + self.decoder(x)
        scale = jnp.exp(self.log_noise) * jnp.ones_like(loc)
        return dists.MultivariateNormalDiag(
            loc, scale, batch_shape_mode=BatchShapeMode.FULLY_EXPANDED)


@struct.dataclass
class Proposal:
    """Amortized MLP encoder q(x_t | x_{t-1}, y_t).

    t = 0: MLP(y_0) -> (loc, log_scale) of the 2-d latent.
    t >= 1: MLP([x_{t-1}, y_t]) -> (loc, log_scale).
    """

    encoder_0: Any                   # MLP [P -> hidden -> 4]
    encoder_t: Any                   # MLP [2 + P -> hidden -> 4]

    @classmethod
    def create(cls, key=None, hidden=64, num_pixels=NUM_PIXELS,
               compute_dtype=None):
        if key is None:
            key = jax.random.PRNGKey(0)
        k0, kt = jax.random.split(key)
        return cls(encoder_0=MLP.create((num_pixels, hidden, 4), k0,
                                        compute_dtype=compute_dtype),
                   encoder_t=MLP.create((2 + num_pixels, hidden, 4), kt,
                                        compute_dtype=compute_dtype))

    @staticmethod
    def _dist(out, mode):
        loc, log_scale = out[..., :2], out[..., 2:]
        return dists.MultivariateNormalDiag(
            loc, jnp.exp(jnp.clip(log_scale, -5.0, 2.0)),
            batch_shape_mode=mode)

    def __call__(self, previous_latents=None, time=None, observations=None):
        if time == 0:
            y = observations[0]                          # [B, P]
            return self._dist(self.encoder_0(y),
                              BatchShapeMode.BATCH_EXPANDED)
        prev = previous_latents[-1]                      # [B, K, 2]
        y = observations[time]                           # [B, P]
        y_expanded = jnp.broadcast_to(
            y[:, None, :], prev.shape[:2] + y.shape[-1:])
        inp = jnp.concatenate([prev, y_expanded], axis=-1)
        return self._dist(self.encoder_t(inp),
                          BatchShapeMode.FULLY_EXPANDED)


def gaussian_spec(transition: Transition, initial: Initial = None):
    """`twisted.GaussianSSMSpec` view of the bouncing-ball dynamics.

    The transition is exactly a diagonal Gaussian around the nonlinear
    reflection map, so twisted SMC's closed-form Gaussian-kernel trick
    applies verbatim — this is the "deep model with a non-quadratic
    optimal twist" regime (the renderer emission makes
    p(y_{t:T-1} | x_t) non-log-quadratic in x_t).
    """
    from .. import twisted

    if initial is None:
        initial = Initial()

    def mean_fn(prev, time):
        del time
        p, v = prev[..., 0], prev[..., 1]
        raw = p + DT * v
        return jnp.stack([reflect(raw), v * reflected_velocity_sign(raw)],
                         axis=-1)

    return twisted.GaussianSSMSpec(
        initial_loc=jnp.array([0.5, 0.0]),
        initial_scale=jnp.array([initial.position_scale,
                                 initial.velocity_scale]),
        transition_scale=jnp.stack([jnp.exp(transition.log_pos_noise),
                                    jnp.exp(transition.log_vel_noise)]),
        mean_fn=mean_fn)


def make_model(key=None, num_pixels: int = NUM_PIXELS, hidden: int = 64,
               compute_dtype=None):
    """`compute_dtype='bfloat16'`: bf16 MLP matmul inputs with f32 MXU
    accumulation (f32 params; weight/CDF arithmetic stays f32)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    ke, kp = jax.random.split(key)
    return (Initial(),
            Transition.create(),
            Emission.create(ke, num_pixels=num_pixels, hidden=hidden,
                            compute_dtype=compute_dtype),
            Proposal.create(kp, hidden=hidden, num_pixels=num_pixels,
                            compute_dtype=compute_dtype))
