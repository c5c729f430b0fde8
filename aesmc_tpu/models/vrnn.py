"""VRNN-style recurrent deep state-space model (FIVO construction).

The "deep SSM with an amortized proposal network" family. A causal GRU
runs over the OBSERVATIONS,

    h_t = GRU(h_{t-1}, y_{t-1}),        h_0 = 0,

so h_t is a deterministic function of y_{<t} (Maddison et al., FIVO;
Chung et al., VRNN - inference-time conditioning). The SSM is then

    z_0 ~ N(0, I)
    z_t ~ N(prior_net([z_{t-1}, h_t]))          (transition)
    y_t ~ N(decoder([z_t, h_t]), noise)         (emission)
    q(z_t | .) = N(encoder_net([h_t, y_t]))     (proposal)

Because h depends only on data, it is computed ONCE per batch by
`Encoder.encode` and BOUND into the components as a traced `h_seq` field
(`bind`), so the GRU parameters are shared exactly across transition /
emission / proposal, with gradients flowing through every use - no
divergent parameter copies. `vrnn_loss` packages this for training;
`generate` rolls out synthetic data (the GRU advances on the sampled
observations there, same function).

Everything batches over `[B, K, .]` with single dot_generals (MXU).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct

from .. import distributions as dists
from .. import losses as alosses
from ..state import BatchShapeMode
from ..utils import MLP, mixed_dot


@struct.dataclass
class GRUCell:
    """Minimal GRU as a pytree; input [.., I], hidden [.., H].

    `compute_dtype` mirrors `utils.MLP`: bf16 matmul inputs with f32 MXU
    accumulation, f32 params/gates/state (the mixed-precision lever for
    the deep models; weight arithmetic downstream never sees bf16)."""

    w_ru: Any   # [I + H, 2H] reset/update gates
    b_ru: Any   # [2H]
    w_c: Any    # [I + H, H] candidate
    b_c: Any    # [H]
    compute_dtype: Optional[str] = struct.field(pytree_node=False,
                                                default=None)

    @classmethod
    def create(cls, input_dim: int, hidden_dim: int, key,
               compute_dtype: Optional[str] = None):
        k1, k2 = jax.random.split(key)
        s = 1.0 / jnp.sqrt(input_dim + hidden_dim)
        return cls(
            w_ru=jax.random.uniform(k1, (input_dim + hidden_dim,
                                         2 * hidden_dim),
                                    minval=-s, maxval=s),
            b_ru=jnp.zeros((2 * hidden_dim,)),
            w_c=jax.random.uniform(k2, (input_dim + hidden_dim, hidden_dim),
                                   minval=-s, maxval=s),
            b_c=jnp.zeros((hidden_dim,)),
            compute_dtype=compute_dtype)

    def __call__(self, h, x):
        hidden_dim = h.shape[-1]
        hx = jnp.concatenate([x, h], axis=-1)
        ru = jax.nn.sigmoid(
            mixed_dot(hx, self.w_ru, self.compute_dtype) + self.b_ru)
        r, u = ru[..., :hidden_dim], ru[..., hidden_dim:]
        hx_r = jnp.concatenate([x, r * h], axis=-1)
        c = jnp.tanh(
            mixed_dot(hx_r, self.w_c, self.compute_dtype) + self.b_c)
        return (1.0 - u) * h + u * c


@struct.dataclass
class Encoder:
    """Owns the GRU; h_t = GRU(h_{t-1}, y_{t-1}) over a [T, B, D] batch."""

    cell: Any
    hidden_dim: int = struct.field(pytree_node=False)

    @classmethod
    def create(cls, obs_dim: int, hidden_dim: int, key,
               compute_dtype: Optional[str] = None):
        return cls(cell=GRUCell.create(obs_dim, hidden_dim, key,
                                       compute_dtype=compute_dtype),
                   hidden_dim=hidden_dim)

    def initial_state(self, batch_size: int):
        return jnp.zeros((batch_size, self.hidden_dim))

    def encode(self, observations):
        """[T, B, D_obs] -> h_seq [T, B, H] (causal: h_t sees y_{<t})."""
        t, b = observations.shape[:2]
        h0 = self.initial_state(b)

        def step(h, y_prev):
            h_new = self.cell(h, y_prev)
            return h_new, h_new

        # h_0 = 0 consumes nothing; h_t (t>=1) consumes y_{t-1}.
        _, h_rest = jax.lax.scan(step, h0, observations[:-1])
        return jnp.concatenate([h0[None], h_rest], axis=0)


def _gaussian_head(out):
    d = out.shape[-1] // 2
    loc, log_scale = out[..., :d], out[..., d:]
    return loc, jnp.exp(jnp.clip(log_scale, -5.0, 2.0))


@struct.dataclass
class Initial:
    latent_dim: int = struct.field(pytree_node=False)

    def __call__(self):
        return dists.MultivariateNormalDiag(
            jnp.zeros((self.latent_dim,)), jnp.ones((self.latent_dim,)))


@struct.dataclass
class Transition:
    prior_net: Any            # MLP [Dz + H -> .. -> 2 Dz]
    h_seq: Optional[Any] = None   # [T, B, H], bound per batch

    @classmethod
    def create(cls, latent_dim, hidden_dim, key, mlp_hidden=32,
               compute_dtype: Optional[str] = None):
        return cls(prior_net=MLP.create(
            (latent_dim + hidden_dim, mlp_hidden, 2 * latent_dim), key,
            compute_dtype=compute_dtype))

    def __call__(self, previous_latents=None, time=None,
                 previous_observations=None):
        z_prev = previous_latents[-1]                 # [B, K, Dz]
        h_t = self.h_seq[jnp.asarray(time)]           # [B, H]
        h_exp = jnp.broadcast_to(h_t[:, None, :],
                                 z_prev.shape[:-1] + h_t.shape[-1:])
        loc, scale = _gaussian_head(self.prior_net(
            jnp.concatenate([z_prev, h_exp], axis=-1)))
        return dists.MultivariateNormalDiag(
            loc, scale, batch_shape_mode=BatchShapeMode.FULLY_EXPANDED)


@struct.dataclass
class Emission:
    decoder: Any              # MLP [Dz + H -> .. -> D_obs]
    log_noise: Any
    h_seq: Optional[Any] = None

    @classmethod
    def create(cls, latent_dim, hidden_dim, obs_dim, key, mlp_hidden=32,
               noise=0.1, compute_dtype: Optional[str] = None):
        import numpy as np
        return cls(decoder=MLP.create(
            (latent_dim + hidden_dim, mlp_hidden, obs_dim), key,
            compute_dtype=compute_dtype),
            log_noise=jnp.asarray(float(np.log(noise))))

    def __call__(self, latents=None, time=None, previous_observations=None):
        z = latents[-1]                               # [B, K, Dz]
        h_t = self.h_seq[jnp.asarray(time)]           # [B, H]
        h_exp = jnp.broadcast_to(h_t[:, None, :],
                                 z.shape[:-1] + h_t.shape[-1:])
        loc = self.decoder(jnp.concatenate([z, h_exp], axis=-1))
        return dists.MultivariateNormalDiag(
            loc, jnp.exp(self.log_noise) * jnp.ones_like(loc),
            batch_shape_mode=BatchShapeMode.FULLY_EXPANDED)


@struct.dataclass
class Proposal:
    encoder_net: Any          # MLP [H + D_obs -> .. -> 2 Dz]
    h_seq: Optional[Any] = None

    @classmethod
    def create(cls, latent_dim, hidden_dim, obs_dim, key, mlp_hidden=32,
               compute_dtype: Optional[str] = None):
        return cls(encoder_net=MLP.create(
            (hidden_dim + obs_dim, mlp_hidden, 2 * latent_dim), key,
            compute_dtype=compute_dtype))

    def __call__(self, previous_latents=None, time=None, observations=None):
        y = observations[time]                        # [B, D_obs]
        h_t = self.h_seq[jnp.asarray(time)]           # [B, H]
        loc, scale = _gaussian_head(self.encoder_net(
            jnp.concatenate([h_t, y], axis=-1)))
        mode = BatchShapeMode.BATCH_EXPANDED
        return dists.MultivariateNormalDiag(loc, scale,
                                            batch_shape_mode=mode)


def bind(encoder, transition, emission, proposal, observations):
    """Computes h_seq from `observations` ([T, B, D]) and returns the
    components with it bound (gradients flow into the shared GRU through
    every consumer)."""
    h_seq = encoder.encode(jnp.asarray(observations))
    return (transition.replace(h_seq=h_seq),
            emission.replace(h_seq=h_seq),
            proposal.replace(h_seq=h_seq))


def vrnn_loss(observations, num_particles, algorithm, initial, encoder,
              transition, emission, proposal, key=None, **kwargs):
    """-mean(ELBO) with the shared recurrent encoding bound per batch.

    Differentiate w.r.t. (initial, encoder, transition, emission,
    proposal) jointly - the usual jax.value_and_grad over the tuple.
    """
    transition_b, emission_b, proposal_b = bind(
        encoder, transition, emission, proposal, observations)
    return alosses.get_loss(observations, num_particles, algorithm,
                            initial, transition_b, emission_b, proposal_b,
                            key=key, **kwargs)


def generate(encoder, initial, transition, emission, num_timesteps,
             batch_size, key):
    """Ancestral sampling of (z, y): the GRU advances on the GENERATED
    observations (the same causal function as inference-time encoding)."""
    k0, key = jax.random.split(key)
    h0 = encoder.initial_state(batch_size)            # [B, H]
    z0 = initial().rsample(k0, (batch_size,))         # [B, Dz]

    def emit(z, h, k):
        loc = emission.decoder(jnp.concatenate([z, h], axis=-1))
        noise = jnp.exp(emission.log_noise)
        return loc + noise * jax.random.normal(k, loc.shape)

    ke, key = jax.random.split(key)
    y0 = emit(z0, h0, ke)

    def step(carry, k):
        z_prev, y_prev, h_prev = carry
        kz, ky = jax.random.split(k)
        h = encoder.cell(h_prev, y_prev)
        loc, scale = _gaussian_head(transition.prior_net(
            jnp.concatenate([z_prev, h], axis=-1)))
        z = loc + scale * jax.random.normal(kz, loc.shape)
        y = emit(z, h, ky)
        return (z, y, h), (z, y)

    keys = jax.random.split(key, num_timesteps - 1)
    _, (z_rest, y_rest) = jax.lax.scan(step, (z0, y0, h0), keys)
    latents = jnp.concatenate([z0[None], z_rest], axis=0)
    observations = jnp.concatenate([y0[None], y_rest], axis=0)
    return latents, observations


def make_model(latent_dim=4, hidden_dim=16, obs_dim=8, key=None,
               mlp_hidden=32, noise=0.1, compute_dtype=None):
    """`compute_dtype='bfloat16'` runs every GRU/MLP matmul with bf16
    inputs + f32 MXU accumulation (f32 params; log-weight arithmetic
    stays f32) - the standard TPU lever for these model-compute-bound
    workloads."""
    if key is None:
        key = jax.random.PRNGKey(0)
    kg, kt, ke, kp = jax.random.split(key, 4)
    return (Initial(latent_dim),
            Encoder.create(obs_dim, hidden_dim, kg,
                           compute_dtype=compute_dtype),
            Transition.create(latent_dim, hidden_dim, kt, mlp_hidden,
                              compute_dtype=compute_dtype),
            Emission.create(latent_dim, hidden_dim, obs_dim, ke,
                            mlp_hidden, noise,
                            compute_dtype=compute_dtype),
            Proposal.create(latent_dim, hidden_dim, obs_dim, kp,
                            mlp_hidden, compute_dtype=compute_dtype))
