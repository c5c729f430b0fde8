"""A small, TPU-first distribution library.

The reference builds on `torch.distributions`
(/root/reference/aesmc/state.py:61-155 consumes Distribution objects with
`batch_shape` / `event_shape` / `rsample` / `log_prob`). Neither distrax nor
TFP is a dependency here, so this module provides the needed distribution
algebra natively in JAX:

- distributions are immutable flax pytree dataclasses, so they can be
  returned from `lax.cond` branches and flow through `jax.jit`;
- sampling takes an explicit PRNG key (no global RNG - fixes the hidden
  `np.random` dependence noted in SURVEY.md S2.4 item 8);
- reparameterized distributions expose `rsample` (pathwise gradients), and
  `has_rsample` mirrors the torch flag the reference checks at
  /root/reference/aesmc/state.py:97-100.

Shapes follow the torch/tfp convention:
    sample(key, sample_shape) -> sample_shape + batch_shape + event_shape
    log_prob(value)           -> broadcast(value batch dims, batch_shape)
"""

from __future__ import annotations

import os as _os

import math as _stdmath
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

_HALF_LOG_2PI = 0.5 * _stdmath.log(2.0 * _stdmath.pi)


def _shape(x) -> Tuple[int, ...]:
    return tuple(jnp.shape(x))


class Distribution:
    """Mixin defining the distribution interface.

    Concrete distributions are `flax.struct` dataclasses mixing this in.
    `batch_shape_mode` is an optional static tag consumed by
    `aesmc_tpu.state` (see state.set_batch_shape_mode), mirroring the
    attribute the reference sets at /root/reference/aesmc/state.py:12-17.
    """

    has_rsample: bool = False

    @property
    def batch_shape(self) -> Tuple[int, ...]:
        raise NotImplementedError

    @property
    def event_shape(self) -> Tuple[int, ...]:
        return ()

    def sample(self, key, sample_shape: Tuple[int, ...] = ()):
        raise NotImplementedError

    def rsample(self, key, sample_shape: Tuple[int, ...] = ()):
        if not self.has_rsample:
            raise ValueError(
                f"{type(self).__name__} is not reparameterizable")
        return self.sample(key, sample_shape)

    def log_prob(self, value):
        raise NotImplementedError


@struct.dataclass
class Normal(Distribution):
    """Univariate normal, elementwise over broadcast(loc, scale)."""

    loc: Any
    scale: Any
    batch_shape_mode: Optional[Any] = struct.field(
        pytree_node=False, default=None)

    has_rsample: bool = struct.field(pytree_node=False, default=True)

    @property
    def batch_shape(self):
        return jnp.broadcast_shapes(_shape(self.loc), _shape(self.scale))

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        loc = jnp.asarray(self.loc, dtype=jnp.result_type(float))
        eps = jax.random.normal(key, shape, dtype=loc.dtype)
        return loc + jnp.asarray(self.scale, dtype=loc.dtype) * eps

    def log_prob(self, value):
        loc = jnp.asarray(self.loc)
        scale = jnp.asarray(self.scale)
        z = (jnp.asarray(value) - loc) / scale
        return -0.5 * z * z - jnp.log(scale) - _HALF_LOG_2PI

    @property
    def mean(self):
        return jnp.broadcast_to(jnp.asarray(self.loc), self.batch_shape)

    @property
    def stddev(self):
        return jnp.broadcast_to(jnp.asarray(self.scale), self.batch_shape)

    @property
    def variance(self):
        return self.stddev ** 2


@struct.dataclass
class MultivariateNormalDiag(Distribution):
    """Multivariate normal with diagonal covariance; event_shape = (D,)."""

    loc: Any
    scale_diag: Any
    batch_shape_mode: Optional[Any] = struct.field(
        pytree_node=False, default=None)

    has_rsample: bool = struct.field(pytree_node=False, default=True)

    @property
    def _param_shape(self):
        return jnp.broadcast_shapes(_shape(self.loc), _shape(self.scale_diag))

    @property
    def batch_shape(self):
        return self._param_shape[:-1]

    @property
    def event_shape(self):
        return self._param_shape[-1:]

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self._param_shape
        loc = jnp.asarray(self.loc, dtype=jnp.result_type(float))
        eps = jax.random.normal(key, shape, dtype=loc.dtype)
        return loc + jnp.asarray(self.scale_diag, dtype=loc.dtype) * eps

    def log_prob(self, value):
        loc = jnp.asarray(self.loc)
        scale = jnp.asarray(self.scale_diag)
        z = (jnp.asarray(value) - loc) / scale
        return jnp.sum(-0.5 * z * z - jnp.log(scale) - _HALF_LOG_2PI, axis=-1)

    @property
    def mean(self):
        return jnp.broadcast_to(jnp.asarray(self.loc), self._param_shape)


@struct.dataclass
class MultivariateNormalTriL(Distribution):
    """Full-covariance multivariate normal, parameterized by the
    lower-triangular Cholesky factor of the covariance;
    event_shape = (D,). Reparameterized: x = loc + L @ eps."""

    loc: Any          # [..., D]
    scale_tril: Any   # [..., D, D] lower triangular
    batch_shape_mode: Optional[Any] = struct.field(
        pytree_node=False, default=None)

    has_rsample: bool = struct.field(pytree_node=False, default=True)

    @classmethod
    def from_covariance(cls, loc, covariance, **kwargs):
        cov = jnp.asarray(covariance)
        cov = 0.5 * (cov + jnp.swapaxes(cov, -1, -2))
        return cls(loc=loc, scale_tril=jnp.linalg.cholesky(cov),
                   **kwargs)

    @property
    def batch_shape(self):
        return jnp.broadcast_shapes(_shape(self.loc)[:-1],
                                    _shape(self.scale_tril)[:-2])

    @property
    def event_shape(self):
        return _shape(self.scale_tril)[-1:]

    def sample(self, key, sample_shape=()):
        loc = jnp.asarray(self.loc, dtype=jnp.result_type(float))
        tril = jnp.asarray(self.scale_tril, dtype=loc.dtype)
        shape = (tuple(sample_shape) + self.batch_shape +
                 self.event_shape)
        eps = jax.random.normal(key, shape, dtype=loc.dtype)
        return loc + jnp.einsum("...ij,...j->...i",
                                jnp.broadcast_to(
                                    tril, shape + self.event_shape),
                                eps)

    def log_prob(self, value):
        value = jnp.asarray(value)
        loc = jnp.asarray(self.loc, dtype=jnp.result_type(float))
        tril = jnp.asarray(self.scale_tril, dtype=loc.dtype)
        diff = value - loc
        batch = jnp.broadcast_shapes(diff.shape[:-1],
                                     _shape(tril)[:-2])
        d = diff.shape[-1]
        diff = jnp.broadcast_to(diff, batch + (d,))
        tril = jnp.broadcast_to(tril, batch + (d, d))
        z = jax.scipy.linalg.solve_triangular(
            tril, diff[..., None], lower=True)[..., 0]
        half_logdet = jnp.sum(
            jnp.log(jnp.diagonal(tril, axis1=-2, axis2=-1)), axis=-1)
        return (-0.5 * jnp.sum(z * z, axis=-1) - half_logdet -
                d * _HALF_LOG_2PI)

    @property
    def mean(self):
        return jnp.broadcast_to(
            jnp.asarray(self.loc), self.batch_shape + self.event_shape)

    @property
    def covariance(self):
        tril = jnp.asarray(self.scale_tril)
        return jnp.einsum("...ij,...kj->...ik", tril, tril)


@struct.dataclass
class Independent(Distribution):
    """Reinterprets rightmost batch dims of ``base`` as event dims.

    Parity with torch.distributions.Independent, which reference users can
    employ for factorized latents.
    """

    base: Any
    reinterpreted_batch_ndims: int = struct.field(pytree_node=False)
    batch_shape_mode: Optional[Any] = struct.field(
        pytree_node=False, default=None)

    @property
    def has_rsample(self):
        return self.base.has_rsample

    @property
    def batch_shape(self):
        n = self.reinterpreted_batch_ndims
        return self.base.batch_shape[:len(self.base.batch_shape) - n]

    @property
    def event_shape(self):
        n = self.reinterpreted_batch_ndims
        cut = len(self.base.batch_shape) - n
        return self.base.batch_shape[cut:] + self.base.event_shape

    def sample(self, key, sample_shape=()):
        return self.base.sample(key, sample_shape)

    def rsample(self, key, sample_shape=()):
        return self.base.rsample(key, sample_shape)

    def log_prob(self, value):
        logp = self.base.log_prob(value)
        n = self.reinterpreted_batch_ndims
        if n == 0:
            return logp
        return jnp.sum(logp, axis=tuple(range(-n, 0)))


@struct.dataclass
class Categorical(Distribution):
    """Categorical over the last axis of ``logits``. Not reparameterizable."""

    logits: Any
    batch_shape_mode: Optional[Any] = struct.field(
        pytree_node=False, default=None)

    has_rsample: bool = struct.field(pytree_node=False, default=False)

    @classmethod
    def from_probs(cls, probs, **kwargs):
        return cls(logits=jnp.log(jnp.asarray(probs)), **kwargs)

    @property
    def batch_shape(self):
        return _shape(self.logits)[:-1]

    @property
    def num_categories(self):
        return _shape(self.logits)[-1]

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        return jax.random.categorical(key, jnp.asarray(self.logits),
                                      axis=-1, shape=shape)

    def log_prob(self, value):
        log_probs = jax.nn.log_softmax(jnp.asarray(self.logits), axis=-1)
        value = jnp.asarray(value).astype(jnp.int32)
        # Broadcast BOTH ways: scalar-batch logits against batched
        # values (e.g. an untagged prior scored at [B, K] samples) and
        # batched logits against scalar values.
        batch = jnp.broadcast_shapes(value.shape, log_probs.shape[:-1])
        log_probs = jnp.broadcast_to(log_probs,
                                     batch + log_probs.shape[-1:])
        value = jnp.broadcast_to(value, batch)
        d = log_probs.shape[-1]
        if d <= 64 and not _os.environ.get("AESMC_HMM_INDEX_GATHER"):
            # One-hot multiply-sum instead of a last-axis gather: the
            # category axis maps to TPU lanes, where take_along_axis is
            # a cross-lane dynamic select; the masked sum is pure
            # elementwise VPU work and bit-exact (exactly one nonzero
            # term per row). Part of the round-5 discrete/HMM-path work
            # (VERDICT r4 #1). Out-of-range values reproduce the gather
            # route's take_along_axis semantics exactly (one negative
            # wrap, then NaN fill) so the two routes stay bit-identical
            # for ANY input - an invalid category scores NaN, not a
            # silent 0.0.
            value = jnp.where(value < 0, value + d, value)
            oob = (value < 0) | (value >= d)
            iota = jax.lax.broadcasted_iota(jnp.int32, log_probs.shape,
                                            log_probs.ndim - 1)
            out = jnp.sum(jnp.where(iota == value[..., None],
                                    log_probs, 0.0), axis=-1)
            return jnp.where(oob, jnp.nan, out)
        return jnp.take_along_axis(log_probs, value[..., None],
                                   axis=-1)[..., 0]


@struct.dataclass
class OneHotCategorical(Distribution):
    """One-hot categorical; event_shape = (num_categories,).

    Used by the reference's state tests for non-trivial event shapes
    (/root/reference/test/test_state.py:196-268).
    """

    logits: Any
    batch_shape_mode: Optional[Any] = struct.field(
        pytree_node=False, default=None)

    has_rsample: bool = struct.field(pytree_node=False, default=False)

    @classmethod
    def from_probs(cls, probs, **kwargs):
        return cls(logits=jnp.log(jnp.asarray(probs)), **kwargs)

    @property
    def batch_shape(self):
        return _shape(self.logits)[:-1]

    @property
    def event_shape(self):
        return _shape(self.logits)[-1:]

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        idx = jax.random.categorical(key, jnp.asarray(self.logits),
                                     axis=-1, shape=shape)
        return jax.nn.one_hot(idx, self.event_shape[-1],
                              dtype=jnp.result_type(float))

    def log_prob(self, value):
        log_probs = jax.nn.log_softmax(jnp.asarray(self.logits), axis=-1)
        return jnp.sum(jnp.asarray(value) * log_probs, axis=-1)


@struct.dataclass
class Bernoulli(Distribution):
    """Bernoulli over {0,1} parameterized by logits. Not reparameterizable."""

    logits: Any
    batch_shape_mode: Optional[Any] = struct.field(
        pytree_node=False, default=None)

    has_rsample: bool = struct.field(pytree_node=False, default=False)

    @classmethod
    def from_probs(cls, probs, **kwargs):
        probs = jnp.asarray(probs)
        return cls(logits=jnp.log(probs) - jnp.log1p(-probs), **kwargs)

    @property
    def batch_shape(self):
        return _shape(self.logits)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        return jax.random.bernoulli(
            key, jax.nn.sigmoid(jnp.asarray(self.logits)), shape
        ).astype(jnp.result_type(float))

    def log_prob(self, value):
        logits = jnp.asarray(self.logits)
        value = jnp.asarray(value)
        return value * jax.nn.log_sigmoid(logits) + \
            (1.0 - value) * jax.nn.log_sigmoid(-logits)

    @property
    def mean(self):
        return jax.nn.sigmoid(jnp.asarray(self.logits))


@struct.dataclass
class Deterministic(Distribution):
    """A point mass: sample returns `loc`, log_prob is identically 0.

    The standard device for carrying DETERMINISTIC recurrent state (VRNN
    hidden vectors) through an SMC latent: both transition and proposal
    emit the same Deterministic component, so it contributes nothing to
    the importance weights while riding the particle resampling. The
    zero log-density is an (improper) convention - proposal and model
    terms cancel exactly. `rsample` is the identity in `loc`, so
    gradients flow through the deterministic path.
    """

    loc: Any
    event_ndims: int = struct.field(pytree_node=False, default=0)
    batch_shape_mode: Optional[Any] = struct.field(
        pytree_node=False, default=None)

    has_rsample: bool = struct.field(pytree_node=False, default=True)

    @property
    def batch_shape(self):
        shape = _shape(self.loc)
        return shape[:len(shape) - self.event_ndims]

    @property
    def event_shape(self):
        shape = _shape(self.loc)
        return shape[len(shape) - self.event_ndims:]

    def sample(self, key, sample_shape=()):
        loc = jnp.asarray(self.loc, dtype=jnp.result_type(float))
        return jnp.broadcast_to(loc, tuple(sample_shape) + loc.shape)

    def log_prob(self, value):
        value = jnp.asarray(value)
        n = self.event_ndims
        shape = value.shape[:value.ndim - n] if n else value.shape
        return jnp.zeros(shape, dtype=jnp.result_type(float))


@struct.dataclass
class Laplace(Distribution):
    """Laplace(loc, scale); reparameterized via inverse-CDF."""

    loc: Any
    scale: Any
    batch_shape_mode: Optional[Any] = struct.field(
        pytree_node=False, default=None)

    has_rsample: bool = struct.field(pytree_node=False, default=True)

    @property
    def batch_shape(self):
        return jnp.broadcast_shapes(_shape(self.loc), _shape(self.scale))

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        loc = jnp.asarray(self.loc, dtype=jnp.result_type(float))
        # u ~ Uniform(-1/2, 1/2); x = loc - scale * sign(u) * log1p(-2|u|)
        u = jax.random.uniform(key, shape, dtype=loc.dtype,
                               minval=-0.5, maxval=0.5)
        eps = -jnp.sign(u) * jnp.log1p(-2.0 * jnp.abs(u))
        return loc + jnp.asarray(self.scale, dtype=loc.dtype) * eps

    def log_prob(self, value):
        loc = jnp.asarray(self.loc)
        scale = jnp.asarray(self.scale)
        return -jnp.abs(jnp.asarray(value) - loc) / scale - \
            jnp.log(2.0 * scale)

    @property
    def mean(self):
        return jnp.broadcast_to(jnp.asarray(self.loc), self.batch_shape)


@struct.dataclass
class LogNormal(Distribution):
    """exp(N(loc, scale^2)); reparameterized."""

    loc: Any
    scale: Any
    batch_shape_mode: Optional[Any] = struct.field(
        pytree_node=False, default=None)

    has_rsample: bool = struct.field(pytree_node=False, default=True)

    @property
    def batch_shape(self):
        return jnp.broadcast_shapes(_shape(self.loc), _shape(self.scale))

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        loc = jnp.asarray(self.loc, dtype=jnp.result_type(float))
        eps = jax.random.normal(key, shape, dtype=loc.dtype)
        return jnp.exp(loc + jnp.asarray(self.scale, dtype=loc.dtype) * eps)

    def log_prob(self, value):
        loc = jnp.asarray(self.loc)
        scale = jnp.asarray(self.scale)
        value = jnp.asarray(value)
        logv = jnp.log(value)
        z = (logv - loc) / scale
        return -0.5 * z * z - jnp.log(scale) - _HALF_LOG_2PI - logv

    @property
    def mean(self):
        return jnp.exp(jnp.asarray(self.loc) +
                       0.5 * jnp.asarray(self.scale) ** 2)


@struct.dataclass
class TransformedDistribution(Distribution):
    """Pushforward of `base` through an elementwise bijector.

    bijector: one of the registered names ('exp', 'sigmoid', 'tanh',
    'softplus') - static, so the distribution stays a pytree. Covers the
    common constrained-latent constructions (positive scales, bounded
    volatilities) without a dependency on distrax.
    """

    base: Any
    bijector: str = struct.field(pytree_node=False)
    batch_shape_mode: Optional[Any] = struct.field(
        pytree_node=False, default=None)

    _FORWARD = {
        "exp": jnp.exp,
        "sigmoid": jax.nn.sigmoid,
        "tanh": jnp.tanh,
        "softplus": jax.nn.softplus,
    }
    _INVERSE = {
        "exp": jnp.log,
        "sigmoid": lambda y: jnp.log(y) - jnp.log1p(-y),
        "tanh": jnp.arctanh,
        "softplus": lambda y: jnp.log(-jnp.expm1(-y)) + y,
    }
    # log |d forward(x) / dx| evaluated at x.
    _FLDJ = {
        "exp": lambda x: x,
        "sigmoid": lambda x: -jax.nn.softplus(-x) - jax.nn.softplus(x),
        "tanh": lambda x: 2.0 * (jnp.log(2.0) - x - jax.nn.softplus(-2.0 * x)),
        "softplus": lambda x: -jax.nn.softplus(-x),
    }

    @property
    def has_rsample(self):
        return self.base.has_rsample

    @property
    def batch_shape(self):
        return self.base.batch_shape

    @property
    def event_shape(self):
        return self.base.event_shape

    def sample(self, key, sample_shape=()):
        return self._FORWARD[self.bijector](
            self.base.sample(key, sample_shape))

    def rsample(self, key, sample_shape=()):
        return self._FORWARD[self.bijector](
            self.base.rsample(key, sample_shape))

    def log_prob(self, value):
        x = self._INVERSE[self.bijector](jnp.asarray(value))
        return self.base.log_prob(x) - self._FLDJ[self.bijector](x)


@struct.dataclass
class Uniform(Distribution):
    """Uniform on [low, high); reparameterized."""

    low: Any
    high: Any
    batch_shape_mode: Optional[Any] = struct.field(
        pytree_node=False, default=None)

    has_rsample: bool = struct.field(pytree_node=False, default=True)

    @property
    def batch_shape(self):
        return jnp.broadcast_shapes(_shape(self.low), _shape(self.high))

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        low = jnp.asarray(self.low, dtype=jnp.result_type(float))
        high = jnp.asarray(self.high, dtype=low.dtype)
        u = jax.random.uniform(key, shape, dtype=low.dtype)
        return low + (high - low) * u

    def log_prob(self, value):
        low = jnp.asarray(self.low)
        high = jnp.asarray(self.high)
        value = jnp.asarray(value)
        inside = (value >= low) & (value < high)
        return jnp.where(inside, -jnp.log(high - low), -jnp.inf)
