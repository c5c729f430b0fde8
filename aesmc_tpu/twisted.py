"""Twisted (controlled) sequential Monte Carlo.

Runs SMC on a *twisted* model: each timestep's target is reweighted by a
positive twisting function psi_t(x_t), with the proposal absorbing the
twist so that incremental weights become
``g_t(y_t | x_t) * psitilde_{t+1}(x_t) / psi_t(x_t)`` (and an extra
``mu(psi_0)`` constant at t=0), where
``psitilde_t(x) = int f(x' | x) psi_t(x') dx'``. With the optimal
twist ``psi_t(x) = p(y_{t:T-1} | x_t)`` every particle carries the same
weight and the evidence estimator is *exact* with zero variance
(Guarniero, Johansen & Lee 2017 "The iterated auxiliary particle
filter"; Heng, Bishop, Deligiannidis & Doucet 2020 "Controlled
sequential Monte Carlo").

TPU-native design: twists are *log-quadratic* (diagonal), so for
Gaussian-noise transitions with arbitrary (nonlinear) mean functions the
twisted transition stays Gaussian with closed-form moments - sampling
and density are pure elementwise VPU math, no per-particle solves (see
BENCH_NOTES "tiny-Cholesky TPU trap"). The twisted model is expressed
as ordinary engine components and handed to `inference.infer`, so every
engine feature rides along unchanged: all resampling methods and
implementations (incl. the fused Pallas kernels), ESS-adaptive
criteria, lineage tracing, meshes, remat.

Components produced here satisfy the engine call contract
(aesmc_tpu/inference.py:466-473 and :590-607). The twisted transition
and proposal are the *same* closed-form Gaussian, so their log-probs
cancel exactly in the weight and only the emission term - which carries
``log g + log psitilde_{t+1} - log psi_t`` - survives, matching the
twisted-SMC incremental weight.

Provided here:
- `QuadraticTwist`: per-timestep diagonal log-quadratic twist params.
- `make_twisted_components` / `twisted_smc`: run the engine on the
  twisted model.
- `exact_lgssm_twist`: the optimal twist for (scalar or diagonal-D)
  linear-Gaussian SSMs via the closed-form backward information filter
  - used by tests to verify the zero-variance property against the
  exact Kalman evidence.
- `learn_twist`: iterated approximate-dynamic-programming twist
  learning (psi-APF): run twisted SMC, regress
  ``log g_t + log psitilde_{t+1}`` on quadratic features of the
  particles backward in time, repeat. On models where the target is
  exactly log-quadratic (LGSSM) one iteration recovers the optimal
  twist exactly.

No counterpart exists in /root/reference (beyond-parity capability);
the closest reference surface is the proposal hook at
/root/reference/aesmc/inference.py:234-269, which cannot reweight
emissions and so cannot express twisting.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct

from . import distributions as dists
from . import inference as ainference
from . import math as amath
from . import state as astate
from .state import BatchShapeMode

__all__ = [
    "QuadraticTwist",
    "TabularTwist",
    "GaussianSSMSpec",
    "DiscreteSSMSpec",
    "LogCorrectedDistribution",
    "make_twisted_components",
    "make_discrete_twisted_components",
    "twisted_smc",
    "exact_lgssm_twist",
    "exact_hmm_twist",
    "learn_twist",
]


@struct.dataclass
class QuadraticTwist:
    """log psi_t(x) = sum_d [-A[t,...,d]/2 * x_d^2 + b[t,...,d] * x_d] + c[t].

    Shapes: scalar latents `A, b, c: [T, batch]`; vector latents
    `A, b: [T, batch, D]`, `c: [T, batch]`. `A >= 0` keeps the twisted
    Gaussian kernels proper for any transition variance (any
    ``A > -1/sigma^2`` would do; the learners clamp at 0).
    """

    A: Any
    b: Any
    c: Any

    @classmethod
    def zeros(cls, num_timesteps: int, batch_size: int,
              dim: Optional[int] = None, dtype=jnp.float32):
        shape = ((num_timesteps, batch_size) if dim is None
                 else (num_timesteps, batch_size, dim))
        return cls(A=jnp.zeros(shape, dtype), b=jnp.zeros(shape, dtype),
                   c=jnp.zeros((num_timesteps, batch_size), dtype))

    @property
    def vector(self) -> bool:
        return jnp.asarray(self.A).ndim == 3


@struct.dataclass
class TabularTwist:
    """Twist over a FINITE state space: ``log psi_t(x = d)`` as a table.

    `logpsi` is `[T, batch, D]` (`batch` may be 1 and broadcasts). The
    discrete analogue of `QuadraticTwist`: on a finite state space the
    twisted kernels are exactly renormalized Categoricals and
    ``psitilde_t(i) = sum_j P[i, j] psi_t(j)`` is an exact matrix
    product - no integral approximation, no positivity constraint.
    """

    logpsi: Any

    @classmethod
    def zeros(cls, num_timesteps: int, batch_size: int, num_states: int,
              dtype=jnp.float32):
        return cls(logpsi=jnp.zeros(
            (num_timesteps, batch_size, num_states), dtype))

    @property
    def num_states(self) -> int:
        return jnp.asarray(self.logpsi).shape[-1]


@struct.dataclass
class DiscreteSSMSpec:
    """Discrete-latent analogue of `GaussianSSMSpec` (HMM family).

    `initial_logits` `[D]`, `transition_logits` `[D, D]` (rows
    log-softmax-normalized internally); matches the contract of
    `models.hmm.Initial`/`Transition` (models/hmm.py:41-76). The
    emission is unrestricted, exactly as in the Gaussian case.
    """

    initial_logits: Any
    transition_logits: Any


@struct.dataclass
class GaussianSSMSpec:
    """Transition/initial structure twisted SMC needs in closed form.

    The model's transition must be ``x_t ~ N(mean_fn(x_{t-1}, t),
    diag(transition_scale^2))`` with a state-independent (diagonal)
    scale; the mean may be any (nonlinear, parameterized) function -
    this covers LGSSM, stochastic volatility, Lorenz-96 etc. The
    emission is unrestricted (only evaluated, never integrated).

    `mean_fn(previous_latent, time)` receives `[batch, K(, D)]` latents
    and the (possibly traced) index of the state being generated.

    `scale_fn(previous_latent, time)` (optional) makes the diagonal
    transition scale STATE-DEPENDENT - e.g. a neural-net variance head
    as in the VRNN (models/vrnn.py:130-150). The log-quadratic twist
    algebra is elementwise in the per-dim variance, so the twisted
    kernels stay closed-form Gaussians with per-particle moments (still
    pure VPU math, no solves). When given, `transition_scale` is only
    used as the REPRESENTATIVE scale for `learn_twist`'s `fit_jitter`
    design-point noise - pass a typical value (e.g. 1.0).
    """

    initial_loc: Any
    initial_scale: Any
    transition_scale: Any
    mean_fn: Any = struct.field(pytree_node=False)
    scale_fn: Any = struct.field(pytree_node=False, default=None)


@struct.dataclass
class LogCorrectedDistribution(dists.Distribution):
    """Base distribution plus a value-independent per-particle log term.

    Used for the twisted emission: `log_prob(y)` is the base emission
    log-density *summed over event/extra dims* plus
    ``log psitilde_{t+1}(x) - log psi_t(x)`` (a `[batch, K]` array fixed
    at construction). `batch_shape` is the correction's shape so
    `state.log_prob` (state.py:167-199) takes the direct dispatch branch
    for `[batch, K(, event)]` values.
    """

    base: Any
    log_correction: Any
    batch_shape_mode: Optional[Any] = struct.field(
        pytree_node=False, default=None)

    @property
    def batch_shape(self):
        return tuple(jnp.asarray(self.log_correction).shape)

    @property
    def event_shape(self):
        return self.base.event_shape

    def sample(self, key, sample_shape=()):
        # The correction only reweights densities; sampling (used by
        # statistics.sample_from_prior, never by the twisted engine
        # path) falls through to the base emission.
        return self.base.sample(key, sample_shape)

    def log_prob(self, value):
        lp = self.base.log_prob(value)
        if lp.ndim > 2:
            lp = jnp.sum(lp.reshape(lp.shape[0], lp.shape[1], -1), axis=2)
        return lp + self.log_correction


def _quad_terms(m, s2, a, b):
    """Per-dim log int N(x'; m, s2) exp(-a/2 x'^2 + b x') dx'.

    Elementwise in every argument (broadcasts); the quadratic-in-m
    closed form of the Gaussian-times-log-quadratic integral. With
    a = b = 0 this is ~0 to fp rounding, so a zero-padded twist row
    implements psitilde_T = 1 with no special casing.
    """
    p = 1.0 / s2 + a
    return (-0.5 * jnp.log(s2 * p)
            + jnp.square(m / s2 + b) / (2.0 * p)
            - jnp.square(m) / (2.0 * s2))


def _reduce(x, vector: bool):
    return jnp.sum(x, axis=-1) if vector else x


def _pexpand(arr):
    """Insert the particle axis: [B(,D)] -> [B, 1(, D)]."""
    return jnp.expand_dims(arr, 1)


def _broadcast_twist(twist: QuadraticTwist, batch_size: int
                     ) -> QuadraticTwist:
    A = jnp.asarray(twist.A)
    b = jnp.asarray(twist.b)
    c = jnp.asarray(twist.c)
    tshape = (A.shape[0], batch_size) + A.shape[2:]
    return QuadraticTwist(A=jnp.broadcast_to(A, tshape),
                          b=jnp.broadcast_to(b, tshape),
                          c=jnp.broadcast_to(c, (c.shape[0], batch_size)))


def make_twisted_components(spec: GaussianSSMSpec, emission,
                            twist: QuadraticTwist, batch_size: int,
                            num_timesteps=None):
    """Engine components (initial, transition, emission, proposal) for
    the psi-twisted model.

    transition' == proposal' (the same closed-form twisted Gaussian), so
    the engine's ``transition_lp - proposal_lp`` cancels bit-exactly and
    the per-step weight is exactly the twisted incremental weight held
    by the corrected emission.

    `num_timesteps` (when known - `twisted_smc` always passes it)
    validates that the twist covers exactly T steps: a mismatched twist
    would otherwise produce silently wrong evidence (traced indexing
    clamps out-of-range steps; a too-long twist misaligns the
    psitilde_T = 1 padding row).
    """
    a_rows = jnp.asarray(twist.A).shape[0]
    if jnp.asarray(twist.b).shape[0] != a_rows or \
            jnp.asarray(twist.c).shape[0] != a_rows:
        raise ValueError(
            "twist.A/b/c must share their leading (time) length. "
            f"currently = {jnp.asarray(twist.A).shape[0]}/"
            f"{jnp.asarray(twist.b).shape[0]}/"
            f"{jnp.asarray(twist.c).shape[0]}")
    if num_timesteps is not None and a_rows != num_timesteps:
        raise ValueError(
            f"twist covers {a_rows} steps but the observation sequence "
            f"has {num_timesteps} - build the twist for this T "
            "(exact_lgssm_twist / learn_twist on the same observations)")
    twist = _broadcast_twist(twist, batch_size)
    num_steps = a_rows
    vector = twist.vector
    s2 = jnp.square(jnp.asarray(spec.transition_scale))
    s02 = jnp.square(jnp.asarray(spec.initial_scale))
    m0 = jnp.asarray(spec.initial_loc)

    # Zero row T: psitilde_T = 1 (log 0) falls out of _quad_terms.
    zrow = jnp.zeros_like(twist.A[:1])
    a_pad = jnp.concatenate([twist.A, zrow], axis=0)
    b_pad = jnp.concatenate([twist.b, zrow], axis=0)
    c_pad = jnp.concatenate([twist.c, jnp.zeros_like(twist.c[:1])], axis=0)

    # log mu(psi_0): the t=0 evidence constant, [batch].
    log_mu_psi0 = (_reduce(_quad_terms(m0, s02, twist.A[0], twist.b[0]),
                           vector) + twist.c[0])

    def _tindex(time):
        return time if isinstance(time, int) else jnp.asarray(time)

    def _s2_of(prev, time):
        """Per-particle transition variance: constant, or scale_fn^2."""
        if spec.scale_fn is None:
            return s2
        return jnp.square(spec.scale_fn(prev, time))

    def _twisted_gaussian(m, a, b, s2t):
        p = 1.0 / s2t + a
        loc = (m / s2t + b) / p
        scale = jax.lax.rsqrt(p)
        if vector:
            return dists.MultivariateNormalDiag(
                loc, jnp.broadcast_to(scale, loc.shape),
                batch_shape_mode=BatchShapeMode.FULLY_EXPANDED)
        return dists.Normal(loc, scale,
                            batch_shape_mode=BatchShapeMode.FULLY_EXPANDED)

    def initial_():
        p0 = 1.0 / s02 + twist.A[0]
        loc = (m0 / s02 + twist.b[0]) / p0
        scale = jax.lax.rsqrt(p0)
        if vector:
            return dists.MultivariateNormalDiag(
                loc, jnp.broadcast_to(scale, loc.shape),
                batch_shape_mode=BatchShapeMode.BATCH_EXPANDED)
        return dists.Normal(loc, scale,
                            batch_shape_mode=BatchShapeMode.BATCH_EXPANDED)

    def transition_(previous_latents=None, time=None,
                    previous_observations=None):
        del previous_observations
        t = _tindex(time)
        m = spec.mean_fn(previous_latents[-1], time)
        return _twisted_gaussian(m, _pexpand(a_pad[t]), _pexpand(b_pad[t]),
                                 _s2_of(previous_latents[-1], time))

    def proposal_(previous_latents=None, time=None, observations=None):
        del observations
        if isinstance(time, int) and time == 0:
            return initial_()
        return transition_(previous_latents=previous_latents, time=time)

    def emission_(latents=None, time=None, previous_observations=None):
        base = emission(latents=latents, time=time,
                        previous_observations=previous_observations)
        x = latents[-1]
        t = _tindex(time)
        # log psitilde_{t+1}(x): integrates the *next* transition kernel
        # N(mean_fn(x, t+1), s2) against psi_{t+1}. At the FINAL step
        # psitilde_T = 1 (the zero padding row), so mean_fn is never
        # asked for the out-of-range time T: the static case skips the
        # term structurally, the traced case clamps mean_fn's time to
        # T-1 (its value multiplies into the zero row, but a NaN/inf
        # from an out-of-range index would survive NaN * 0).
        x0 = jax.tree_util.tree_leaves(x)[0]
        if isinstance(time, int) and time + 1 >= num_steps:
            lp_tilde = jnp.zeros(x0.shape[:2], x0.dtype)
        else:
            t_next = (time + 1 if isinstance(time, int) else
                      jnp.minimum(jnp.asarray(time) + 1, num_steps - 1))
            m_next = spec.mean_fn(x, t_next)
            lp_tilde = (_reduce(_quad_terms(m_next, _s2_of(x, t_next),
                                            _pexpand(a_pad[t + 1]),
                                            _pexpand(b_pad[t + 1])),
                                vector)
                        + _pexpand(c_pad[t + 1]))
        lp_psi = (_reduce(-0.5 * _pexpand(a_pad[t]) * jnp.square(x)
                          + _pexpand(b_pad[t]) * x, vector)
                  + _pexpand(c_pad[t]))
        corr = lp_tilde - lp_psi
        if isinstance(time, int) and time == 0:
            corr = corr + _pexpand(log_mu_psi0)
        return LogCorrectedDistribution(
            base, corr, batch_shape_mode=BatchShapeMode.FULLY_EXPANDED)

    return initial_, transition_, emission_, proposal_


def make_discrete_twisted_components(spec: DiscreteSSMSpec, emission,
                                     twist: TabularTwist, batch_size: int,
                                     num_timesteps=None):
    """Engine components for the psi-twisted DISCRETE model (HMM family).

    Mirror of `make_twisted_components` on a finite state space: the
    twisted transition is the exactly-renormalized Categorical with
    logits ``logP[x_{t-1}] + log psi_t``, transition' == proposal'
    cancel bit-exactly, and the emission carries
    ``log g + log psitilde_{t+1} - log psi_t`` (plus ``log mu(psi_0)``
    at t=0). `psitilde` is an exact log-matrix-vector product, so the
    optimal twist (`exact_hmm_twist`) yields the zero-variance / exact
    evidence property with NO model restrictions at all - the discrete
    case is the one setting where twisted SMC is always exactly
    realizable. int32 particles ride every engine path the HMM family
    already exercises (fused gathers, stop-gradient sampling).
    """
    logpsi = jnp.asarray(twist.logpsi)
    if logpsi.ndim != 3:
        raise ValueError(
            f"TabularTwist.logpsi must be [T, batch, D], got {logpsi.shape}")
    if num_timesteps is not None and logpsi.shape[0] != num_timesteps:
        raise ValueError(
            f"twist covers {logpsi.shape[0]} steps but the observation "
            f"sequence has {num_timesteps} - build the twist for this T "
            "(exact_hmm_twist on the same observations)")
    num_steps, _, num_states = logpsi.shape
    logpsi = jnp.broadcast_to(logpsi, (num_steps, batch_size, num_states))
    logP = jax.nn.log_softmax(jnp.asarray(spec.transition_logits,
                                          logpsi.dtype), axis=-1)
    logpi0 = jax.nn.log_softmax(jnp.asarray(spec.initial_logits,
                                            logpsi.dtype))
    if logP.shape != (num_states, num_states):
        raise ValueError(
            f"transition_logits {logP.shape} vs twist D={num_states}")

    # psi_pad row T = log 1; psitilde_pad[t](i) = lse_j logP[i,j] +
    # psi_pad[t, b, j]. The final row is forced to exactly 0 (rows of
    # logP are normalized, so it is 0 up to fp rounding anyway).
    psi_pad = jnp.concatenate([logpsi, jnp.zeros_like(logpsi[:1])], axis=0)
    psitilde_pad = jax.nn.logsumexp(
        logP[None, None] + psi_pad[:, :, None, :], axis=-1)
    psitilde_pad = psitilde_pad.at[-1].set(0.0)
    log_mu_psi0 = jax.nn.logsumexp(logpi0[None, :] + logpsi[0], axis=-1)

    def _tindex(time):
        return time if isinstance(time, int) else jnp.asarray(time)

    # One-hot masked-sum lookups instead of int-indexed gathers: the
    # round-5 HMM decomposition (BENCH_NOTES "HMM gap CLOSED") measured
    # [B, K]-indexed table gathers at ~6.5x the masked-sum cost on TPU
    # (cross-lane dynamic selects serialize per index); the fix took
    # this path from 69.1M to 408.3M particle-steps/s.
    def _rows(table, idx):
        """`table[idx]` for `table [D, D]`, `idx [B, K]` -> [B, K, D]."""
        return amath.table_lookup(table, idx)

    def _per_batch(table_bd, idx):
        """`out[b, k] = table_bd[b, idx[b, k]]` for `table_bd [B, D]`.

        vmap of the shared helper over the batch row so the threshold
        and masked-sum strategy stay in lockstep with `table_lookup`."""
        return jax.vmap(amath.table_lookup)(table_bd, idx)

    def initial_():
        return dists.Categorical(
            logpi0[None, :] + logpsi[0],
            batch_shape_mode=BatchShapeMode.BATCH_EXPANDED)

    def transition_(previous_latents=None, time=None,
                    previous_observations=None):
        del previous_observations
        t = _tindex(time)
        prev = jnp.asarray(previous_latents[-1]).astype(jnp.int32)
        logits = _rows(logP, prev) + psi_pad[t][:, None, :]   # [B, K, D]
        return dists.Categorical(
            logits, batch_shape_mode=BatchShapeMode.FULLY_EXPANDED)

    def proposal_(previous_latents=None, time=None, observations=None):
        del observations
        if isinstance(time, int) and time == 0:
            return initial_()
        return transition_(previous_latents=previous_latents, time=time)

    def emission_(latents=None, time=None, previous_observations=None):
        base = emission(latents=latents, time=time,
                        previous_observations=previous_observations)
        t = _tindex(time)
        x = jnp.asarray(latents[-1]).astype(jnp.int32)        # [B, K]
        corr = (_per_batch(psitilde_pad[t + 1], x)
                - _per_batch(psi_pad[t], x))
        if isinstance(time, int) and time == 0:
            corr = corr + log_mu_psi0[:, None]
        return LogCorrectedDistribution(
            base, corr, batch_shape_mode=BatchShapeMode.FULLY_EXPANDED)

    return initial_, transition_, emission_, proposal_


def twisted_smc(observations, spec, emission, twist, num_particles: int,
                key=None, **infer_kwargs) -> dict:
    """SMC on the psi-twisted model; same return vocabulary as `infer`.

    `spec` selects the family: `GaussianSSMSpec` + `QuadraticTwist`
    (continuous latents) or `DiscreteSSMSpec` + `TabularTwist` (HMM).
    The log-marginal-likelihood estimator is unbiased for the *original*
    model's evidence for any twist, and exact (zero variance) at the
    optimal twist.
    """
    stacked = ainference.stack_observations(observations)
    lead = jax.tree_util.tree_leaves(stacked)[0]
    batch_size = lead.shape[1]
    maker = (make_discrete_twisted_components
             if isinstance(spec, DiscreteSSMSpec)
             else make_twisted_components)
    initial_, transition_, emission_, proposal_ = maker(
        spec, emission, twist, batch_size, num_timesteps=lead.shape[0])
    infer_kwargs.setdefault("return_log_marginal_likelihood", True)
    return ainference.infer(
        "smc", stacked, initial_, transition_, emission_, proposal_,
        num_particles=num_particles, key=key, **infer_kwargs)


def exact_lgssm_twist(observations, initial_mean, initial_scale,
                      transition_mult, transition_scale, emission_mult,
                      emission_scale) -> QuadraticTwist:
    """Optimal twist psi_t(x) = p(y_{t:T-1} | x_t) for a linear-Gaussian
    SSM (scalar params, or [D] arrays for a diagonal/independent-dims
    model), via the closed-form backward information filter:
    psi_{T-1} = g_{T-1}, psi_t = g_t * psitilde_{t+1}, all
    log-quadratic. `initial_mean`/`initial_scale` are unused (the t=0
    twist acts through the twisted initial) but kept for signature
    symmetry with the Kalman oracles.
    """
    del initial_mean, initial_scale
    y = jnp.asarray(ainference.stack_observations(observations),
                    dtype=jnp.result_type(float))
    vector = y.ndim == 3
    a = jnp.asarray(transition_mult, y.dtype)
    s2 = jnp.square(jnp.asarray(transition_scale, y.dtype))
    ce = jnp.asarray(emission_mult, y.dtype)
    e2 = jnp.square(jnp.asarray(emission_scale, y.dtype))

    def step(carry, y_t):
        a_til, b_til, c_til = carry
        # psi_t = g_t * psitilde_{t+1}, expanded in x.
        a_t = jnp.square(ce) / e2 + a_til
        b_t = y_t * ce / e2 + b_til
        c_t = (-0.5 * jnp.square(y_t) / e2
               - 0.5 * jnp.log(2.0 * jnp.pi * e2) + c_til)
        # psitilde_t(x) = int N(x'; a x, s2) psi_t(x') dx', quadratic
        # in x (expand _quad_terms at m = a x).
        p = 1.0 / s2 + a_t
        a_til2 = jnp.square(a) / s2 - jnp.square(a) / (jnp.square(s2) * p)
        b_til2 = a * b_t / (s2 * p)
        c_til2 = jnp.square(b_t) / (2.0 * p) + c_t - 0.5 * jnp.log(s2 * p)
        return (a_til2, b_til2, c_til2), (a_t, b_t, c_t)

    z = jnp.zeros_like(y[0] * (ce * 0 + 1))  # [B(,D)], broadcast vs params
    _, (A, b, c) = jax.lax.scan(step, (z, z, z), y[::-1])
    A, b, c = A[::-1], b[::-1], c[::-1]
    if vector:
        c = jnp.sum(c, axis=-1)
    return QuadraticTwist(A=A, b=b, c=c)


def exact_hmm_twist(observations, initial_logits, transition_logits,
                    locs=None, scale=None, *, emission_logliks=None
                    ) -> TabularTwist:
    """Optimal twist ``psi_t(x) = p(y_{t:T-1} | x_t = x)`` for a discrete
    HMM: the exact backward (beta) recursion
    ``psi_{T-1} = g_{T-1}``, ``psi_t = g_t * (P @ psi_{t+1})``.

    Pass Gaussian-emission params (`locs` `[D]`, `scale`) to match
    `models.hmm` (and the `hmm_forward` oracle signature,
    models/hmm.py:202), or `emission_logliks` `[T, B, D]` (per-state
    log g_t(y_t | d)) for ANY evaluable emission - the finite state
    space makes the optimal twist exactly computable regardless of the
    emission family. `initial_logits` is unused (the t=0 twist acts
    through the twisted initial) but kept for signature symmetry.
    """
    del initial_logits
    logP = jax.nn.log_softmax(
        jnp.asarray(transition_logits, jnp.result_type(float)), axis=-1)
    if emission_logliks is None:
        if locs is None or scale is None:
            raise ValueError("pass (locs, scale) or emission_logliks=")
        y = jnp.asarray(ainference.stack_observations(observations),
                        logP.dtype)
        locs = jnp.asarray(locs, logP.dtype)
        emission_logliks = dists.Normal(
            locs[None, None, :], jnp.asarray(scale, logP.dtype)).log_prob(
                y[:, :, None])                                 # [T, B, D]
    ll = jnp.asarray(emission_logliks, logP.dtype)

    def step(psi_next, ll_t):
        # psitilde_{t+1}(i) = lse_j logP[i, j] + psi_{t+1}(j); the zero
        # init makes the final step psi_{T-1} = g_{T-1} exactly.
        psi = ll_t + jax.nn.logsumexp(
            logP[None] + psi_next[:, None, :], axis=-1)
        return psi, psi

    _, psis = jax.lax.scan(step, jnp.zeros_like(ll[0]), ll[::-1])
    return TabularTwist(logpsi=psis[::-1])


def _fit_quadratic(x, target, ridge, weights=None):
    """Least-squares fit of `target` [K] on quadratic features of `x`
    ([K] scalar or [K, D] vector): returns (A [.,D?], b, c) with A
    clamped >= 0 so the twisted kernels stay proper.

    `weights` [K] (normalized) switches to WEIGHTED least squares -
    the regression under the filter distribution rather than the
    uniform particle cloud. Under feature misspecification (deep
    models, where log g is nowhere near quadratic) this is what keeps
    the ADP iteration stable: the unweighted fit is dominated by
    far-tail particles whose targets are thousands of nats below the
    mass of the filter, and the resulting garbage twist moves the next
    iteration's particles further out - a measured divergence on the
    bouncing-ball model (per-iteration logZ 726 -> -19k -> -91k).

    Robustness (ADVICE r3): a (near-)degenerate particle cloud - e.g.
    post-collapse duplicated particles with ridge=0 - makes the Gram
    singular; non-finite solves fall back to the ZERO twist row instead
    of propagating NaN parameters into later ADP iterations. And (b, c)
    are REFIT with A held at its clamped value, so the returned triple
    is the constrained least-squares fit when the positivity clamp
    binds (identical to the joint fit when it doesn't)."""
    xm = x[:, None] if x.ndim == 1 else x
    d = xm.shape[-1]
    if weights is not None:
        # sqrt-weight rows; scale so ridge keeps its unweighted meaning
        # (weights sum to 1, so multiply back by K).
        sw = jnp.sqrt(weights * weights.shape[0])[:, None]
    else:
        sw = jnp.ones_like(xm[:, :1])
    phi = jnp.concatenate(
        [jnp.square(xm), xm, jnp.ones_like(xm[:, :1])], axis=1) * sw
    tgt = target * sw[:, 0]
    gram = phi.T @ phi + ridge * jnp.eye(phi.shape[1], dtype=x.dtype)
    theta = jnp.linalg.solve(gram, phi.T @ tgt)
    theta = jnp.where(jnp.all(jnp.isfinite(theta)), theta,
                      jnp.zeros_like(theta))
    a_fit = jnp.maximum(-2.0 * theta[:d], 0.0)
    # Refit (b, c) given A: target + A/2 x^2 ~= b x + c.
    resid = (target + 0.5 * jnp.sum(jnp.square(xm) * a_fit, axis=1)) \
        * sw[:, 0]
    phi2 = jnp.concatenate([xm, jnp.ones_like(xm[:, :1])], axis=1) * sw
    gram2 = phi2.T @ phi2 + ridge * jnp.eye(d + 1, dtype=x.dtype)
    theta2 = jnp.linalg.solve(gram2, phi2.T @ resid)
    theta2 = jnp.where(jnp.all(jnp.isfinite(theta2)), theta2,
                       jnp.zeros_like(theta2))
    b_fit = theta2[:d]
    c_fit = theta2[-1]
    if x.ndim == 1:
        return a_fit[0], b_fit[0], c_fit
    return a_fit, b_fit, c_fit


def _adp_refit(observations, spec: GaussianSSMSpec, emission, xs,
               ridge, log_weights=None, fit_jitter: float = 0.0,
               key=None) -> QuadraticTwist:
    """One backward ADP pass: fit log psi_t to
    ``log g_t + log psitilde_{t+1}`` at the particle locations, t from
    T-1 down to 0 (t=0 hoisted out of the scan, engine-style, so the
    emission still sees a static `time=0` there).

    `log_weights` [T, B, K] (the twisted run's per-step pre-resampling
    weights) switches the regressions to weighted least squares under
    the filter distribution - see `_fit_quadratic`.

    `fit_jitter > 0` instead CHOOSES the regression design points:
    multinomial-resample the cloud by those weights, add
    ``fit_jitter * scale`` Gaussian noise, and fit UNWEIGHTED at the
    jittered points (targets are re-evaluated there - both log g and
    log psitilde are closed-form functions of x, so design points are
    free). This fixes the two failure modes of in-cloud fits on
    misspecified models: a near-collapsed step gives a one-particle
    (degenerate) regression, and far-tail particles with targets
    thousands of nats down otherwise dominate the L2 objective."""
    y = ainference.stack_observations(observations)
    x0 = jax.tree_util.tree_leaves(xs)[0]
    num_timesteps, _, num_particles = x0.shape[:3]
    vector = x0.ndim == 4
    s2 = jnp.square(jnp.asarray(spec.transition_scale))
    fit = jax.vmap(_fit_quadratic, in_axes=(0, 0, None, 0))
    from .math import exponentiate_and_normalize
    lw = (log_weights if log_weights is not None
          else jnp.zeros(x0.shape[:3], x0.dtype))
    w = exponentiate_and_normalize(lw, dim=-1)
    jitter = float(fit_jitter)
    if jitter and key is None:
        key = jax.random.PRNGKey(0)
    step_keys = (jax.random.split(key, num_timesteps)
                 if jitter else jnp.zeros((num_timesteps, 2), jnp.uint32))

    def _design(x_t, lw_t, k, scale):
        """[B, K(,D)] design points: resample by weight + jitter."""
        kc, kn = jax.random.split(k)
        idx = jax.vmap(lambda kk, ll: jax.random.categorical(
            kk, ll, shape=(num_particles,)))(
                jax.random.split(kc, lw_t.shape[0]), lw_t)       # [B, K]
        if vector:
            xd = jnp.take_along_axis(x_t, idx[..., None], axis=1)
        else:
            xd = jnp.take_along_axis(x_t, idx, axis=1)
        return xd + jitter * scale * jax.random.normal(kn, xd.shape,
                                                       xd.dtype)

    def target_and_fit(carry, x_t, y_t, w_t, lw_t, time, k, scale):
        a_n, b_n, c_n = carry
        if jitter:
            x_t = _design(x_t, lw_t, k, scale)
            w_t = jnp.full_like(w_t, 1.0 / num_particles)
        g = astate.log_prob(
            emission(latents=[x_t], time=time),
            astate.expand_observation(y_t, num_particles))
        m_next = spec.mean_fn(x_t, time + 1)
        s2_next = (s2 if spec.scale_fn is None
                   else jnp.square(spec.scale_fn(x_t, time + 1)))
        lp_tilde = (_reduce(_quad_terms(m_next, s2_next, _pexpand(a_n),
                                        _pexpand(b_n)), vector)
                    + _pexpand(c_n))
        return fit(x_t, g + lp_tilde, ridge, w_t)

    def step(carry, inp):
        y_t, x_t, w_t, lw_t, t, k = inp
        fitted = target_and_fit(carry, x_t, w_t=w_t, lw_t=lw_t, y_t=y_t,
                                time=ainference.TimeIndex(t), k=k,
                                scale=spec.transition_scale)
        return fitted, fitted

    zslice = jnp.zeros_like(x0[0, :, 0])  # [B(,D)]
    zc = jnp.zeros(x0.shape[1], x0.dtype)
    y_rest = jax.tree_util.tree_map(lambda a: a[1:][::-1], y)
    x_rest = jax.tree_util.tree_map(lambda a: a[1:][::-1], xs)
    ts = jnp.arange(1, num_timesteps)[::-1]
    carry1, (a_rev, b_rev, c_rev) = jax.lax.scan(
        step, (zslice, zslice, zc),
        (y_rest, x_rest, w[1:][::-1], lw[1:][::-1], ts,
         step_keys[1:][::-1]))
    a0, b0, c0 = target_and_fit(
        carry1, jax.tree_util.tree_map(lambda v: v[0], xs),
        jax.tree_util.tree_map(lambda v: v[0], y), w[0], lw[0], 0,
        step_keys[0], spec.initial_scale)
    stack = lambda h, r: jnp.concatenate([h[None], r[::-1]], axis=0)
    return QuadraticTwist(A=stack(a0, a_rev), b=stack(b0, b_rev),
                          c=stack(c0, c_rev))


def learn_twist(observations, spec: GaussianSSMSpec, emission,
                num_particles: int, key=None, num_iterations: int = 2,
                init_twist: Optional[QuadraticTwist] = None,
                ridge: float = 1e-6, weighted: bool = True,
                damping: float = 0.0,
                max_precision_ratio: Optional[float] = None,
                fit_jitter: float = 0.0, keep: str = "last",
                keep_num_particles: Optional[int] = None,
                keep_num_seeds: int = 1, **smc_kwargs):
    """Iterated ADP twist learning (psi-APF, Guarniero et al. 2017).

    Each iteration runs twisted SMC under the current twist and refits
    all T twists by backward regression on quadratic features of the
    (pre-resampling) particles. Markov, time-uniform emissions only
    (the regression scan passes a traced `TimeIndex`; reference-style
    `if time == 0` emission branches are handled by the hoisted t=0
    fit). Returns ``(twist, info)`` with per-iteration evidence
    estimates in ``info['log_marginal_likelihood']`` `[iters, batch]`.

    Misspecification controls (for models whose optimal twist is NOT
    log-quadratic - i.e. every model one actually needs twisting for):
    - `weighted` (default True): regress under the filter distribution
      (per-step normalized weights) instead of the uniform particle
      cloud. On exactly-quadratic targets (LGSSM) the fit is exact
      either way (zero residual), so the one-pass exactness property is
      unchanged; under misspecification the unweighted fit is dominated
      by far-tail particles and DIVERGES (measured on bouncing-ball:
      per-iteration logZ 726 -> -19k -> -91k).
    - `damping` in [0, 1): geometric step - the new twist is
      ``(1-damping) * fitted + damping * previous`` (log-quadratics are
      closed under convex combination and A stays >= 0).
    - `fit_jitter` (sigma multiples): regress at CHOSEN design points -
      weight-resampled particles plus ``fit_jitter * scale`` Gaussian
      noise - instead of the raw cloud. Keeps every per-step regression
      well-posed even where the filter momentarily collapses to a
      single surviving particle (a one-particle weighted fit is
      degenerate and the nan-fallback zeroes that twist row).
    - `max_precision_ratio` (kappa): clamp each A to
      ``kappa / transition_scale**2`` so the twisted kernel's standard
      deviation never shrinks below ``scale / sqrt(1 + kappa)``. A
      misspecified quadratic fit to a sharply-peaked log g (e.g. a
      renderer emission) produces curvatures many times the transition
      precision; if its location is even slightly off, the overconfident
      twisted kernel proposes nothing near the data and the filter does
      WORSE than bootstrap (the evidence stays unbiased for any clamped
      twist - only twist quality is at stake, so the clamp is safe).
    - `keep='best'`: score EVERY candidate twist (the init twist -
      zeros = bootstrap - and each iteration's fit) with a fresh
      twisted run at `keep_num_particles` particles (default:
      `num_particles`) and return, PER BATCH ROW, the highest-scoring
      twist (the estimator is unbiased in Z for any twist, so a higher
      mean log-evidence = a lower-variance twist). Two measured
      bouncing-ball facts make this the robust choice on deep models:
      (a) iterations are NOT monotone - iteration 1's twist beats
      iteration 2's (the twisted run's own particles are worse
      regression fodder than a tracking bootstrap's); (b) twist
      rankings DEPEND ON K - at the learning K (2048) bootstrap
      tracks and outscores the misspecified twist (+1556 vs ~+470),
      while at the deploy K (128) the twist wins by ~17,000 nats
      (+306 vs -17,160) - so score at the particle count you intend
      to deploy via `keep_num_particles`. Since the zero init is
      scored too, 'best' never returns a twist that scored worse than
      untwisted SMC. `keep_num_seeds` averages each candidate's score
      over several runs: a collapsing bootstrap's single-seed score is
      BIMODAL (measured at K=128: ~+1550 on the ~20% of seeds that
      track, ~-15,000 otherwise), so one lucky seed can out-score a
      reliable twist - the mean over a handful of seeds is the
      low-noise ranking of E[log Zhat], which is what twist quality
      means. With 'best', ``info['scores']`` `[iters + 1, batch]`
      holds the (seed-averaged) selection scores and
      ``info['selected']`` `[batch]` the winning candidate per row
      (0 = the init twist).
    """
    if keep not in ("last", "best"):
        raise ValueError(f"keep must be 'last' or 'best', got {keep!r}")
    if key is None:
        key = jax.random.PRNGKey(0)
    y = ainference.stack_observations(observations)
    lead = jax.tree_util.tree_leaves(y)[0]
    num_timesteps, batch_size = lead.shape[0], lead.shape[1]
    loc = jnp.asarray(spec.initial_loc)
    dim = None if loc.ndim == 0 else loc.shape[-1]
    twist = init_twist if init_twist is not None else QuadraticTwist.zeros(
        num_timesteps, batch_size, dim, dtype=jnp.result_type(float))

    need_lw = weighted or fit_jitter > 0

    # One jitted program per PHASE, compiled once and reused across
    # iterations/candidates (round-5, VERDICT r4 #6): the previous
    # un-jitted loop eager-dispatched every op of every iteration
    # through the device relay AND re-traced per iteration - that, not
    # the ADP math, was the 76-161 s wall at K=2048. The key-split
    # structure is unchanged, so results are bit-identical.
    def _one_iteration(tw, subkey, fit_key):
        out = twisted_smc(
            y, spec, emission, tw, num_particles, key=subkey,
            return_latents=False, return_original_latents=True,
            return_log_weights=need_lw, **smc_kwargs)
        fitted = _adp_refit(
            y, spec, emission, out["original_latents"], ridge,
            log_weights=out["log_weights"] if need_lw else None,
            fit_jitter=fit_jitter, key=fit_key)
        if damping:
            fitted = QuadraticTwist(
                A=(1.0 - damping) * fitted.A + damping * tw.A,
                b=(1.0 - damping) * fitted.b + damping * tw.b,
                c=(1.0 - damping) * fitted.c + damping * tw.c)
        if max_precision_ratio is not None:
            # Row 0 twists the INITIAL kernel (scale s0), rows 1..T-1
            # the transition kernel (scale s).
            s2 = jnp.square(jnp.asarray(spec.transition_scale))
            s02 = jnp.square(jnp.asarray(spec.initial_scale))
            kap = jnp.asarray(max_precision_ratio)
            a_cap = jnp.concatenate(
                [jnp.broadcast_to(kap / s02, fitted.A[:1].shape),
                 jnp.broadcast_to(kap / s2, fitted.A[1:].shape)], axis=0)
            a_new = jnp.minimum(fitted.A, a_cap)
            # Rescale b with A so the twist MODE (b/A) is preserved
            # where the cap binds - clamping A alone would leave a
            # large b acting through a now-weak quadratic, shooting
            # the twisted-kernel location far past the fitted peak.
            scale = jnp.where(fitted.A > 0, a_new / jnp.maximum(
                fitted.A, 1e-30), 1.0)
            fitted = QuadraticTwist(A=a_new, b=fitted.b * scale,
                                    c=fitted.c)
        return fitted, out["log_marginal_likelihood"]

    one_iteration = jax.jit(_one_iteration)

    log_zs = []
    twists = []
    for _ in range(num_iterations):
        twists.append(twist)
        key, subkey, fit_key = jax.random.split(key, 3)
        twist, lz = one_iteration(twist, subkey, fit_key)
        log_zs.append(lz)
    if keep == "last":
        return twist, {"log_marginal_likelihood": jnp.stack(log_zs)}
    # keep='best': score every candidate at the DEPLOY particle count,
    # then select per batch row.
    twists.append(twist)
    k_score = (num_particles if keep_num_particles is None
               else keep_num_particles)
    score_one = jax.jit(lambda t, ks: jnp.mean(
        jax.vmap(lambda k: twisted_smc(
            y, spec, emission, t, k_score, key=k,
            return_latents=False, return_log_weight=False,
            **smc_kwargs)["log_marginal_likelihood"])(ks), axis=0))
    scores = []
    for tw in twists:
        key, subkey = jax.random.split(key)
        seed_keys = jax.random.split(subkey, int(keep_num_seeds))
        # One compiled scoring program, reused for every candidate
        # (identical shapes; the twist is a traced argument).
        scores.append(score_one(tw, seed_keys))
    scores = jnp.stack(scores)                        # [iters + 1, B]
    sel = jnp.argmax(scores, axis=0)                  # [B]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *twists)

    def pick(arr):                                    # [n, T, B(,D)]
        i = sel[None, None, :] if arr.ndim == 3 else \
            sel[None, None, :, None]
        return jnp.take_along_axis(arr, i, axis=0)[0]

    best = QuadraticTwist(A=pick(stacked.A), b=pick(stacked.b),
                          c=pick(stacked.c))
    return best, {"log_marginal_likelihood": jnp.stack(log_zs),
                  "scores": scores, "selected": sel}
