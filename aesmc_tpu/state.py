"""State/shape algebra over `[batch, particle]` axes (L1 of the stack).

Capability parity with /root/reference/aesmc/state.py:6-203: the three-way
`BatchShapeMode` dispatch that lets one distribution object serve as an
un-expanded prior, a per-batch-item distribution, or a per-particle
distribution; `sample` / `log_prob` across those modes; particle
`resample`; and observation expansion.

TPU-native differences:
- values may be arbitrary pytrees (dicts of arrays, nested), not just
  tensors/dicts - `resample` over a pytree is one `tree_map` of
  `take_along_axis` (the reference loops dict entries in Python);
- dict-valued `log_prob` actually works (the reference crashes on it:
  /root/reference/aesmc/state.py:129-132 references an undefined name,
  SURVEY.md S2.4 item 1);
- sampling takes an explicit PRNG key, split across pytree leaves.

Shape-mode inference happens at trace time (shapes are static under jit),
so the ambiguity warning of /root/reference/aesmc/state.py:28-38 fires
during tracing - same developer-facing behavior, zero runtime cost.
"""

from __future__ import annotations

import enum
import warnings
from typing import Any, Optional

import jax
import jax.numpy as jnp

from . import distributions as dists


class BatchShapeMode(enum.Enum):
    NOT_EXPANDED = 0      # batch_shape is [...]
    BATCH_EXPANDED = 1    # batch_shape is [batch_size, ...]
    FULLY_EXPANDED = 2    # batch_shape is [batch_size, num_particles, ...]


def set_batch_shape_mode(distribution, batch_shape_mode: BatchShapeMode):
    """Returns a copy of ``distribution`` tagged with an explicit mode.

    The reference mutates the distribution in place and returns it
    (/root/reference/aesmc/state.py:12-17); distributions here are
    immutable pytrees, so a tagged copy is returned - call sites that do
    ``d = set_batch_shape_mode(d, mode)`` behave identically.
    """
    if isinstance(distribution, dict):
        return {k: set_batch_shape_mode(v, batch_shape_mode)
                for k, v in distribution.items()}
    if hasattr(distribution, "replace"):
        return distribution.replace(batch_shape_mode=batch_shape_mode)
    # Fallback for duck-typed distributions: set the attribute.
    distribution.batch_shape_mode = batch_shape_mode
    return distribution


def get_batch_shape_mode(distribution,
                         batch_size: Optional[int] = None,
                         num_particles: Optional[int] = None
                         ) -> BatchShapeMode:
    """Explicit mode if tagged, else inferred from static shapes.

    Inference rules and the ambiguity warning mirror
    /root/reference/aesmc/state.py:20-58.
    """
    explicit = getattr(distribution, "batch_shape_mode", None)
    if explicit is not None:
        return explicit

    batch_shape = tuple(distribution.batch_shape)

    def warn(result):
        warnings.warn(
            "Inferred batch_shape_mode ({}) of distribution ({}) might"
            " be wrong given its batch_shape ({}), batch_size ({}) and"
            " num_particles ({}). Consider specifying the"
            " batch_shape_mode explicitly.".format(
                result, type(distribution).__name__, batch_shape,
                batch_size, num_particles),
            RuntimeWarning, stacklevel=3)

    if len(batch_shape) == 0:
        return BatchShapeMode.NOT_EXPANDED
    elif len(batch_shape) == 1:
        if batch_shape[0] == batch_size:
            result = BatchShapeMode.BATCH_EXPANDED
            warn(result)
        else:
            result = BatchShapeMode.NOT_EXPANDED
        return result
    else:
        if batch_shape[0] == batch_size:
            if batch_shape[1] == num_particles:
                result = BatchShapeMode.FULLY_EXPANDED
            else:
                result = BatchShapeMode.BATCH_EXPANDED
            warn(result)
            return result
        else:
            return BatchShapeMode.NOT_EXPANDED


def _is_distribution(obj) -> bool:
    return isinstance(obj, dists.Distribution)


def sample(distribution, batch_size: int, num_particles: int, key):
    """Samples `[batch_size, num_particles, ...]` arrays (or pytrees).

    Reparameterized distributions sample via `rsample`, matching the
    reference's stance (/root/reference/aesmc/state.py:97-100): AESMC
    gradients are pathwise through the proposal samples. DEVIATION:
    non-reparameterizable distributions (discrete latents - e.g. the
    HMM model family) do NOT raise here; they sample under an explicit
    `stop_gradient`, so filtering/evidence estimation works and no
    silently-wrong pathwise gradient can flow (train such proposals
    with `losses.get_loss(gradient_estimator='score')`).

    Args:
        distribution: a `distributions.Distribution`, a raw array (passed
            through unchanged, as /root/reference/aesmc/state.py:104-105),
            or a dict/pytree thereof.
        batch_size, num_particles: ints.
        key: PRNG key (split across pytree leaves for dict distributions).
    """
    if isinstance(distribution, dict):
        keys = jax.random.split(key, len(distribution))
        return {k: sample(v, batch_size, num_particles, subkey)
                for (k, v), subkey in zip(distribution.items(), keys)}
    elif _is_distribution(distribution):
        mode = get_batch_shape_mode(distribution, batch_size, num_particles)
        if mode == BatchShapeMode.NOT_EXPANDED:
            sample_shape = (batch_size, num_particles)
        elif mode == BatchShapeMode.BATCH_EXPANDED:
            sample_shape = (num_particles,)
        elif mode == BatchShapeMode.FULLY_EXPANDED:
            sample_shape = ()
        else:
            raise ValueError(
                f"batch_shape_mode {mode} not supported")

        if getattr(distribution, "has_rsample", True):
            result = distribution.rsample(key, sample_shape)
        else:
            result = jax.lax.stop_gradient(
                distribution.sample(key, sample_shape))

        if mode == BatchShapeMode.BATCH_EXPANDED:
            # [num_particles, batch_size, ...] -> [batch, particle, ...]
            return jnp.swapaxes(result, 0, 1)
        return result
    elif isinstance(distribution, (jnp.ndarray, jax.Array)) or hasattr(
            distribution, "shape"):
        return distribution
    else:
        raise AttributeError(
            "distribution must be a dict or a Distribution. Got: {}".format(
                distribution))


def _swap01(x):
    return jnp.swapaxes(x, 0, 1)


def log_prob(distribution, value):
    """Log probability of ``value``, reduced to `[batch, particle]`.

    Value batch dims may exceed the distribution's by 0, 1 (transpose
    trick for BATCH_EXPANDED) or 2 (broadcast), mirroring the dispatch at
    /root/reference/aesmc/state.py:138-151. Any extra per-event dims are
    summed, so the result is always `[batch_size, num_particles]`.
    """
    if isinstance(distribution, dict):
        total = None
        for k, v in distribution.items():
            lp = log_prob(v, value[k])
            total = lp if total is None else total + lp
        return total
    elif _is_distribution(distribution):
        value = jnp.asarray(value)
        value_ndim = value.ndim
        batch_shape_ndim = len(distribution.batch_shape)
        event_shape_ndim = len(distribution.event_shape)
        value_batch_shape_ndim = value_ndim - event_shape_ndim
        if (value_batch_shape_ndim == batch_shape_ndim) or \
                ((value_batch_shape_ndim - 2) == batch_shape_ndim):
            logp = distribution.log_prob(value)
        elif (value_batch_shape_ndim - 1) == batch_shape_ndim:
            logp = _swap01(distribution.log_prob(_swap01(value)))
        else:
            raise RuntimeError(
                "Incompatible distribution.batch_shape ({}) and "
                "value.shape ({}).".format(
                    distribution.batch_shape, value.shape))
        return jnp.sum(
            jnp.reshape(logp, (value.shape[0], value.shape[1], -1)), axis=2)
    else:
        raise AttributeError(
            "distribution must be a dict or a Distribution. Got: {}".format(
                distribution))


def resample(value, ancestral_index):
    """Gathers particles by ancestor index, over any pytree of values.

    value: pytree of `[batch, particle, ...]` arrays.
    ancestral_index: `[batch, particle]` int array.

    One `take_along_axis` per leaf (XLA gather on the particle axis);
    replaces the per-dict-entry recursion + `torch.gather` at
    /root/reference/aesmc/state.py:158-183.
    """
    idx = jnp.asarray(ancestral_index)

    def gather(leaf):
        leaf = jnp.asarray(leaf)
        assert idx.shape == leaf.shape[:2], (
            f"ancestral_index shape {idx.shape} does not match leading dims "
            f"of value shape {leaf.shape}")
        expanded = idx.reshape(idx.shape + (1,) * (leaf.ndim - 2))
        return jnp.take_along_axis(leaf, expanded, axis=1)

    return jax.tree_util.tree_map(gather, value)


def expand_observation(observation, num_particles: int):
    """`[batch, ...]` -> `[batch, num_particles, ...]` broadcast, per leaf.

    Parity with /root/reference/aesmc/state.py:186-203. Uses
    `broadcast_to` (a view under XLA - no copy is materialized, matching
    the reference's `expand`).
    """
    def expand(leaf):
        leaf = jnp.asarray(leaf)
        target = (leaf.shape[0], num_particles) + leaf.shape[1:]
        return jnp.broadcast_to(leaf[:, None], target)

    return jax.tree_util.tree_map(expand, observation)
