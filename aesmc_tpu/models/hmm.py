"""Discrete-latent hidden Markov model family with exact oracles.

The first DISCRETE-latent model in the zoo (beyond parity - the
reference's models at /root/reference/test/models/ are all
real-valued): latent x_t in {0..D-1} (int32 particles), sticky
categorical transitions, Gaussian emissions with per-state means, and
the EXACT locally-optimal proposal

    q(x_t = j | x_{t-1} = i, y_t) propto P[i, j] * N(y_t; mu_j, sigma)

available in closed form because the state space is finite - this is
the fully-adapted particle filter, and with multinomial resampling its
log-Z estimator variance collapses toward the auxiliary-PF optimum.

Discrete latents exercise engine paths the Gaussian families cannot:
non-reparameterizable proposal sampling (`state.sample` stop-gradient
branch), integer particle gather in resampling, Categorical pairwise
broadcasting in FFBS/PaRIS, and the user-supplied
`transition_log_bound` contract of rejection smoothing (a pmf is
globally bounded by 0, and exactly by `max log P`).

Exact oracles (`hmm_forward`, `hmm_smoother`) are the log-domain
forward and forward-backward recursions in f64 numpy, mirroring the
role `models.kalman` plays for the linear-Gaussian families.
"""

from __future__ import annotations

import os as _os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .. import distributions as dists
from ..state import BatchShapeMode


def _row_lookup(table, idx):
    """`table[idx]` for a small table `[D, ...]` and int32 `idx [B, K]`.

    For D <= 64 the gather is computed as a one-hot masked SUM
    (bit-exact: exactly one nonzero term per output) - int-indexed
    gathers at [B, K] index counts serialize row-at-a-time on TPU,
    while the masked sum is dense elementwise VPU work. Deliberately
    NOT an einsum: an f32 one-hot matmul can route to the MXU, which
    accumulates at ~bf16 precision (CLAUDE.md Mosaic gotcha) and would
    round the table values. Round-5 discrete-path fix (VERDICT r4 #1).
    """
    from .. import math as _amath
    threshold = 0 if _os.environ.get("AESMC_HMM_INDEX_GATHER") else 64
    # threshold=0: escape hatch for A/B measurement (hmm_gap_probe_r4).
    return _amath.table_lookup(table, idx, threshold=threshold)


@struct.dataclass
class Initial:
    """p(x_0) = Categorical(softmax(logits)), logits `[D]`."""

    logits: Any

    def __call__(self):
        return dists.Categorical(self.logits)


@struct.dataclass
class Transition:
    """p(x_t = j | x_{t-1} = i) = softmax(logits[i])_j, logits `[D, D]`.

    Row-indexing by the integer parents keeps the pairwise-broadcast
    contract of `tmc`/`smoothing`: `[B, K, 1]` parents produce a
    `[B, K, 1, D]`-logit Categorical whose `log_prob` broadcasts
    against `[B, 1, M]` children.
    """

    logits: Any

    def __call__(self, previous_latents=None, time=None,
                 previous_observations=None):
        prev = jnp.asarray(previous_latents[-1]).astype(jnp.int32)
        return dists.Categorical(
            _row_lookup(self.logits, prev),
            batch_shape_mode=BatchShapeMode.FULLY_EXPANDED)

    def log_bound(self, prev_latent, time, previous_observations):
        """Exact `transition_log_bound` for rejection smoothing:
        max log pmf over (parent, child). Returns `[B]`."""
        batch = jnp.asarray(prev_latent).shape[0]
        bound = jnp.max(jax.nn.log_softmax(jnp.asarray(self.logits),
                                           axis=-1))
        return jnp.full((batch,), bound)


@struct.dataclass
class Emission:
    """p(y_t | x_t = j) = N(locs[j], scale^2); `locs` `[D]` trainable."""

    locs: Any
    scale: float = struct.field(pytree_node=False)

    def __call__(self, latents=None, time=None,
                 previous_observations=None):
        idx = jnp.asarray(latents[-1]).astype(jnp.int32)
        return dists.Normal(
            _row_lookup(self.locs, idx), self.scale,
            batch_shape_mode=BatchShapeMode.FULLY_EXPANDED)


@struct.dataclass
class Proposal:
    """EXACT locally-optimal proposal (fully-adapted filter).

    Finite state space makes the optimal proposal closed-form:
    normalize (transition row) x (per-state emission likelihood of
    y_t). At time 0 the prior row replaces the transition row.
    """

    initial_logits: Any
    transition_logits: Any
    emission_locs: Any
    emission_scale: float = struct.field(pytree_node=False)

    def _state_loglik(self, obs_t):
        # [B, D]: log N(y_t; mu_j, sigma) for every state j.
        locs = jnp.asarray(self.emission_locs)
        return dists.Normal(locs[None, :],
                            self.emission_scale).log_prob(
                                jnp.asarray(obs_t)[:, None])

    def __call__(self, previous_latents=None, time=None,
                 observations=None):
        obs_t = observations[time if time != 0 else 0]
        loglik = self._state_loglik(obs_t)                    # [B, D]
        if time == 0:
            logits = jnp.asarray(self.initial_logits)[None, :] + loglik
            return dists.Categorical(
                logits, batch_shape_mode=BatchShapeMode.BATCH_EXPANDED)
        prev = jnp.asarray(previous_latents[-1]).astype(jnp.int32)
        logits = (_row_lookup(self.transition_logits, prev) +
                  loglik[:, None, :])                         # [B, K, D]
        return dists.Categorical(
            logits, batch_shape_mode=BatchShapeMode.FULLY_EXPANDED)


@struct.dataclass
class BootstrapProposal:
    """Propose from the model (prior at t=0, transition rows at t>0)."""

    initial_logits: Any
    transition_logits: Any

    def __call__(self, previous_latents=None, time=None,
                 observations=None):
        if time == 0:
            return dists.Categorical(jnp.asarray(self.initial_logits))
        prev = jnp.asarray(previous_latents[-1]).astype(jnp.int32)
        return dists.Categorical(
            _row_lookup(self.transition_logits, prev),
            batch_shape_mode=BatchShapeMode.FULLY_EXPANDED)


def sticky_transition_logits(num_states: int, stay_prob: float = 0.9):
    """Standard sticky chain: stay with `stay_prob`, else uniform."""
    off = (1.0 - stay_prob) / max(num_states - 1, 1)
    p = np.full((num_states, num_states), off)
    np.fill_diagonal(p, stay_prob)
    return jnp.log(jnp.asarray(p, dtype=jnp.result_type(float)))


def make_model(num_states: int = 3, locs=None, emission_scale: float = 0.5,
               stay_prob: float = 0.9, proposal: str = "optimal"):
    """(initial, transition, emission, proposal) for a sticky HMM.

    Default emission means are equispaced on [-(D-1), (D-1)] so states
    are distinguishable at `emission_scale=0.5` but overlap enough to
    make inference non-trivial.
    """
    if locs is None:
        locs = jnp.linspace(-(num_states - 1.0), num_states - 1.0,
                            num_states)
    locs = jnp.asarray(locs, dtype=jnp.result_type(float))
    pi = jnp.zeros((num_states,), dtype=jnp.result_type(float))
    trans = sticky_transition_logits(num_states, stay_prob)
    initial = Initial(pi)
    transition = Transition(trans)
    emission = Emission(locs=locs, scale=float(emission_scale))
    if proposal == "optimal":
        prop = Proposal(initial_logits=pi, transition_logits=trans,
                        emission_locs=locs,
                        emission_scale=float(emission_scale))
    elif proposal == "bootstrap":
        prop = BootstrapProposal(initial_logits=pi,
                                 transition_logits=trans)
    else:
        raise ValueError(f"proposal must be 'optimal' or 'bootstrap'. "
                         f"currently = {proposal}")
    return initial, transition, emission, prop


# ---------------------------------------------------------------------
# Exact oracles (f64 numpy, one sequence at a time - the same contract
# as models.kalman for the linear-Gaussian families).
# ---------------------------------------------------------------------

def _logsumexp(a, axis=None):
    m = np.max(a, axis=axis, keepdims=True)
    out = m + np.log(np.sum(np.exp(a - m), axis=axis, keepdims=True))
    return np.squeeze(out, axis=axis) if axis is not None else out


def _log_emission_matrix(obs, locs, scale):
    obs = np.asarray(obs, dtype=np.float64).reshape(-1)
    locs = np.asarray(locs, dtype=np.float64)
    return (-0.5 * ((obs[:, None] - locs[None, :]) / scale) ** 2
            - 0.5 * np.log(2.0 * np.pi * scale ** 2))         # [T, D]


def hmm_forward(obs, initial_logits, transition_logits, locs, scale):
    """Log-domain forward recursion for ONE sequence.

    Returns:
        (filtered `[T, D]` - p(x_t | y_{0:t}), log-likelihood float).
    """
    log_pi = np.asarray(jax.nn.log_softmax(jnp.asarray(initial_logits)),
                        dtype=np.float64)
    log_a = np.asarray(jax.nn.log_softmax(jnp.asarray(transition_logits),
                                          axis=-1), dtype=np.float64)
    log_b = _log_emission_matrix(obs, locs, scale)            # [T, D]
    t_len = log_b.shape[0]
    log_alpha = np.zeros_like(log_b)
    log_alpha[0] = log_pi + log_b[0]
    for t in range(1, t_len):
        log_alpha[t] = log_b[t] + _logsumexp(
            log_alpha[t - 1][:, None] + log_a, axis=0)
    loglik = float(_logsumexp(log_alpha[-1], axis=0))
    filtered = np.exp(log_alpha - _logsumexp(log_alpha,
                                             axis=1)[:, None])
    return filtered, loglik


def hmm_smoother(obs, initial_logits, transition_logits, locs, scale):
    """Forward-backward smoothed marginals `[T, D]` for ONE sequence."""
    log_a = np.asarray(jax.nn.log_softmax(jnp.asarray(transition_logits),
                                          axis=-1), dtype=np.float64)
    log_b = _log_emission_matrix(obs, locs, scale)
    log_pi = np.asarray(jax.nn.log_softmax(jnp.asarray(initial_logits)),
                        dtype=np.float64)
    t_len, d = log_b.shape
    log_alpha = np.zeros((t_len, d))
    log_alpha[0] = log_pi + log_b[0]
    for t in range(1, t_len):
        log_alpha[t] = log_b[t] + _logsumexp(
            log_alpha[t - 1][:, None] + log_a, axis=0)
    log_beta = np.zeros((t_len, d))
    for t in range(t_len - 2, -1, -1):
        log_beta[t] = _logsumexp(
            log_a + (log_b[t + 1] + log_beta[t + 1])[None, :], axis=1)
    log_gamma = log_alpha + log_beta
    return np.exp(log_gamma - _logsumexp(log_gamma, axis=1)[:, None])


def hmm_viterbi(obs, initial_logits, transition_logits, locs, scale):
    """Exact MAP state path (Viterbi) for ONE sequence. Returns
    (`[T]` int path, float joint log-probability of the path)."""
    log_pi = np.asarray(jax.nn.log_softmax(jnp.asarray(initial_logits)),
                        dtype=np.float64)
    log_a = np.asarray(jax.nn.log_softmax(jnp.asarray(transition_logits),
                                          axis=-1), dtype=np.float64)
    log_b = _log_emission_matrix(obs, locs, scale)            # [T, D]
    t_len, d = log_b.shape
    delta = log_pi + log_b[0]
    back = np.zeros((t_len, d), dtype=np.int64)
    for t in range(1, t_len):
        scores = delta[:, None] + log_a                       # [D, D]
        back[t] = np.argmax(scores, axis=0)
        delta = scores[back[t], np.arange(d)] + log_b[t]
    path = np.zeros(t_len, dtype=np.int64)
    path[-1] = int(np.argmax(delta))
    for t in range(t_len - 2, -1, -1):
        path[t] = back[t + 1][path[t + 1]]
    return path, float(np.max(delta))


def hmm_pairwise_marginals(obs, initial_logits, transition_logits, locs,
                           scale):
    """Exact smoothed PAIRWISE marginals xi_t[i, j]
    = p(x_t = i, x_{t+1} = j | y_{0:T-1}), `[T-1, D, D]` - the
    Baum-Welch E-step statistic (sum_t xi_t are the expected transition
    counts, the sufficient statistics online EM tracks via PaRIS)."""
    log_pi = np.asarray(jax.nn.log_softmax(jnp.asarray(initial_logits)),
                        dtype=np.float64)
    log_a = np.asarray(jax.nn.log_softmax(jnp.asarray(transition_logits),
                                          axis=-1), dtype=np.float64)
    log_b = _log_emission_matrix(obs, locs, scale)
    t_len, d = log_b.shape
    log_alpha = np.zeros((t_len, d))
    log_alpha[0] = log_pi + log_b[0]
    for t in range(1, t_len):
        log_alpha[t] = log_b[t] + _logsumexp(
            log_alpha[t - 1][:, None] + log_a, axis=0)
    log_beta = np.zeros((t_len, d))
    for t in range(t_len - 2, -1, -1):
        log_beta[t] = _logsumexp(
            log_a + (log_b[t + 1] + log_beta[t + 1])[None, :], axis=1)
    loglik = _logsumexp(log_alpha[-1], axis=0)
    xi = np.zeros((t_len - 1, d, d))
    for t in range(t_len - 1):
        log_xi = (log_alpha[t][:, None] + log_a +
                  (log_b[t + 1] + log_beta[t + 1])[None, :] - loglik)
        xi[t] = np.exp(log_xi)
    return xi
