"""Single-run variance estimation for SMC via genealogy tracking.

A particle filter gives a point estimate of the evidence (log-Z) and of
posterior expectations - but a SINGLE run also contains enough
information to estimate its own Monte Carlo variance: particles sharing
a common time-0 ancestor ("eve") are correlated, and the spread of
weight across distinct eve families measures how many effectively
independent samples survived. This module implements the two standard
genealogy estimators on stacked `[T-1, B, K]` ancestor arrays (one
`lax.scan` composition + one segment-sum, no replicate runs):

- `log_z_variance` - Lee & Whiteley (2018, Biometrika 105(3)): an
  estimator of the RELATIVE variance Var(Z_hat)/Z^2, unbiased for
  multinomial resampling at every step; by the delta method also
  ~Var(log Z_hat). Degenerates exactly to the textbook unbiased iid
  variance estimator when no resampling happened (importance sampling).
- `expectation_variance` - Chan & Lai (2013, Ann. Statist. 41(4)): the
  asymptotic variance sigma^2(h) of sqrt(K) (E_hat[h] - E[h]) for a
  posterior expectation under the final weights.

Everything consumes the outputs `infer(..., return_ancestral_indices=
True, return_log_weight=True)` already produces - no engine changes,
any resampling schedule (the ESS-adaptive criterion yields identity
ancestor rows for non-resampled steps, which compose through the eve
recursion unchanged; pass `num_resampling_events` to keep the
Lee-Whiteley bias factor exact per row).

Collapse diagnosis: `eve_indices` itself is the diagnostic - the number
of distinct eves is the surviving-family count. `log_z_variance`
saturates at 1.0 (100% estimated relative variance) when all weight
sits in one family - full genealogy collapse - and clips at 0.0 from
below (variance too small to resolve from one run).

No reference counterpart (/root/reference/aesmc has point estimators
only); standard SMC methodology, TPU-shaped: the eve recursion is a
`lax.scan` of `take_along_axis` gathers and family sums are one
`segment_sum` per batch row (vmapped), so the whole diagnostic is one
fused XLA program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "eve_indices", "num_families", "log_z_variance",
    "expectation_variance",
]


def eve_indices(ancestral_indices, initial=None):
    """Composes ancestor maps forward into time-0 roots ("eves").

    Args:
        ancestral_indices: `[T-1, batch, K]` int array - row t holds the
            ancestor of particle i at time t+1 (what
            `infer(return_ancestral_indices=True)` returns).
        initial: optional `[batch, K]` starting labels (defaults to
            `arange(K)` per row - time-0 identities).

    Returns:
        `[batch, K]` int32: for each final-time particle, the index of
        its time-0 ancestor.
    """
    ancestral_indices = jnp.asarray(ancestral_indices)
    if ancestral_indices.ndim != 3:
        raise ValueError(
            "ancestral_indices must be [T-1, batch, K]. Got "
            f"{ancestral_indices.shape}")
    _, batch_size, num_particles = ancestral_indices.shape
    if initial is None:
        initial = jnp.broadcast_to(
            jnp.arange(num_particles, dtype=jnp.int32),
            (batch_size, num_particles))

    def step(eve, anc_t):
        return jnp.take_along_axis(eve, anc_t, axis=1), None

    eve, _ = jax.lax.scan(step, initial, ancestral_indices)
    return eve


def num_families(ancestral_indices):
    """`[batch]` count of distinct surviving time-0 families - the
    cheapest single-number genealogy-collapse diagnostic (K = healthy,
    1 = fully collapsed)."""
    eve = eve_indices(ancestral_indices)
    num_particles = eve.shape[-1]
    one_hot_any = jax.vmap(
        lambda e: jnp.zeros(num_particles, bool).at[e].set(True))(eve)
    return jnp.sum(one_hot_any, axis=-1)


def _family_weight_sums(log_weight, eve):
    """Normalized final weights summed per eve family: `[batch, K]`
    (entry e = total normalized weight of family e; zero for extinct
    families)."""
    w = jax.nn.softmax(log_weight, axis=-1)
    num_particles = w.shape[-1]
    return jax.vmap(
        lambda wb, eb: jax.ops.segment_sum(wb, eb,
                                           num_segments=num_particles))(
        w, eve)


def log_z_variance(log_weight, ancestral_indices,
                   num_resampling_events=None):
    """Lee-Whiteley single-run estimator of Var(Z_hat) / Z_hat^2.

    V = 1 - (K/(K-1))^(m+1) * (1 - sum_e s_e^2), where s_e is the
    normalized final weight of eve family e and m the number of
    resampling events. Z_hat^2 * V is unbiased for Var(Z_hat) under
    multinomial resampling at every step (Lee & Whiteley 2018, Thm 1 /
    eq. 3.4 rearranged: E[(K/(K-1))^(m+1) Z_hat^2 sum_{E_i != E_j}
    wbar_i wbar_j] = Z^2); for systematic/stratified resampling it is the
    same plug-in genealogy statistic (typically conservative - those
    schemes have lower true variance). With no resampling (m = 0) it
    reduces EXACTLY to the unbiased iid relative-variance estimator
    [sum W^2 - K Wbar^2] / (K (K-1) Wbar^2) of plain importance
    sampling (tests/test_variance.py proves the algebra numerically).

    By the first-order delta method the same number approximates
    Var(log Z_hat).

    Args:
        log_weight: `[batch, K]` FINAL unnormalized log-weights
            (`infer(...)['log_weight']`).
        ancestral_indices: `[T-1, batch, K]` from the same run.
        num_resampling_events: optional `[batch]` (or scalar) count of
            actual resampling events m. Default: T-1, the
            always-resample schedule. For ESS-adaptive runs pass the
            per-row event count (e.g. summed `info['resampled']` flags
            from the online filter) - identity ancestor rows compose
            harmlessly through the eves but must not inflate the
            (K/(K-1))^(m+1) bias correction.

    Returns:
        `[batch]` relative-variance estimates in [0, 1]: clipped at 0
        from below (raw negative values mean the run's variance is too
        small to resolve from its own genealogy) and saturating at 1
        when all weight sits in one eve family (full collapse - the
        run claims ~100% relative variance; check `num_families`).

    Finite-K note: the per-run RELATIVE estimate is biased downward at
    moderate K (families coalesce); the unbiasedness statement is for
    the unnormalized Z_hat^2 * V form, and tests/test_variance.py
    validates exactly that identity (measured ratio 0.995 at K=256,
    R=600 replicates on the LGSSM testbed).
    """
    log_weight = jnp.asarray(log_weight)
    ancestral_indices = jnp.asarray(ancestral_indices)
    num_steps = ancestral_indices.shape[0]
    num_particles = log_weight.shape[-1]
    if num_resampling_events is None:
        num_resampling_events = num_steps
    m = jnp.asarray(num_resampling_events)

    eve = eve_indices(ancestral_indices)
    s = _family_weight_sums(log_weight, eve)          # [B, K]
    cross = 1.0 - jnp.sum(s * s, axis=-1)             # sum_{E_i != E_j} w_i w_j
    factor = (num_particles / (num_particles - 1.0)) ** (m + 1.0)
    return jnp.maximum(1.0 - factor * cross, 0.0)


def expectation_variance(value, log_weight, ancestral_indices):
    """Chan-Lai single-run estimator of the asymptotic variance of a
    posterior expectation.

    For h-values `value` `[batch, K, ...]` and the filter's final
    weights, estimates sigma^2(h) in
    sqrt(K) (sum_i wbar_i h_i - E[h | y]) -> N(0, sigma^2(h))
    as K * sum_e (sum_{i in family e} wbar_i (h_i - h_hat))^2
    (Chan & Lai 2013, eq. 2.5). The VARIANCE OF THE ESTIMATE itself is
    therefore ~ sigma^2(h) / K (what tests validate against replicate
    runs).

    Finite-K note: like every genealogy estimator this is biased
    DOWNWARD at moderate K because eve families coalesce (Olsson & Douc
    2019 discuss the effect); measured on the LGSSM testbed
    (multinomial, T=6): est/true = 0.50 at K=256, 0.68 at K=1024, 0.73
    at K=4096, converging upward as theory says. Treat moderate-K
    values as a lower bound / order-of-magnitude diagnostic. To
    restrict to a lag window (Olsson-Douc style), pass
    `ancestral_indices[-lag:]` - eves then root at time T-lag.

    Args:
        value: `[batch, K]` or `[batch, K, D]` h-values (e.g. the final
            latent, or any function of it).
        log_weight: `[batch, K]` final unnormalized log-weights.
        ancestral_indices: `[T-1, batch, K]`.

    Returns:
        sigma^2 estimates, `[batch]` (or `[batch, D]`), >= 0.
    """
    value = jnp.asarray(value)
    log_weight = jnp.asarray(log_weight)
    squeeze = value.ndim == 2
    if squeeze:
        value = value[..., None]
    batch_size, num_particles, dim = value.shape

    eve = eve_indices(ancestral_indices)
    w = jax.nn.softmax(log_weight, axis=-1)           # [B, K]
    h_hat = jnp.einsum("bk,bkd->bd", w, value)        # [B, D]
    contrib = w[..., None] * (value - h_hat[:, None, :])  # [B, K, D]

    def per_row(c, e):
        return jax.ops.segment_sum(c, e, num_segments=num_particles)

    family = jax.vmap(per_row)(contrib, eve)          # [B, K, D]
    sigma2 = num_particles * jnp.sum(family * family, axis=1)  # [B, D]
    return sigma2[..., 0] if squeeze else sigma2
