"""Unbiased score-function (REINFORCE) gradients for the SMC objective.

The default AESMC gradient stops gradients at the ancestor indices (the
reference detaches them, /root/reference/aesmc/inference.py:254): the
resulting estimate of grad E[log Z-hat] is BIASED, because the resampling
distribution itself depends on the parameters through the weights. The
derivations behind AESMC (Le et al. 2018), VSMC (Naesseth et al. 2018)
and FIVO (Maddison et al. 2017) all write down the missing correction -
a score-function term over the categorical ancestor draws - and then
drop it for variance. This module makes the full, unbiased estimator
available as an option:

    grad E[log Z]
      = E[ grad log Z  +  sum_t (sum_k grad log wbar_{t-1}[a_t^k]) * G_t ]

where `wbar_{t-1}` are the normalized resampling weights, `a_t^k` the
sampled ancestors, and G_t the ADVANTAGE. Two standard variance
reductions are applied, neither of which changes the expectation:

- causality: ancestors drawn at step t can only influence the log-Z
  contributions from step t on, so G_t sums the FUTURE per-step
  contributions only (the dropped past terms multiply a zero-mean
  score);
- a baseline independent of the row's own ancestor draws: the
  leave-one-out batch mean of G_t (other batch rows use independent
  randomness, so subtracting their mean is exactly unbiased).

The estimator requires `resampling_method='multinomial'`: multinomial
ancestors are iid categorical draws, whose joint (multiset) density is a
product of per-particle categorical probabilities up to a
parameter-independent combinatorial factor - exactly the score the
surrogate differentiates. Systematic and stratified resampling couple
all K indices through shared uniforms; their index distribution has no
tractable per-index density, so no score-function estimator exists for
them (use 'soft' or 'ot' resampling for pathwise-differentiable
alternatives instead).

Everything here is computed FROM the engine's standard outputs
(per-step log-weights and ancestor indices) - no special engine mode:
under always-resampling the carried log-weights ARE the per-step
increments, their per-step logsumexp the per-step log-Z contributions,
and the normalized previous-step weights the categorical resampling
probabilities.

Unbiasedness is validated algebraically in
tests/test_gradients.py::test_score_gradient_exact_enumeration: on a
tiny LGSSM every ancestor assignment is enumerated through the engine
(forced-index resampling callable), and the expectation of this
surrogate's gradient equals the autodiff gradient of the exact
enumerated expectation sum_A p(A; theta) logZ(A; theta) to f64
precision.
"""

from __future__ import annotations

import math as _stdmath

import jax
import jax.numpy as jnp

from . import inference

__all__ = ["score_gradient_loss", "score_surrogate_from_result"]

BASELINES = ("batch", "none")


def score_surrogate_from_result(result: dict, baseline: str = "batch"):
    """Builds the surrogate loss from an `infer` result dict.

    Args:
        result: output of `inference.infer(inference_algorithm='smc',
            resampling_method='multinomial',
            resampling_criterion='always',
            return_log_weights=True, return_ancestral_indices=True,
            return_log_marginal_likelihood=True, ...)`.
        baseline: 'batch' (leave-one-out mean of the future contribution
            sums across the batch; falls back to 'none' at batch size 1)
            or 'none'.

    Returns:
        scalar loss whose VALUE equals `-mean(log_marginal_likelihood)`
        (the score term is value-cancelled with a stop_gradient) and
        whose GRADIENT is the unbiased score-function estimator.
    """
    if baseline not in BASELINES:
        raise ValueError(
            f"baseline must be one of {BASELINES}. currently = {baseline}")
    log_weights = result["log_weights"]          # [T, B, K] increments
    anc = result["ancestral_indices"]            # [T-1, B, K]
    if log_weights is None or anc is None:
        raise ValueError(
            "score surrogate needs return_log_weights=True and "
            "return_ancestral_indices=True on the infer call")
    num_timesteps, batch_size, num_particles = log_weights.shape
    log_num_particles = _stdmath.log(num_particles)

    # Per-step log-Z contributions: logmeanexp of the step increments
    # (== the engine's own estimator decomposition under
    # always-resampling, inference.py `contributions`).
    contributions = (jax.nn.logsumexp(log_weights, axis=2)
                     - log_num_particles)                     # [T, B]
    log_z = jnp.sum(contributions, axis=0)                    # [B]
    if num_timesteps == 1:
        return -jnp.mean(log_z)

    # G_t: future contribution sums. Ancestors anc[i] are drawn at step
    # t = i + 1 from the normalized weights of step i, so their advantage
    # sums contributions from step i + 1 on.
    future = jnp.flip(jnp.cumsum(jnp.flip(contributions, axis=0), axis=0),
                      axis=0)[1:]                             # [T-1, B]

    # Score: sum_k log wbar_{t-1}[a_t^k], differentiable through the
    # gathered normalized log-weights (the total derivative includes the
    # pathwise dependence of earlier weights on the parameters - exactly
    # grad log p(ancestors; theta) along the sampled path).
    lognorm = log_weights - jax.nn.logsumexp(log_weights, axis=2,
                                             keepdims=True)   # [T, B, K]
    gathered = jnp.take_along_axis(lognorm[:-1], anc, axis=2)
    score_steps = jnp.sum(gathered, axis=2)                   # [T-1, B]

    if baseline == "batch" and batch_size > 1:
        # Leave-one-out mean over the OTHER batch rows: independent of
        # this row's ancestor draws, hence exactly unbiased.
        total = jnp.sum(future, axis=1, keepdims=True)
        b = (total - future) / (batch_size - 1)
    else:
        b = jnp.zeros_like(future)
    advantage = jax.lax.stop_gradient(future - b)

    score_term = jnp.sum(score_steps * advantage, axis=0)     # [B]
    surrogate = log_z + score_term - jax.lax.stop_gradient(score_term)
    return -jnp.mean(surrogate)


def score_gradient_loss(observations, num_particles: int, initial,
                        transition, emission, proposal, key=None,
                        baseline: str = "batch",
                        **infer_kwargs):
    """`-mean(ELBO_AESMC)` with the unbiased score-function gradient.

    Drop-in alternative to
    `losses.get_loss(..., algorithm='aesmc')` (or pass
    `gradient_estimator='score'` there): the loss VALUE is identical to
    the multinomial-resampling AESMC loss under the same key; only the
    gradient differs, by the REINFORCE resampling term (see module
    docstring).

    Args:
        observations / num_particles / components / key: as
            `losses.get_loss`.
        baseline: 'batch' (leave-one-out across the batch, default) or
            'none'.
        **infer_kwargs: forwarded to `infer`. `resampling_method`
            defaults to (and must remain) 'multinomial';
            `resampling_criterion` must stay 'always'; `lookahead` is
            unsupported (the APF's twisted ancestor distribution needs a
            different score).
    """
    method = infer_kwargs.pop("resampling_method", "multinomial")
    if method != "multinomial":
        raise ValueError(
            "the score-function gradient requires "
            "resampling_method='multinomial' (iid categorical ancestors "
            "with a tractable index density); systematic/stratified "
            f"have none. currently = {method!r}")
    criterion = infer_kwargs.pop("resampling_criterion", "always")
    if criterion != "always":
        raise ValueError(
            "the score-function gradient requires "
            "resampling_criterion='always' (carried-weight rows change "
            "the per-step contribution decomposition). "
            f"currently = {criterion!r}")
    if infer_kwargs.get("lookahead") is not None:
        raise ValueError(
            "lookahead (auxiliary PF) twists the ancestor distribution; "
            "its score term is not implemented")

    result = inference.infer(
        inference_algorithm="smc",
        observations=observations,
        initial=initial,
        transition=transition,
        emission=emission,
        proposal=proposal,
        num_particles=num_particles,
        key=key,
        resampling_method="multinomial",
        return_log_marginal_likelihood=True,
        return_latents=False,
        return_original_latents=False,
        return_log_weight=False,
        return_log_weights=True,
        return_ancestral_indices=True,
        **infer_kwargs)
    return score_surrogate_from_result(result, baseline=baseline)
