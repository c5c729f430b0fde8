"""Differentiable ELBO objectives (L3 of the stack).

Capability parity with /root/reference/aesmc/losses.py:5-65: a single
`get_loss` that maps 'iwae' -> importance sampling and 'aesmc' -> SMC,
runs `infer` for the log marginal likelihood estimate only, and returns
`-mean(ELBO)` over the batch.

Gradients flow through reparameterized proposal samples and all
log-probabilities but not through ancestor indices (the engine stops
them), reproducing the reference's AESMC gradient semantics. Unknown
algorithm strings raise ValueError (the reference hits a NameError,
SURVEY.md S2.4 item 3).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import inference

ALGORITHMS = ("iwae", "aesmc", "tmc")

# infer() kwargs that also apply to the TMC estimator; everything else
# (resampling_*, soft/ot knobs, return_* flags) is resampling- or
# engine-specific and deliberately ignored on the tmc path.
_TMC_KWARGS = ("precision", "block_size", "pairwise")


def get_loss(observations, num_particles: int, algorithm: str, initial,
             transition, emission, proposal, key=None,
             resampling_method: str = "systematic",
             resampling_implementation="auto",
             resampling_criterion="always",
             history_window: int = 1,
             nan_check: bool = False,
             remat: bool = False,
             scan_unroll: int = 1,
             mesh=None, data_axis: str = "data",
             particle_axis: str = "particle",
             gradient_estimator: str = "pathwise",
             **infer_kwargs):
    """Scalar loss -mean(ELBO) for gradient descent.

    Args:
        observations: list of `[batch, ...]` pytrees or stacked
            `[T, batch, ...]` pytree.
        num_particles: int.
        algorithm: 'iwae' (IS estimator), 'aesmc' (SMC estimator) or
            'tmc' (Tensor Monte Carlo, aesmc_tpu.tmc - all-K^T-path
            marginalization, fully differentiable).
        initial, transition, emission, proposal: user components (see
            `aesmc_tpu.inference`).
        key: PRNG key threading the sampling inside `infer`.
        resampling_method/resampling_implementation/mesh/data_axis/
            particle_axis: forwarded to `infer` (resampling args: aesmc
            only; mesh enables multi-chip sharding constraints).
        gradient_estimator: 'pathwise' (default - reference semantics:
            gradients stop at ancestor indices,
            /root/reference/aesmc/inference.py:254; biased for the SMC
            objective) or 'score' ('aesmc' +
            resampling_method='multinomial' only): adds the REINFORCE
            resampling term making grad E[log Z-hat] unbiased - see
            `aesmc_tpu.gradients`. The loss VALUE is identical either
            way; only gradients differ.

    Returns:
        scalar jnp array; differentiate with `jax.grad` /
        `jax.value_and_grad` w.r.t. the component pytrees.
    """
    if algorithm == "tmc":
        # Tensor Monte Carlo (aesmc_tpu.tmc): marginalizes all K^T
        # particle paths by exp-matmul dynamic programming - fully
        # differentiable, no resampling. resampling_* args are ignored.
        # Always remat'd here (the backward would otherwise store T
        # [B, K, K] transition tiles); call aesmc_tpu.tmc directly to
        # control that.
        from . import tmc as _tmc
        loss = _tmc.tmc_loss(
            observations, num_particles, initial, transition, emission,
            proposal, key=key, remat=True, scan_unroll=scan_unroll,
            **{k: v for k, v in infer_kwargs.items()
               if k in _TMC_KWARGS})
        if nan_check:
            # TMC has no resampling step to guard, so the equivalent of
            # the reference's per-resample NaN check
            # (/root/reference/aesmc/inference.py:244-245) is one check
            # on the final estimate: any NaN in the per-step
            # log-weights propagates to the loss through the
            # exp-matmul DP.
            from jax.experimental import checkify
            checkify.check(jnp.logical_not(jnp.isnan(loss)),
                           "tmc loss is nan")
        return loss
    if algorithm == "iwae":
        inference_algorithm = "is"
    elif algorithm == "aesmc":
        inference_algorithm = "smc"
    else:
        raise ValueError(
            f"algorithm must be one of {ALGORITHMS}. currently = {algorithm}")

    if gradient_estimator not in ("pathwise", "score"):
        raise ValueError(
            "gradient_estimator must be 'pathwise' or 'score'. "
            f"currently = {gradient_estimator}")
    if gradient_estimator == "score":
        if algorithm != "aesmc":
            raise ValueError(
                "gradient_estimator='score' corrects the RESAMPLING "
                "gradient; it only applies to algorithm='aesmc' "
                f"(currently = {algorithm}). IWAE's pathwise gradient "
                "is already unbiased.")
        from . import gradients as _gradients
        return _gradients.score_gradient_loss(
            observations, num_particles, initial, transition, emission,
            proposal, key=key,
            resampling_method=resampling_method,
            resampling_implementation=resampling_implementation,
            resampling_criterion=resampling_criterion,
            history_window=history_window,
            nan_check=nan_check, remat=remat, scan_unroll=scan_unroll,
            mesh=mesh, data_axis=data_axis, particle_axis=particle_axis,
            **infer_kwargs)

    inference_result = inference.infer(
        inference_algorithm=inference_algorithm,
        observations=observations,
        initial=initial,
        transition=transition,
        emission=emission,
        proposal=proposal,
        num_particles=num_particles,
        key=key,
        resampling_method=resampling_method,
        resampling_implementation=resampling_implementation,
        resampling_criterion=resampling_criterion,
        history_window=history_window,
        nan_check=nan_check,
        remat=remat,
        scan_unroll=scan_unroll,
        mesh=mesh, data_axis=data_axis, particle_axis=particle_axis,
        return_log_marginal_likelihood=True,
        return_latents=False,
        return_original_latents=False,
        return_log_weight=False,
        return_log_weights=False,
        return_ancestral_indices=False,
        **infer_kwargs)
    elbo = inference_result["log_marginal_likelihood"]
    return -jnp.mean(elbo)


def checked_loss(observations, num_particles: int, algorithm: str,
                 initial, transition, emission, proposal, key=None,
                 **kwargs):
    """`get_loss` with the NaN guard functionalized: returns
    `(error, loss)` where `error` is a `checkify` error value - jittable
    end to end. Call `error.throw()` (or check `error.get()`) on the
    host; inside jit a NaN in any resampling step's log-weights is
    recorded instead of silently propagating (the under-jit analogue of
    /root/reference/aesmc/inference.py:244-245)."""
    from jax.experimental import checkify

    def f():
        return get_loss(observations, num_particles, algorithm, initial,
                        transition, emission, proposal, key=key,
                        nan_check=True, **kwargs)

    return checkify.checkify(f, errors=checkify.user_checks)()


def get_loss_and_metrics(observations, num_particles: int, algorithm: str,
                         initial, transition, emission, proposal, key=None,
                         gradient_estimator: str = "pathwise",
                         score_baseline: str = "batch",
                         **infer_kwargs):
    """Like `get_loss`, but also returns a metrics dict:

    - 'elbo': mean ELBO over the batch,
    - 'ess': mean effective sample size of the final particle weights
      (the reference exposes ess only as a library function,
      /root/reference/aesmc/statistics.py:79-104; here it's wired into
      the training loop's observability). For 'tmc' there are no
      particle weights (no resampling); ess is reported as NaN.

    `gradient_estimator='score'` (aesmc + multinomial only) swaps in the
    unbiased score-function surrogate (`aesmc_tpu.gradients`) for the
    loss; metrics are unchanged (the surrogate's value equals the plain
    loss).
    """
    if algorithm == "tmc":
        from . import tmc as _tmc
        lml = _tmc.tmc_log_marginal_likelihood(
            observations, initial, transition, emission, proposal,
            num_particles, key=key, remat=True,
            **{k: v for k, v in infer_kwargs.items()
               if k in _TMC_KWARGS + ("scan_unroll",)})
        elbo = jnp.mean(lml)
        return -elbo, {"elbo": elbo, "ess": jnp.float32(jnp.nan)}
    if algorithm == "iwae":
        inference_algorithm = "is"
    elif algorithm == "aesmc":
        inference_algorithm = "smc"
    else:
        raise ValueError(
            f"algorithm must be one of {ALGORITHMS}. currently = {algorithm}")

    if gradient_estimator not in ("pathwise", "score"):
        raise ValueError(
            "gradient_estimator must be 'pathwise' or 'score'. "
            f"currently = {gradient_estimator}")
    use_score = gradient_estimator == "score"
    if use_score:
        if algorithm != "aesmc":
            raise ValueError(
                "gradient_estimator='score' only applies to "
                f"algorithm='aesmc' (currently = {algorithm})")
        if infer_kwargs.get("resampling_method",
                            "systematic") != "multinomial":
            raise ValueError(
                "gradient_estimator='score' requires "
                "resampling_method='multinomial' (see "
                "aesmc_tpu.gradients)")
        if infer_kwargs.get("resampling_criterion", "always") != "always":
            raise ValueError(
                "gradient_estimator='score' requires "
                "resampling_criterion='always'")

    result = inference.infer(
        inference_algorithm=inference_algorithm,
        observations=observations, initial=initial, transition=transition,
        emission=emission, proposal=proposal, num_particles=num_particles,
        key=key, return_log_marginal_likelihood=True, return_latents=False,
        return_log_weight=True,
        return_log_weights=use_score,
        return_ancestral_indices=use_score,
        **infer_kwargs)
    elbo = jnp.mean(result["log_marginal_likelihood"])
    log_weight = result["log_weight"]
    log_ess = 2 * jax.nn.logsumexp(log_weight, axis=1) - \
        jax.nn.logsumexp(2 * log_weight, axis=1)
    metrics = {"elbo": elbo, "ess": jnp.mean(jnp.exp(log_ess))}
    if use_score:
        from . import gradients as _gradients
        return _gradients.score_surrogate_from_result(
            result, baseline=score_baseline), metrics
    return -elbo, metrics
