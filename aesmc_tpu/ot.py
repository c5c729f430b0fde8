"""Differentiable resampling via entropy-regularized optimal transport.

Ensemble-transform resampling (Corenflos, Thornton, Deligiannidis, Doucet,
"Differentiable Particle Filtering via Entropy-Regularized Optimal
Transport", ICML 2021; see PAPERS.md): instead of discrete ancestor
indices (zero gradient almost everywhere), transport the weighted particle
cloud onto a uniformly-weighted one,

    x_tilde_j = K * sum_i P_ij x_i,

where P solves the entropic OT problem between the weighted empirical
measure and the uniform one over the same support. Fully differentiable
in both weights and particle positions. BASELINE.json config 5's
"differentiable soft/OT resampling" (together with
`resampling.soft_indices_and_weights`).

Sinkhorn runs in the log domain on the squared-Euclidean cost; the
[B, K, K] kernel matrices make this O(K^2) memory - meant for moderate K
(the discrete pipeline covers large K). All matrix steps are batched
matmuls/logsumexps - MXU/VPU-friendly.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _flatten_particles(value):
    """Pytree of [B, K, ...] -> ([B, K, D] matrix, rebuild fn)."""
    leaves, treedef = jax.tree_util.tree_flatten(value)
    shapes = [jnp.shape(leaf) for leaf in leaves]
    mats = []
    for leaf in leaves:
        leaf = jnp.asarray(leaf)
        b, k = leaf.shape[:2]
        mats.append(leaf.reshape(b, k, -1))
    stacked = jnp.concatenate(mats, axis=-1)

    def rebuild(mat):
        out = []
        start = 0
        for shape in shapes:
            d = 1
            for s in shape[2:]:
                d *= s
            out.append(mat[:, :, start:start + d].reshape(shape))
            start += d
        return jax.tree_util.tree_unflatten(treedef, out)

    return stacked, rebuild


def sinkhorn_potentials(log_weight, cost, epsilon: float,
                        num_iterations: int):
    """Log-domain Sinkhorn between masses a = softmax(log_weight) (rows)
    and uniform b (columns) for batched cost `[B, K, K]`.

    Returns (f [B, K], g [B, K]) such that
    log P_ij = (f_i + g_j - C_ij) / epsilon has marginals (a, b).
    """
    log_weight = jnp.asarray(log_weight)
    k = log_weight.shape[-1]
    log_a = jax.nn.log_softmax(log_weight, axis=-1)          # [B, K]
    log_b = jnp.full_like(log_a, -jnp.log(k))

    def body(_, fg):
        f, g = fg
        # f-update: row marginals.
        f = epsilon * log_a - epsilon * jax.nn.logsumexp(
            (g[:, None, :] - cost) / epsilon, axis=2)
        # g-update: column marginals.
        g = epsilon * log_b - epsilon * jax.nn.logsumexp(
            (f[:, :, None] - cost) / epsilon, axis=1)
        return f, g

    f0 = jnp.zeros_like(log_a)
    g0 = jnp.zeros_like(log_a)
    return jax.lax.fori_loop(0, num_iterations, body, (f0, g0))


def ot_resample(log_weight, value, epsilon: float = 0.5,
                num_iterations: int = 50,
                scale_cost: bool = True) -> Tuple:
    """Transports weighted particles onto a uniform ensemble.

    Args:
        log_weight: `[B, K]` unnormalized log-weights (differentiable!).
        value: pytree of `[B, K, ...]` particle arrays.
        epsilon: entropic regularization (relative to the mean cost when
            `scale_cost`).
        num_iterations: Sinkhorn iterations.
        scale_cost: normalize the cost matrix by its per-batch mean so
            epsilon is scale-free.

    Returns:
        (transported value pytree `[B, K, ...]`,
         new log-weights `[B, K]` - uniform zeros).
    """
    x, rebuild = _flatten_particles(value)                   # [B, K, D]
    sq = jnp.sum(x * x, axis=-1)                             # [B, K]
    cost = (sq[:, :, None] + sq[:, None, :] -
            2.0 * jnp.einsum("bkd,bld->bkl", x, x))
    cost = jnp.maximum(cost, 0.0)
    if scale_cost:
        mean_cost = jnp.mean(cost, axis=(1, 2), keepdims=True) + 1e-12
        cost = cost / mean_cost

    f, g = sinkhorn_potentials(log_weight, cost, epsilon, num_iterations)
    log_plan = (f[:, :, None] + g[:, None, :] - cost) / epsilon
    k = x.shape[1]
    # x_tilde_j = K * sum_i P_ij x_i  (columns sum to 1/K).
    transported = k * jnp.einsum(
        "bkl,bkd->bld", jnp.exp(log_plan), x)
    new_log_weight = jnp.zeros_like(jnp.asarray(log_weight))
    return rebuild(transported), new_log_weight
