"""Ensemble Kalman filtering (beyond parity).

The other half of the data-assimilation toolbox: where the particle
filter reweights and resamples, the EnKF (Evensen 1994) moves every
ensemble member by a Kalman update built from ENSEMBLE covariances - no
weights, no resampling, no degeneracy - at the price of a Gaussian
approximation of the analysis step. It is the production choice for
high-dimensional geophysical models (the Lorenz-96 regime,
`aesmc_tpu.models.lorenz`) where importance weights collapse.

Two analysis schemes:

- 'stochastic' (Burgers, van Leeuwen & Evensen 1998): perturbed
  observations; supports covariance LOCALIZATION (Schur-masking the
  ensemble covariances, Houtekamer & Mitchell 2001) - the standard cure
  for spurious long-range correlations at small ensembles. The
  Gaspari-Cohn mask for cyclic grids ships as
  `gaspari_cohn_localization`.
- 'etkf' (ensemble transform / square-root filter, Bishop et al. 2001,
  Hunt et al. 2007 formulation): deterministic, no perturbation noise -
  exact analysis mean and covariance in the ensemble subspace. (Its
  localized variant, LETKF, solves per-gridpoint problems; not
  implemented - use 'stochastic' when you need localization.)

Model contract: `initial` and `transition` are the standard component
callables (`aesmc_tpu.inference` docstring) - the EnKF ensemble IS a
particle cloud, forecast by sampling the transition distribution, so
every model family (`models.lorenz`, `models.lgssm_nd`, ...) plugs in
unchanged. The observation operator is a plain function `x [D] -> [Do]`
plus an observation covariance (nonlinear operators are handled the
usual ensemble way: covariances OF h(x), no Jacobians).

TPU shape: one `lax.scan` over time; analyses are batched einsums +
batched Cholesky/eigh over `[B]` - ensemble outer products
`[B, N, D] x [B, N, Do]` ride the MXU; no data-dependent control flow.

No reference counterpart (the reference has no filter but SMC/IS).
The per-step Gaussian innovation log-likelihood
log N(y_t; ybar_t, P_yy) is returned as the standard EnKF evidence
approximation (exact for linear-Gaussian models as N -> inf;
`tests/test_enkf.py` validates both schemes against the exact matrix
Kalman filter).
"""

from __future__ import annotations

import math as _stdmath
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import state
from .inference import TimeIndex, stack_observations

__all__ = ["enkf_filter", "gaspari_cohn", "gaspari_cohn_localization"]

METHODS = ("stochastic", "etkf")


def gaspari_cohn(dist, radius: float):
    """The Gaspari & Cohn (1999) 5th-order compact correlation taper:
    1 at distance 0, exactly 0 beyond 2 * radius."""
    r = jnp.abs(jnp.asarray(dist, jnp.result_type(float))) / float(radius)
    near = (-0.25 * r ** 5 + 0.5 * r ** 4 + 0.625 * r ** 3 -
            (5.0 / 3.0) * r ** 2 + 1.0)
    far = (r ** 5 / 12.0 - 0.5 * r ** 4 + 0.625 * r ** 3 +
           (5.0 / 3.0) * r ** 2 - 5.0 * r + 4.0 - (2.0 / 3.0) / r)
    out = jnp.where(r <= 1.0, near, jnp.where(r < 2.0, far, 0.0))
    return jnp.where(r == 0.0, 1.0, out)


def gaspari_cohn_localization(dim: int, obs_indices=None,
                              radius: float = 2.0):
    """(loc_xy [D, Do], loc_yy [Do, Do]) Schur masks for a CYCLIC
    1-D grid (the Lorenz-96 geometry): taper by the shortest ring
    distance between state component i and the grid location of each
    observed component."""
    grid = np.arange(dim)
    obs = (grid if obs_indices is None
           else np.asarray(list(obs_indices), np.int64))
    d_xy = np.abs(grid[:, None] - obs[None, :])
    d_xy = np.minimum(d_xy, dim - d_xy)
    d_yy = np.abs(obs[:, None] - obs[None, :])
    d_yy = np.minimum(d_yy, dim - d_yy)
    return gaspari_cohn(d_xy, radius), gaspari_cohn(d_yy, radius)


def _as_cov(obs_cov, obs_dim: int):
    cov = jnp.asarray(obs_cov, jnp.result_type(float))
    if cov.ndim == 0:
        return cov * jnp.eye(obs_dim)
    if cov.ndim == 1:
        return jnp.diag(cov)
    return cov


def enkf_filter(observations,
                initial,
                transition,
                observation_fn: Callable,
                obs_cov,
                num_members: int,
                key=None,
                method: str = "stochastic",
                inflation: float = 1.0,
                localization: Optional[Any] = None,
                return_ensembles: bool = False) -> dict:
    """Ensemble Kalman filter over a whole observation sequence.

    Args:
        observations: list of `[batch, Do]` arrays or stacked
            `[T, batch, Do]` array.
        initial, transition: standard component callables returning
            distributions (the same objects the SMC engine consumes).
        observation_fn: `x [D] -> [Do]` observation operator h (vmapped
            internally over batch and members). Nonlinear h works - the
            gain uses ensemble covariances of h(x).
        obs_cov: observation noise covariance R - scalar (R = c I),
            `[Do]` diagonal, or full `[Do, Do]`.
        num_members: ensemble size N.
        key: PRNG key (initial draw, forecast noise, and - stochastic
            scheme - observation perturbations).
        method: 'stochastic' | 'etkf' (see module docstring).
        inflation: multiplicative anomaly inflation applied to each
            forecast ensemble (1.0 = off; 1.01-1.1 typical at small N).
        localization: None, or `(loc_xy [D, Do], loc_yy [Do, Do])`
            Schur masks on the cross/observation covariances (build
            with `gaspari_cohn_localization` for cyclic grids).
            'stochastic' only.
        return_ensembles: also stack the per-step analysis ensembles
            `[T, batch, N, D]` (memory: T x B x N x D floats).

    Returns:
        dict with 'filtered_means' `[T, batch, D]`, 'filtered_variances'
        `[T, batch, D]` (ensemble marginals, ddof=1), 'log_likelihood'
        `[batch]` (Gaussian innovation approximation), 'last_ensemble'
        `[batch, N, D]`, and (optionally) 'ensembles'.
    """
    if method not in METHODS:
        raise ValueError(
            f"method must be one of {METHODS}. currently = {method}")
    if method == "etkf" and localization is not None:
        raise ValueError(
            "localization is only supported for method='stochastic' "
            "(the localized transform filter, LETKF, is a different "
            "per-gridpoint algorithm)")
    if num_members < 2:
        raise ValueError(
            f"num_members must be >= 2. currently = {num_members}")
    if key is None:
        key = jax.random.PRNGKey(0)

    stacked = stack_observations(observations)
    obs_leaf = jnp.asarray(jax.tree_util.tree_leaves(stacked)[0])
    if obs_leaf.ndim != 3:
        raise ValueError(
            "enkf_filter expects array observations [T, batch, Do]; got "
            f"shape {obs_leaf.shape}")
    num_timesteps, batch_size, obs_dim = obs_leaf.shape
    n = num_members
    r_cov = _as_cov(obs_cov, obs_dim)
    r_chol = jnp.linalg.cholesky(r_cov)
    h = jax.vmap(jax.vmap(observation_fn))
    if localization is not None:
        loc_xy, loc_yy = (jnp.asarray(localization[0]),
                          jnp.asarray(localization[1]))

    def analysis(ensemble, y, k):
        """One EnKF analysis: ensemble [B, N, D], y [B, Do]."""
        xbar = jnp.mean(ensemble, axis=1, keepdims=True)
        ax = (ensemble - xbar) * inflation
        ensemble = xbar + ax
        yf = h(ensemble)                                  # [B, N, Do]
        ybar = jnp.mean(yf, axis=1, keepdims=True)
        ay = yf - ybar
        pyy = jnp.einsum("bno,bnp->bop", ay, ay) / (n - 1)
        if localization is not None:
            pyy = pyy * loc_yy
        pyy = pyy + r_cov
        # Innovation log-likelihood log N(y; ybar, pyy).
        dy = y - ybar[:, 0]                               # [B, Do]
        chol = jnp.linalg.cholesky(pyy)
        solve = jax.vmap(
            lambda c, v: jax.scipy.linalg.cho_solve((c, True), v))
        quad = jnp.einsum("bo,bo->b", dy, solve(chol, dy))
        logdet = 2.0 * jnp.sum(jnp.log(
            jnp.diagonal(chol, axis1=1, axis2=2)), axis=1)
        step_ll = -0.5 * (logdet + quad +
                          obs_dim * _stdmath.log(2.0 * _stdmath.pi))

        if method == "stochastic":
            pxy = jnp.einsum("bnd,bno->bdo", ax, ay) / (n - 1)
            if localization is not None:
                pxy = pxy * loc_xy
            # K^T = pyy^{-1} pxy^T : [B, Do, D]
            kt = jax.vmap(
                lambda c, m: jax.scipy.linalg.cho_solve((c, True), m))(
                    chol, jnp.swapaxes(pxy, 1, 2))
            eps = jnp.einsum(
                "op,bnp->bno",
                r_chol, jax.random.normal(k, (batch_size, n, obs_dim),
                                          ax.dtype))
            innov = y[:, None, :] + eps - yf              # [B, N, Do]
            ensemble = ensemble + jnp.einsum("bno,bod->bnd", innov, kt)
        else:
            # ETKF (Hunt et al. 2007): analysis in ensemble space.
            # ayr = Ay R^{-1}: [B, N, Do]
            ayr = jnp.swapaxes(jax.vmap(
                lambda m: jax.scipy.linalg.cho_solve(
                    (r_chol, True), jnp.swapaxes(m, 0, 1)))(ay), 1, 2)
            m_mat = ((n - 1) * jnp.eye(n) +
                     jnp.einsum("bno,bmo->bnm", ayr, ay))
            lam, u = jnp.linalg.eigh(m_mat)
            lam = jnp.maximum(lam, 1e-10)
            # w = Pa @ Ay R^{-1} (y - ybar), Pa = M^{-1} (scaled).
            g = jnp.einsum("bno,bo->bn", ayr, dy)
            w = jnp.einsum("bnk,bk,bmk,bm->bn", u, 1.0 / lam, u, g)
            w_mat = jnp.einsum("bnk,bk,bmk->bnm", u,
                               jnp.sqrt((n - 1) / lam), u)
            coeff = w[:, None, :] + w_mat                 # [B, i, j]
            ensemble = xbar + jnp.einsum("bij,bjd->bid", coeff, ax)
        return ensemble, step_ll

    # ---- t = 0: draw from the initial distribution, analyze y_0.
    k_init, k0, key = jax.random.split(key, 3)
    ensemble = state.sample(initial(), batch_size, n, k_init)
    y0 = jax.tree_util.tree_map(lambda x: x[0], stacked)
    ensemble, ll0 = analysis(ensemble, jnp.asarray(y0), k0)

    def step(carry, inputs):
        ensemble, ll, prev_y = carry
        y_t, t, k = inputs
        k_fc, k_an = jax.random.split(k)
        dist = transition(previous_latents=[ensemble], time=TimeIndex(t),
                          previous_observations=[prev_y])
        ensemble = state.sample(dist, batch_size, n, k_fc)
        ensemble, step_ll = analysis(ensemble, y_t, k_an)
        mean = jnp.mean(ensemble, axis=1)
        var = jnp.var(ensemble, axis=1, ddof=1)
        outs = (mean, var, ensemble if return_ensembles else None)
        return (ensemble, ll + step_ll, y_t), outs

    ensemble_0 = ensemble
    mean0 = jnp.mean(ensemble, axis=1)
    var0 = jnp.var(ensemble, axis=1, ddof=1)
    if num_timesteps > 1:
        rest = jax.tree_util.tree_map(lambda x: x[1:], stacked)
        times = jnp.arange(1, num_timesteps, dtype=jnp.int32)
        keys = jax.random.split(key, num_timesteps - 1)
        (ensemble, ll, _), (means, variances, ensembles) = jax.lax.scan(
            step, (ensemble, ll0, jnp.asarray(y0)),
            (jnp.asarray(rest), times, keys))
        means = jnp.concatenate([mean0[None], means], axis=0)
        variances = jnp.concatenate([var0[None], variances], axis=0)
    else:
        ll = ll0
        means, variances = mean0[None], var0[None]
        ensembles = None

    out = {
        "filtered_means": means,
        "filtered_variances": variances,
        "log_likelihood": ll,
        "last_ensemble": ensemble,
    }
    if return_ensembles:
        out["ensembles"] = (
            jnp.concatenate([ensemble_0[None], ensembles], axis=0)
            if ensembles is not None else ensemble_0[None])
    return out
