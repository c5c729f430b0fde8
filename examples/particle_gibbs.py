"""Particle Gibbs posterior sampling vs the exact RTS smoother.

Runs a PGAS chain (aesmc_tpu.csmc) on an LGSSM, compares the chain's
smoothed posterior mean/std against the exact Kalman/RTS smoother, and
plots both plus the chain's per-sweep conditional log-Z trace. The whole
chain is ONE lax.scan of jitted cSMC sweeps.

Usage: PYTHONPATH=. python examples/particle_gibbs.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from aesmc_tpu import csmc, statistics
from aesmc_tpu.models import kalman, lgssm

T, B, K = 40, 1, 64
NUM_SWEEPS, BURN_IN = 400, 100
EMISSION_SCALE = 0.4


def main():
    key = jax.random.PRNGKey(0)
    initial = lgssm.Initial(0.0, 1.0)
    transition = lgssm.Transition.create(0.9, 1.0)
    emission = lgssm.Emission.create(1.0, EMISSION_SCALE)
    proposal = lgssm.Proposal.create(1.0, 1.0, key)
    latents, obs = statistics.sample_from_prior(
        initial, transition, emission, T, B, key)

    trajectories, lmls = csmc.particle_gibbs(
        obs, initial, transition, emission, proposal,
        num_particles=K, num_iterations=NUM_SWEEPS,
        key=jax.random.PRNGKey(1), ancestor_sampling=True)
    keep = np.asarray(trajectories)[BURN_IN:, :, 0]          # [S, T]
    pg_mean, pg_std = keep.mean(axis=0), keep.std(axis=0)

    params = kalman.KalmanParams(0.0, 1.0, 0.9, 0.0, 1.0, 1.0, 0.0,
                                 EMISSION_SCALE ** 2)
    exact_mean, exact_var = kalman.kalman_smoother(
        np.asarray(obs)[:, 0], params)
    exact_std = np.sqrt(exact_var)

    mean_rmse = float(np.sqrt(np.mean((pg_mean - exact_mean) ** 2)))
    std_dev = float(np.max(np.abs(pg_std - exact_std)))
    print(f"PGAS ({NUM_SWEEPS} sweeps, K={K}): smoothed-mean RMSE vs "
          f"RTS = {mean_rmse:.4f}, max |std dev| = {std_dev:.4f}")

    fig, (ax1, ax2) = plt.subplots(2, 1, figsize=(9, 7),
                                   height_ratios=[2, 1])
    t = np.arange(T)
    ax1.plot(t, np.asarray(latents)[:, 0], "k.", ms=4, label="true x")
    ax1.plot(t, exact_mean, "C0-", label="RTS smoother")
    ax1.fill_between(t, exact_mean - exact_std, exact_mean + exact_std,
                     color="C0", alpha=0.2)
    ax1.plot(t, pg_mean, "C1--", label=f"PGAS mean ({NUM_SWEEPS} sweeps)")
    ax1.fill_between(t, pg_mean - pg_std, pg_mean + pg_std, color="C1",
                     alpha=0.2)
    ax1.legend()
    ax1.set_title(f"Particle Gibbs (ancestor sampling) vs exact RTS "
                  f"smoother - mean RMSE {mean_rmse:.3f}")
    ax2.plot(np.asarray(lmls)[:, 0])
    ax2.set_xlabel("sweep")
    ax2.set_ylabel("conditional log-Z")
    out = pathlib.Path(__file__).parent / "plots"
    out.mkdir(exist_ok=True)
    fig.tight_layout()
    fig.savefig(out / "particle_gibbs.png", dpi=120)
    print(f"wrote {out / 'particle_gibbs.png'}")


if __name__ == "__main__":
    main()
