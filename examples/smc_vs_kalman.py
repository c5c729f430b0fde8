"""SMC / IS posterior inference vs the exact Kalman smoother - the
reference's signature demonstration (/root/reference/test/
test_inference.py:147-375): fit an LGSSM to a noisy sine via EM, run
IS and SMC with 1000 particles, and plot smoothed means +- 1 std against
the exact smoother.

Usage: PYTHONPATH=. python examples/smc_vs_kalman.py
"""

import pathlib
import sys
import warnings

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from aesmc_tpu import distributions as dists
from aesmc_tpu import inference, statistics
from aesmc_tpu.models import kalman


def main():
    rng = np.random.RandomState(0)
    num_timesteps, num_particles = 100, 1000
    x = np.linspace(0, 3 * np.pi, num_timesteps)
    observations = 40 * (np.sin(x) + 0.2 * rng.randn(num_timesteps))

    fitted = kalman.kalman_em(
        observations,
        kalman.KalmanParams(0.0, 1.0, 1.0, 0.0, 0.01, 1.0, 0.0, 1.0),
        num_iterations=10)
    km, kv = kalman.kalman_smoother(observations, fitted)

    initial = lambda: dists.Normal(fitted.initial_mean,
                                   np.sqrt(fitted.initial_variance))

    def transition(previous_latents=None, time=None,
                   previous_observations=None):
        return dists.Normal(
            previous_latents[-1] * fitted.transition_mult +
            fitted.transition_offset, np.sqrt(fitted.transition_variance))

    def emission(latents=None, time=None, previous_observations=None):
        return dists.Normal(
            latents[-1] * fitted.emission_mult + fitted.emission_offset,
            np.sqrt(fitted.emission_variance))

    def proposal(previous_latents=None, time=None, observations=None):
        if time == 0:
            return initial()
        return transition(previous_latents=previous_latents)

    obs = jnp.asarray(observations, dtype=jnp.float32)[:, None]
    fig, axs = plt.subplots(1, 3, figsize=(20, 5), sharey=True)
    for ax, algorithm in zip(axs, ("is", "smc")):
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)
            result = inference.infer(
                algorithm, obs, initial, transition, emission, proposal,
                num_particles, key=jax.random.PRNGKey(1))
        means = np.array([float(statistics.empirical_mean(
            result["latents"][t], result["log_weight"])[0])
            for t in range(num_timesteps)])
        stds = np.sqrt(np.array([float(statistics.empirical_variance(
            result["latents"][t], result["log_weight"])[0])
            for t in range(num_timesteps)]))
        rmse = np.sqrt(np.mean((km - means) ** 2))
        ax.plot(x, observations, color="black", lw=1, label="observations")
        ax.plot(x, km, lw=1, label="kalman")
        ax.fill_between(x, km - np.sqrt(kv), km + np.sqrt(kv), alpha=0.2)
        ax.plot(x, means, ":", lw=1.5, label=algorithm)
        ax.fill_between(x, means - stds, means + stds, alpha=0.2)
        ax.set_title(f"{algorithm.upper()} ({num_particles} particles), "
                     f"RMSE vs Kalman = {rmse:.2f}")
        ax.legend()
        print(f"{algorithm}: smoothed-mean RMSE vs exact Kalman = "
              f"{rmse:.3f}")
    # ---- FFBS joint smoothing (aesmc_tpu.smoothing, beyond parity):
    # backward-simulated trajectories instead of lineage tracing.
    from aesmc_tpu import smoothing
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        filt = inference.infer(
            "smc", obs, initial, transition, emission, proposal,
            num_particles, key=jax.random.PRNGKey(1),
            return_original_latents=True, return_log_weights=True,
            return_latents=False, return_log_weight=False)
    traj = smoothing.backward_simulation(
        filt["original_latents"], filt["log_weights"], transition, 256,
        jax.random.PRNGKey(7), observations=obs)
    fmeans = np.asarray(jnp.mean(traj[:, 0], axis=-1))
    fstds = np.asarray(jnp.std(traj[:, 0], axis=-1))
    frmse = np.sqrt(np.mean((km - fmeans) ** 2))
    ax = axs[2]
    ax.plot(x, observations, color="black", lw=1, label="observations")
    ax.plot(x, km, lw=1, label="kalman (RTS)")
    ax.fill_between(x, km - np.sqrt(kv), km + np.sqrt(kv), alpha=0.2)
    ax.plot(x, fmeans, ":", lw=1.5, label="ffbs")
    ax.fill_between(x, fmeans - fstds, fmeans + fstds, alpha=0.2)
    ax.set_title(f"FFBS (256 trajectories), RMSE vs RTS = {frmse:.2f}")
    ax.legend()
    print(f"ffbs: smoothing-mean RMSE vs exact RTS = {frmse:.3f}")

    out = pathlib.Path(__file__).parent / "plots" / "smc_vs_kalman.pdf"
    out.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out, bbox_inches="tight")
    print(f"plot saved to {out}")


if __name__ == "__main__":
    main()
