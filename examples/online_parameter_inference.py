"""SMC^2 online parameter posteriors vs the exact Kalman-grid answer.

Runs SMC^2 (aesmc_tpu.smc2) on an LGSSM with unknown transition
multiplier: M theta-particles, each carrying an inner K-particle state
filter, tracked ONLINE as observations arrive. The final weighted
cloud is compared against the exact parameter posterior computed by
quadrature over the Kalman likelihood, and the evolving posterior
quantiles are plotted over time together with the theta-ESS path and
rejuvenation events.

Usage: PYTHONPATH=. python examples/online_parameter_inference.py
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

from aesmc_tpu import smc2, statistics
from aesmc_tpu.models import kalman, lgssm

T, B = 40, 1
M, K = 512, 64                 # theta particles / inner state particles
TRUE_MULT, EMISSION_SCALE = 0.8, 0.5


def main():
    key = jax.random.PRNGKey(0)
    initial = lgssm.Initial(0.0, 1.0)
    emission = lgssm.Emission.create(1.0, EMISSION_SCALE)
    sig = float(np.sqrt(1.0 / (1.0 + 1.0 / EMISSION_SCALE ** 2)))
    proposal = lgssm.Proposal(
        lin_0_weight=jnp.asarray(0.8), lin_0_bias=jnp.asarray(0.0),
        lin_t_weight=jnp.asarray([0.2 * TRUE_MULT, 0.8]),
        lin_t_bias=jnp.asarray(0.0), scale_0=sig, scale_t=sig)
    _, obs = statistics.sample_from_prior(
        initial, lgssm.Transition.create(TRUE_MULT, 1.0), emission,
        T, B, jax.random.PRNGKey(11))

    def build(theta):
        return (initial, lgssm.Transition(mult=theta["mult"], scale=1.0),
                emission, proposal)

    out = smc2.smc2(
        obs, build,
        {"mult": jax.random.normal(jax.random.PRNGKey(3), (M,))},
        lambda th: -0.5 * th["mult"] ** 2,       # N(0, 1) prior
        num_particles=K, key=jax.random.PRNGKey(7),
        ess_threshold=0.5, num_moves=2, step_size=0.2,
        return_history=True)

    # Exact posterior by Kalman-likelihood quadrature.
    grid = np.linspace(-0.5, 1.5, 401)
    obs_np = np.asarray(obs)[:, 0]
    log_post = np.array([
        kalman.kalman_filter(obs_np, kalman.KalmanParams(
            0.0, 1.0, float(m), 0.0, 1.0, 1.0, 0.0,
            EMISSION_SCALE ** 2))[4] - 0.5 * m ** 2
        for m in grid])
    w = np.exp(log_post - log_post.max())
    w /= w.sum()
    exact_mean = float((grid * w).sum())
    exact_std = float(np.sqrt(((grid - exact_mean) ** 2 * w).sum()))

    # Per-time weighted quantiles of the theta cloud.
    th_h = np.asarray(out["theta_history"]["mult"])          # [T, M]
    lw_h = np.asarray(out["log_theta_weight_history"])       # [T, M]
    qs = np.zeros((T, 3))
    for t in range(T):
        ww = np.exp(lw_h[t] - lw_h[t].max())
        ww /= ww.sum()
        order = np.argsort(th_h[t])
        cdf = np.cumsum(ww[order])
        qs[t] = np.interp([0.1, 0.5, 0.9], cdf, th_h[t][order])

    final_w = np.exp(lw_h[-1] - lw_h[-1].max())
    final_w /= final_w.sum()
    smc2_mean = float((th_h[-1] * final_w).sum())
    print(f"SMC^2 posterior mean {smc2_mean:.4f} "
          f"(exact {exact_mean:.4f} +- {exact_std:.4f})")
    print(f"rejuvenations: {int(out['num_rejuvenations'])}, "
          f"PMMH acceptance {float(out['acceptance_rate']):.2f}")
    print(f"log evidence {float(out['log_evidence']):.3f}")
    assert abs(smc2_mean - exact_mean) < 3 * exact_std

    fig, (ax1, ax2) = plt.subplots(2, 1, figsize=(9, 7), sharex=True)
    t = np.arange(T)
    ax1.plot(t, qs[:, 1], "C0", label="SMC$^2$ posterior median")
    ax1.fill_between(t, qs[:, 0], qs[:, 2], color="C0", alpha=0.25,
                     label="10-90% online posterior")
    ax1.axhline(TRUE_MULT, color="k", ls=":", label="true mult")
    ax1.axhspan(exact_mean - exact_std, exact_mean + exact_std,
                color="C1", alpha=0.2,
                label="exact final posterior $\\pm\\sigma$")
    ax1.set_ylabel("transition mult")
    ax1.legend(loc="upper right", fontsize=8)
    ax1.set_title(f"SMC$^2$: online p(theta | y_{{0:t}}), M={M}, "
                  f"inner K={K}")
    ess = np.asarray(out["ess_path"])
    ax2.plot(t, ess, "C2")
    ax2.axhline(0.5 * M, color="r", ls="--",
                label="rejuvenation threshold")
    ax2.set_xlabel("time step")
    ax2.set_ylabel("theta ESS")
    ax2.legend(fontsize=8)
    outdir = pathlib.Path(__file__).parent / "plots"
    outdir.mkdir(exist_ok=True)
    fig.tight_layout()
    fig.savefig(outdir / "online_parameter_inference.png", dpi=120)
    print(f"wrote {outdir / 'online_parameter_inference.png'}")


if __name__ == "__main__":
    main()
