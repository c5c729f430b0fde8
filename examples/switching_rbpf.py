"""Rao-Blackwellized PF on a 2-regime switching LGSSM.

Tracks a latent regime (discrete Markov chain) while EXACTLY
marginalizing the conditionally linear-Gaussian state per particle
(aesmc_tpu.rbpf): each particle carries Kalman moments, weights are
exact predictive likelihoods. Plots the filtered regime probability
against the true regime path and the Rao-Blackwellized state estimate
against the truth.

Usage: PYTHONPATH=. python examples/switching_rbpf.py
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

from aesmc_tpu import distributions, rbpf

T, K = 60, 2048
PI0 = np.array([0.5, 0.5])
PMAT = np.array([[0.95, 0.05], [0.05, 0.95]])   # sticky regimes
A_R = np.array([0.98, 0.2])                     # slow / fast decay
QVAR, RVAR = 0.01, 0.04


def simulate(key_seed=0):
    rng = np.random.default_rng(key_seed)
    u = rng.choice(2, p=PI0)
    x = 2.5
    us, xs, ys = [], [], []
    for t in range(T):
        if t > 0:
            u = rng.choice(2, p=PMAT[u])
            x = A_R[u] * x + np.sqrt(QVAR) * rng.normal()
        us.append(u)
        xs.append(x)
        ys.append(x + np.sqrt(RVAR) * rng.normal())
    return np.array(us), np.array(xs), np.array(ys)


def main():
    true_u, true_x, ys = simulate()
    obs = jnp.asarray(ys)[:, None, None]        # [T, B=1, Do=1]

    pi0 = jnp.log(jnp.asarray(PI0))
    pl = jnp.log(jnp.asarray(PMAT))
    a_r = jnp.asarray(A_R)
    out = rbpf.rbpf(
        obs,
        initial=lambda: distributions.Categorical(logits=pi0),
        transition=lambda previous_latents, time:
            distributions.Categorical(logits=pl[previous_latents[0]]),
        linear_initial=lambda u0: (jnp.zeros(u0.shape + (1,)),
                                   jnp.full(u0.shape + (1, 1), 4.0)),
        linear_dynamics=lambda u, time: (
            a_r[u][..., None, None], jnp.zeros(1),
            jnp.full((1, 1), QVAR)),
        linear_emission=lambda u, time: (
            jnp.eye(1), jnp.zeros(1), jnp.full((1, 1), RVAR)),
        num_particles=K, key=jax.random.PRNGKey(1),
        return_history=True)

    w = np.asarray(jax.nn.softmax(out["log_weights_history"], axis=2))
    u_h = np.asarray(out["nonlinear_latents_history"])
    p1 = (w * u_h).sum(axis=2)[:, 0]            # P(u_t = 1 | y_{0:t})
    x_est = np.asarray(out["filtered_means"])[:, 0, 0]

    regime_acc = float(((p1 > 0.5) == true_u).mean())
    x_rmse = float(np.sqrt(np.mean((x_est - true_x) ** 2)))
    print(f"filtered regime accuracy {regime_acc:.2f}, "
          f"state RMSE {x_rmse:.3f}")
    print(f"log evidence {float(out['log_marginal_likelihood'][0]):.2f}")
    assert regime_acc > 0.7

    fig, (ax1, ax2) = plt.subplots(2, 1, figsize=(9, 6), sharex=True)
    t = np.arange(T)
    ax1.step(t, true_u, "k:", where="mid", label="true regime")
    ax1.plot(t, p1, "C0", label="RBPF P(fast regime | y)")
    ax1.set_ylabel("regime")
    ax1.legend(fontsize=8)
    ax1.set_title(f"Rao-Blackwellized PF, K={K}: regime tracking with "
                  f"exact state marginalization")
    ax2.plot(t, true_x, "k:", label="true state")
    ax2.plot(t, ys, "C3.", ms=3, label="observations")
    ax2.plot(t, x_est, "C0", label="RB posterior mean E[x|y]")
    ax2.set_xlabel("time step")
    ax2.set_ylabel("state")
    ax2.legend(fontsize=8)
    outdir = pathlib.Path(__file__).parent / "plots"
    outdir.mkdir(exist_ok=True)
    fig.tight_layout()
    fig.savefig(outdir / "switching_rbpf.png", dpi=120)
    print(f"wrote {outdir / 'switching_rbpf.png'}")


if __name__ == "__main__":
    main()
