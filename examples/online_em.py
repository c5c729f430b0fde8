"""Online EM via PaRIS smoothed sufficient statistics.

Expectation-Maximization for the LGSSM's transition and emission
multipliers, where the E-step is `aesmc_tpu.smoothing.paris` computing
ALL FOUR smoothed sufficient statistics in one forward-only pass
(nothing stored per timestep - this is the O(1)-memory estimator that
scales to unbounded T):

    S1 = E[ sum_t x_{t-1} x_t | y ]      S2 = E[ sum_t x_{t-1}^2 | y ]
    S3 = E[ sum_t x_t y_t     | y ]      S4 = E[ sum_t x_t^2     | y ]

M-step (exact for the linear-Gaussian model):
    a_hat = S1 / S2        c_hat = S3 / S4

Validation: the same EM recursion is run with an EXACT E-step (RTS
smoother moments + lag-one cross-covariances from the RTS gain) - the
PaRIS-EM iterates track the exact-EM iterates to ~1e-2 at every sweep
(joint (a, c) EM itself converges slowly in c on this model; matching
the exact trajectory, not the asymptote, is the E-step's correctness
criterion). Plots both trajectories to examples/plots/online_em.png.

Usage: PYTHONPATH=. python examples/online_em.py
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

from aesmc_tpu import smoothing, statistics
from aesmc_tpu.models import lgssm

T, B, K = 100, 4, 512
TRUE_A, TRUE_C = 0.9, 1.3
Q, R = 1.0, 0.25          # transition/emission variances (known)
NUM_EM_ITERS = 12


def components(a, c):
    initial = lgssm.Initial(0.0, 1.0)
    transition = lgssm.Transition(mult=a, scale=float(np.sqrt(Q)))
    emission = lgssm.Emission(mult=c, scale=float(np.sqrt(R)))
    # Locally optimal proposal for the CURRENT parameter iterate.
    prec_t = 1.0 / Q + c ** 2 / R
    prec_0 = 1.0 + c ** 2 / R
    proposal = lgssm.Proposal(
        lin_0_weight=(c / R) / prec_0, lin_0_bias=jnp.asarray(0.0),
        lin_t_weight=jnp.stack([(a / Q) / prec_t, (c / R) / prec_t]),
        lin_t_bias=jnp.asarray(0.0),
        scale_0=float(np.sqrt(1.0 / (1.0 + TRUE_C ** 2 / R))),
        scale_t=float(np.sqrt(1.0 / (1.0 / Q + TRUE_C ** 2 / R))))
    return initial, transition, emission, proposal


def exact_e_step(a, c, obs_np):
    """Oracle E-step: the same four sufficient statistics from the RTS
    smoother (lag-one cross-moments via the RTS gain J_t)."""
    from aesmc_tpu.models import kalman

    s = np.zeros(4)
    for b in range(obs_np.shape[1]):
        p = kalman.KalmanParams(0.0, 1.0, a, 0.0, Q, c, 0.0, R)
        fv = kalman.kalman_filter(obs_np[:, b], p)[1]
        sm, sv = kalman.kalman_smoother(obs_np[:, b], p)
        ppred = a * a * fv[:-1] + Q
        j = a * fv[:-1] / ppred
        cross = j * sv[1:] + sm[:-1] * sm[1:]
        ex2 = sv + sm * sm
        s += [cross.sum(), ex2[:-1].sum(),
              (sm * obs_np[:, b]).sum(), ex2.sum()]
    return s


def main():
    key = jax.random.PRNGKey(0)
    data_key, em_key = jax.random.split(key)
    _, obs = statistics.sample_from_prior(
        *components(jnp.asarray(TRUE_A), jnp.asarray(TRUE_C))[:3], T, B,
        key=data_key)
    obs_arr = jnp.asarray(obs)                              # [T, B]
    obs_np = np.asarray(obs, np.float64)

    @jax.jit
    def e_step(a, c, key):
        comps = components(a, c)

        def h(xp, xc, time):
            y_t = obs_arr[jnp.asarray(time)][:, None]       # [B, 1]
            return jnp.stack([xp * xc, xp * xp, xc * y_t, xc * xc],
                             axis=-1)

        def h0(x0):
            y_0 = obs_arr[0][:, None]
            return jnp.stack([jnp.zeros_like(x0), jnp.zeros_like(x0),
                              x0 * y_0, x0 * x0], axis=-1)

        out = smoothing.paris(obs_arr, *comps, K, h=h, h0=h0, key=key)
        s = jnp.sum(out["smoothed"], axis=0)                # pool batch
        return s, out["log_marginal_likelihood"].sum()

    a = jnp.asarray(0.3)
    c = jnp.asarray(0.5)
    a_ex, c_ex = 0.3, 0.5
    history, history_ex = [(0.3, 0.5)], [(0.3, 0.5)]
    print(f"truth: a={TRUE_A}, c={TRUE_C};  init: a=0.3, c=0.5")
    for it in range(NUM_EM_ITERS):
        em_key, sub = jax.random.split(em_key)
        s, lml = e_step(a, c, sub)
        a = s[0] / s[1]                                     # M-step
        c = s[2] / s[3]
        se = exact_e_step(a_ex, c_ex, obs_np)
        a_ex, c_ex = se[0] / se[1], se[2] / se[3]
        history.append((float(a), float(c)))
        history_ex.append((a_ex, c_ex))
        print(f"EM iter {it + 1:2d}: PaRIS a={float(a):.4f} "
              f"c={float(c):.4f} | exact a={a_ex:.4f} c={c_ex:.4f} | "
              f"log-Z={float(lml):.2f}")

    hist = np.asarray(history)
    hist_ex = np.asarray(history_ex)
    dev = np.abs(hist - hist_ex).max(0)
    print(f"max |PaRIS-EM - exact-EM| over iterates: "
          f"a {dev[0]:.4f}, c {dev[1]:.4f}")
    assert dev[0] < 0.03 and dev[1] < 0.06, \
        "PaRIS E-step diverged from the exact E-step trajectory"
    assert abs(float(a) - TRUE_A) < 0.05, "a far from truth"
    plot_dir = pathlib.Path(__file__).resolve().parent / "plots"
    plot_dir.mkdir(exist_ok=True)
    fig, ax = plt.subplots(figsize=(7, 4))
    ax.plot(hist[:, 0], label="a (PaRIS E-step)")
    ax.plot(hist[:, 1], label="c (PaRIS E-step)")
    ax.plot(hist_ex[:, 0], ls=":", color="C0", label="a (exact E-step)")
    ax.plot(hist_ex[:, 1], ls=":", color="C1", label="c (exact E-step)")
    ax.axhline(TRUE_A, ls="--", color="C0", alpha=0.4)
    ax.axhline(TRUE_C, ls="--", color="C1", alpha=0.4)
    ax.set_xlabel("EM iteration")
    ax.set_ylabel("parameter value")
    ax.set_title("Online EM via PaRIS sufficient statistics (LGSSM)")
    ax.legend()
    fig.tight_layout()
    fig.savefig(plot_dir / "online_em.png", dpi=120)
    print(f"plot: {plot_dir / 'online_em.png'}")


if __name__ == "__main__":
    main()
