"""Annealed SMC sampler on a bimodal target + exact evidence check.

Transports a broad Gaussian prior cloud to a well-separated two-mode
mixture with aesmc_tpu.samplers.smc_sampler — the adaptive temperature
ladder is chosen on the fly by ESS bisection. Because the target is
constructed as mixture = p0 * exp(L), the true log-normalizer is 0
exactly; the example also shows both modes populated (where plain MCMC
from one mode would never cross) and the temperature ladder the
sampler chose.

Usage: PYTHONPATH=. python examples/annealed_smc.py
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

from aesmc_tpu import samplers

K = 8192
S0, MU, SM = 3.0, 4.0, 0.4


def main():
    def log_prior(x):
        return (-0.5 * (x[0] / S0) ** 2 -
                jnp.log(S0 * jnp.sqrt(2 * jnp.pi)))

    def log_mix(x):
        a = -0.5 * ((x[0] - MU) / SM) ** 2
        b = -0.5 * ((x[0] + MU) / SM) ** 2
        return (jnp.logaddexp(a, b) - jnp.log(2.0) -
                jnp.log(SM * jnp.sqrt(2 * jnp.pi)))

    log_lik = lambda x: log_mix(x) - log_prior(x)

    x0 = S0 * jax.random.normal(jax.random.PRNGKey(0), (K, 1))
    out = samplers.smc_sampler(
        log_prior, log_lik, x0, key=jax.random.PRNGKey(1),
        num_moves=5, step_size=0.5, return_history=True)

    xs = np.asarray(out["particles"])[:, 0]
    lz = float(out["log_normalizer"])
    right = float((xs > 0).mean())
    bh = np.asarray(out["beta_history"])
    bh = bh[np.isfinite(bh)]
    print(f"log Z = {lz:+.4f} (exact 0), mode split "
          f"{1 - right:.2f}/{right:.2f} (exact 0.50/0.50)")
    print(f"adaptive ladder ({len(bh)} rungs):", np.round(bh, 3))
    print(f"mean RWM acceptance {float(out['acceptance_rate']):.2f}")
    assert abs(lz) < 0.1 and 0.4 < right < 0.6

    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(10, 4))
    grid = np.linspace(-8, 8, 400)
    target = 0.5 * (
        np.exp(-0.5 * ((grid - MU) / SM) ** 2) +
        np.exp(-0.5 * ((grid + MU) / SM) ** 2)) / (
            SM * np.sqrt(2 * np.pi))
    ax1.hist(np.asarray(x0)[:, 0], bins=80, density=True, alpha=0.3,
             color="C7", label="prior cloud")
    ax1.hist(xs, bins=80, density=True, alpha=0.6, color="C0",
             label="annealed cloud")
    ax1.plot(grid, target, "k", lw=1.5, label="exact target")
    ax1.set_title(f"Annealed SMC, K={K}: log Z = {lz:+.3f} (exact 0)")
    ax1.legend(fontsize=8)
    ax2.plot(np.arange(1, len(bh) + 1), bh, "o-")
    ax2.set_xlabel("rung")
    ax2.set_ylabel("beta")
    ax2.set_title("ESS-bisected adaptive temperature ladder")
    outdir = pathlib.Path(__file__).parent / "plots"
    outdir.mkdir(exist_ok=True)
    fig.tight_layout()
    fig.savefig(outdir / "annealed_smc.png", dpi=120)
    print(f"wrote {outdir / 'annealed_smc.png'}")


if __name__ == "__main__":
    main()
