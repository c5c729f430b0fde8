"""Stochastic-volatility model learning - IWAE vs AESMC comparison
(BASELINE config 3): learn (mu, phi, sigma, beta) of the nonlinear SV
model from synthetic returns under both objectives and both
systematic/stratified resampling, and plot parameter recovery.

Usage: PYTHONPATH=. python examples/train_stochastic_volatility.py
"""

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
import optax

from aesmc_tpu import train
from aesmc_tpu.models import stochastic_volatility as sv


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=300)
    parser.add_argument("--timesteps", type=int, default=100)
    parser.add_argument("--batch-size", type=int, default=16)
    parser.add_argument("--particles", type=int, default=100)
    args = parser.parse_args()

    key = jax.random.PRNGKey(0)
    true = dict(mu=-0.8, phi=0.95, sigma=0.25, beta=0.6)
    gen = sv.make_model(**true)
    dataloader = train.get_synthetic_dataloader(
        gen[0], gen[1], gen[2], args.timesteps, args.batch_size, key)

    histories = {}
    for algorithm, method in [("iwae", "systematic"),
                              ("aesmc", "systematic"),
                              ("aesmc", "stratified")]:
        label = f"{algorithm}/{method}"
        print(f"=== {label} ===")
        comps = sv.make_model(mu=0.0, phi=0.8, sigma=0.5, beta=1.0)
        hist = {"mu": [], "phi": [], "sigma": [], "beta": []}

        def cb(e, i, loss, initial, transition, emission, proposal,
               hist=hist):
            hist["mu"].append(float(transition.mu))
            hist["phi"].append(float(jnp.tanh(transition.raw_phi)))
            hist["sigma"].append(float(jnp.exp(transition.log_sigma)))
            hist["beta"].append(float(jnp.exp(emission.log_beta)))

        train.train(dataloader, args.particles, algorithm, *comps,
                    num_epochs=1, num_iterations_per_epoch=args.iters,
                    optimizer=optax.adam(2e-2), callback=cb, key=key,
                    resampling_method=method)
        histories[label] = hist
        print({k: round(v[-1], 3) for k, v in hist.items()},
              "(true:", {k: v for k, v in true.items()}, ")")

    fig, axs = plt.subplots(4, 1, sharex=True, figsize=(9, 9))
    for ax, param in zip(axs, ["mu", "phi", "sigma", "beta"]):
        for label, hist in histories.items():
            ax.plot(hist[param], label=label)
        ax.axhline(true[param], color="black", lw=1)
        ax.set_ylabel(param)
    axs[-1].set_xlabel("iteration")
    axs[0].legend()
    fig.tight_layout()
    out = pathlib.Path(__file__).parent / "plots" / \
        "stochastic_volatility.pdf"
    out.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out, bbox_inches="tight")
    print(f"plot saved to {out}")


if __name__ == "__main__":
    main()
