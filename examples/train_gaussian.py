"""Conjugate-Gaussian autoencoder - parameter-trajectory plots.

Equivalent of /root/reference/test/test_losses.py:11-80: IWAE training of
(prior mean, obs std, proposal mult/bias/std) toward the closed-form
optima, with trajectory plots.

Usage: PYTHONPATH=. python examples/train_gaussian.py [--iters 2000]
"""

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import optax

from aesmc_tpu import train
from aesmc_tpu.models import gaussian


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=2000)
    parser.add_argument("--out", default=None)
    args = parser.parse_args()

    key = jax.random.PRNGKey(0)
    prior_std = 1.0
    true_prior_mean, true_obs_std = 0.0, 1.0
    q_true = gaussian.get_proposal_params(true_prior_mean, prior_std,
                                          true_obs_std)

    dataloader = train.get_synthetic_dataloader(
        gaussian.Prior.create(true_prior_mean, prior_std), None,
        gaussian.Likelihood.create(true_obs_std), 1, 10, key)
    stats = gaussian.TrainingStats(logging_interval=500)
    train.train(dataloader, 2, "iwae",
                gaussian.Prior.create(2.0, prior_std), None,
                gaussian.Likelihood.create(0.5),
                gaussian.InferenceNetwork.create(2.0, 2.0, 2.0),
                num_epochs=1, num_iterations_per_epoch=args.iters,
                optimizer=optax.sgd(0.01), callback=stats, key=key)

    fig, axs = plt.subplots(5, 1, sharex=True, figsize=(10, 8))
    data = [stats.prior_mean_history, stats.obs_std_history,
            stats.q_mult_history, stats.q_bias_history, stats.q_std_history]
    true = [true_prior_mean, true_obs_std, *q_true]
    for ax, series, target, label in zip(
            axs, data, true,
            [r"$\mu_0$", r"$\sigma$", "$a$", "$b$", "$c$"]):
        ax.plot(stats.iteration_idx_history, series)
        ax.axhline(target, color="black")
        ax.set_ylabel(label)
    axs[-1].set_xlabel("Iteration")
    fig.tight_layout()
    out = args.out or pathlib.Path(__file__).parent / "plots" / \
        "gaussian.pdf"
    pathlib.Path(out).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out, bbox_inches="tight")
    print(f"plot saved to {out}")


if __name__ == "__main__":
    main()
