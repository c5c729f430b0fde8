"""LGSSM autoencoder training - IWAE vs AESMC comparison with plots.

The aesmc_tpu equivalent of the reference's flagship integration test
(/root/reference/test/test_losses.py:82-151): train transition/emission
multipliers from wrong initializations under both objectives, track
||theta - theta*|| and held-out posterior-mean L2 against the exact
Kalman smoother, and save comparison plots.

Usage: PYTHONPATH=. python examples/train_lgssm.py [--iters 500]
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
from aesmc_tpu.models import lgssm


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=500)
    parser.add_argument("--timesteps", type=int, default=200)
    parser.add_argument("--batch-size", type=int, default=10)
    parser.add_argument("--particles", type=int, default=100)
    parser.add_argument("--out", default=None)
    args = parser.parse_args()

    key = jax.random.PRNGKey(0)
    initial_loc, initial_scale = 0.0, 1.0
    true_transition_mult, init_transition_mult = 0.9, 0.0
    transition_scale = 1.0
    true_emission_mult, init_emission_mult = 1.0, 0.0
    emission_scale = 0.01
    num_test_obs, test_particles = 10, 1000
    saving_interval = logging_interval = 10

    scale_0, scale_t = lgssm.optimal_proposal_scales(
        initial_scale, transition_scale, true_emission_mult, emission_scale)

    dataloader = train.get_synthetic_dataloader(
        lgssm.Initial(initial_loc, initial_scale),
        lgssm.Transition.create(true_transition_mult, transition_scale),
        lgssm.Emission.create(true_emission_mult, emission_scale),
        args.timesteps, args.batch_size, key)

    fig, axs = plt.subplots(2, 1, sharex=True)
    for algorithm in ("iwae", "aesmc"):
        print(f"=== training with {algorithm} ===")
        stats = lgssm.TrainingStats(
            initial_loc, initial_scale, true_transition_mult,
            transition_scale, true_emission_mult, emission_scale,
            args.timesteps, num_test_obs, test_particles,
            saving_interval, logging_interval, key=key)
        train.train(
            dataloader, args.particles, algorithm,
            lgssm.Initial(initial_loc, initial_scale),
            lgssm.Transition.create(init_transition_mult, transition_scale),
            lgssm.Emission.create(init_emission_mult, emission_scale),
            lgssm.Proposal.create(scale_0, scale_t, key),
            num_epochs=1, num_iterations_per_epoch=args.iters,
            optimizer=optax.adam(1e-2), callback=stats, key=key)
        axs[0].plot(stats.iteration_idx_history, stats.p_l2_history,
                    label=algorithm)
        axs[1].plot(stats.iteration_idx_history, stats.q_l2_history,
                    label=algorithm)

    axs[0].set_ylabel(r"$\|\theta - \theta_{true}\|$")
    axs[1].set_ylabel("Avg. L2 of\nmarginal posterior means")
    axs[1].set_xlabel("Iteration")
    axs[0].legend()
    fig.tight_layout()
    out = args.out or pathlib.Path(__file__).parent / "plots" / "lgssm.pdf"
    pathlib.Path(out).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out, bbox_inches="tight")
    print(f"plot saved to {out}")


if __name__ == "__main__":
    main()
