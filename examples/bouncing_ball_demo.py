"""Bouncing-ball deep SSM (BASELINE config 4): train the amortized MLP
proposal + decoder on 64-step synthetic 1-D "video" sequences, then show
ground-truth frames vs the SMC posterior-mean reconstruction.

Usage: PYTHONPATH=. python examples/bouncing_ball_demo.py [--iters 150]
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

from aesmc_tpu import inference, statistics, train
from aesmc_tpu.models import bouncing_ball


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=150)
    parser.add_argument("--timesteps", type=int, default=64)
    parser.add_argument("--pixels", type=int, default=32)
    args = parser.parse_args()

    key = jax.random.PRNGKey(0)
    comps = bouncing_ball.make_model(key, num_pixels=args.pixels, hidden=64)
    dataloader = train.get_synthetic_dataloader(
        comps[0], comps[1], comps[2], args.timesteps, 16, key)

    losses_seen = []
    trained = train.train(
        dataloader, 32, "aesmc", *comps, num_epochs=1,
        num_iterations_per_epoch=args.iters, optimizer=optax.adam(3e-3),
        callback=lambda e, i, loss, *c: losses_seen.append(float(loss)),
        key=key)
    print(f"loss: {np.mean(losses_seen[:10]):.1f} -> "
          f"{np.mean(losses_seen[-10:]):.1f}")

    # Held-out reconstruction: SMC posterior-mean position -> frames.
    latents, obs = statistics.sample_from_prior(
        comps[0], comps[1], comps[2], args.timesteps, 1,
        jax.random.PRNGKey(42))
    result = inference.infer("smc", obs, *trained, num_particles=512,
                             key=jax.random.PRNGKey(7))
    post_pos = np.array([
        np.asarray(jnp.sum(
            jax.nn.softmax(result["log_weight"], axis=1)[:, :, None] *
            result["latents"][t], axis=1))[0, 0]
        for t in range(args.timesteps)])
    recon = np.asarray(bouncing_ball.render(jnp.asarray(post_pos),
                                            args.pixels))

    fig, axs = plt.subplots(3, 1, figsize=(10, 7), sharex=True)
    axs[0].imshow(np.asarray(obs)[:, 0].T, aspect="auto", origin="lower")
    axs[0].set_ylabel("observed frames")
    axs[1].imshow(recon.T, aspect="auto", origin="lower")
    axs[1].set_ylabel("posterior-mean recon")
    axs[2].plot(np.asarray(latents)[:, 0, 0], label="true position")
    axs[2].plot(post_pos, ":", label="SMC posterior mean")
    axs[2].legend()
    axs[2].set_xlabel("time")
    rmse = float(np.sqrt(np.mean(
        (post_pos - np.asarray(latents)[:, 0, 0]) ** 2)))
    axs[2].set_title(f"position RMSE = {rmse:.3f}")
    fig.tight_layout()
    out = pathlib.Path(__file__).parent / "plots" / "bouncing_ball.pdf"
    out.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out, bbox_inches="tight")
    print(f"position RMSE {rmse:.3f}; plot saved to {out}")


if __name__ == "__main__":
    main()
