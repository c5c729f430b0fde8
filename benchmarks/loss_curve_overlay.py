"""500-iteration AESMC training loss-curve overlay: aesmc_tpu vs the
reference PyTorch implementation on IDENTICAL data.

The north star requires "loss curves matching the reference"
(BASELINE.md). The golden harness (golden_parity.py) proves per-call
estimator equality under matched noise; this artifact shows the
*training trajectories* coincide statistically: both frameworks train
the same scalar LGSSM (trainable transition/emission multipliers, fixed
near-optimal proposal - so the parameterizations are identical) with
Adam on the SAME pre-drawn observation sequence per iteration, at the
reference training configuration (T=200, B=10, K=100, aesmc,
/root/reference/test/test_losses.py:93-100).

Inference noise is drawn independently per framework (matching it
through 500 optimizer steps would require re-extracting noise per step
as parameters diverge), so curves agree up to Monte-Carlo jitter; the
artifact records both curves, their smoothed gap, and the learned
parameters.

Outputs: benchmarks/artifacts/loss_overlay.json (+ .png when matplotlib
is available). Run: PYTHONPATH=/root/repo python
benchmarks/loss_curve_overlay.py [--iters N]
"""

import argparse
import json
import pathlib
import sys
import time

import numpy as np

REFERENCE = "/root/reference"
OUT_DIR = pathlib.Path(__file__).resolve().parent / "artifacts"

T, B, K = 200, 10, 100
TRUE_TRANS, TRUE_EMIT = 0.9, 1.0
TRANS_SCALE, EMIT_SCALE = 1.0, 0.2
INIT_TRANS, INIT_EMIT = 0.4, 0.6
# Fixed proposal (shared constants; not trained in either framework).
A0, B0, S0 = 0.5, 0.0, 1.0
AP, AO, BT, ST = 0.6, 0.4, 0.0, 0.8
LR = 0.01


def make_dataset(num_iters, seed=0):
    """[num_iters, T, B] observations from the true LGSSM (numpy f64)."""
    rng = np.random.RandomState(seed)
    x = rng.randn(num_iters, B)
    obs = np.empty((num_iters, T, B))
    obs[:, 0] = TRUE_EMIT * x + EMIT_SCALE * rng.randn(num_iters, B)
    for t in range(1, T):
        x = TRUE_TRANS * x + TRANS_SCALE * rng.randn(num_iters, B)
        obs[:, t] = TRUE_EMIT * x + EMIT_SCALE * rng.randn(num_iters, B)
    return obs.astype(np.float32)


def run_jax(dataset):
    import jax
    import jax.numpy as jnp
    import optax

    from aesmc_tpu import losses
    from aesmc_tpu import distributions as dists
    from aesmc_tpu.models import lgssm
    from aesmc_tpu.state import BatchShapeMode

    class Proposal:
        def __call__(self, previous_latents=None, time=None,
                     observations=None):
            if time == 0:
                return dists.Normal(
                    A0 * observations[0] + B0, S0,
                    batch_shape_mode=BatchShapeMode.BATCH_EXPANDED)
            return dists.Normal(
                AP * previous_latents[-1] +
                AO * observations[time][:, None] + BT, ST,
                batch_shape_mode=BatchShapeMode.FULLY_EXPANDED)

    initial = lgssm.Initial(0.0, 1.0)
    transition = lgssm.Transition.create(INIT_TRANS, TRANS_SCALE)
    emission = lgssm.Emission.create(INIT_EMIT, EMIT_SCALE)
    params = (transition, emission)
    optimizer = optax.adam(LR)
    opt_state = optimizer.init(params)

    def loss_fn(params, obs, key):
        transition, emission = params
        return losses.get_loss(obs, K, "aesmc", initial, transition,
                               emission, Proposal(), key=key)

    @jax.jit
    def step(params, opt_state, obs, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, obs, key)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.PRNGKey(0)
    curve = []
    t0 = time.perf_counter()
    for i in range(dataset.shape[0]):
        key, sub = jax.random.split(key)
        obs = jnp.asarray(dataset[i])                       # [T, B]
        params, opt_state, loss = step(params, opt_state, obs, sub)
        curve.append(float(loss))
    dt = time.perf_counter() - t0
    transition, emission = params
    return curve, {"transition_mult": float(transition.mult),
                   "emission_mult": float(emission.mult),
                   "seconds": dt}


def run_reference(dataset):
    sys.path.insert(0, REFERENCE)
    import torch
    import torch.nn as nn

    import aesmc.losses as ref_losses
    import aesmc.state as ref_state

    torch.manual_seed(0)
    np.random.seed(0)
    torch.set_num_threads(1)

    class Initial:
        def __call__(self):
            return torch.distributions.Normal(torch.tensor(0.0),
                                              torch.tensor(1.0))

    class Transition(nn.Module):
        def __init__(self):
            super().__init__()
            self.mult = nn.Parameter(torch.tensor(INIT_TRANS))

        def forward(self, previous_latents=None, time=None,
                    previous_observations=None):
            return ref_state.set_batch_shape_mode(
                torch.distributions.Normal(
                    self.mult * previous_latents[-1],
                    torch.tensor(TRANS_SCALE)),
                ref_state.BatchShapeMode.FULLY_EXPANDED)

    class Emission(nn.Module):
        def __init__(self):
            super().__init__()
            self.mult = nn.Parameter(torch.tensor(INIT_EMIT))

        def forward(self, latents=None, time=None,
                    previous_observations=None):
            return ref_state.set_batch_shape_mode(
                torch.distributions.Normal(
                    self.mult * latents[-1], torch.tensor(EMIT_SCALE)),
                ref_state.BatchShapeMode.FULLY_EXPANDED)

    class Proposal:
        def __call__(self, previous_latents=None, time=None,
                     observations=None):
            if time == 0:
                return ref_state.set_batch_shape_mode(
                    torch.distributions.Normal(
                        A0 * observations[0] + B0, torch.tensor(S0)),
                    ref_state.BatchShapeMode.BATCH_EXPANDED)
            return ref_state.set_batch_shape_mode(
                torch.distributions.Normal(
                    AP * previous_latents[-1] +
                    AO * observations[time].unsqueeze(-1) + BT,
                    torch.tensor(ST)),
                ref_state.BatchShapeMode.FULLY_EXPANDED)

    transition, emission = Transition(), Emission()
    optimizer = torch.optim.Adam(
        list(transition.parameters()) + list(emission.parameters()), lr=LR)
    initial, proposal = Initial(), Proposal()

    curve = []
    t0 = time.perf_counter()
    for i in range(dataset.shape[0]):
        observations = [torch.from_numpy(dataset[i, t]) for t in range(T)]
        optimizer.zero_grad()
        loss = ref_losses.get_loss(observations, K, "aesmc", initial,
                                   transition, emission, proposal)
        loss.backward()
        optimizer.step()
        curve.append(float(loss.item()))
    dt = time.perf_counter() - t0
    return curve, {"transition_mult": float(transition.mult.item()),
                   "emission_mult": float(emission.mult.item()),
                   "seconds": dt}


def smooth(x, w=25):
    x = np.asarray(x)
    k = np.ones(w) / w
    return np.convolve(x, k, mode="valid")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=500)
    args = parser.parse_args()

    dataset = make_dataset(args.iters)
    print(f"running aesmc_tpu for {args.iters} iters...", file=sys.stderr)
    jax_curve, jax_info = run_jax(dataset)
    print(f"  jax: {jax_info}", file=sys.stderr)
    print(f"running torch reference for {args.iters} iters...",
          file=sys.stderr)
    ref_curve, ref_info = run_reference(dataset)
    print(f"  ref: {ref_info}", file=sys.stderr)

    sj, sr = smooth(jax_curve), smooth(ref_curve)
    gap = np.abs(sj - sr)
    scale = float(np.mean(np.abs(sr)))
    report = {
        "config": {"T": T, "B": B, "K": K, "iters": args.iters,
                   "algorithm": "aesmc", "lr": LR},
        "jax": {"curve": jax_curve, **jax_info},
        "reference": {"curve": ref_curve, **ref_info},
        "smoothed_gap_max": float(gap.max()),
        "smoothed_gap_mean": float(gap.mean()),
        "smoothed_gap_rel_mean": float(gap.mean() / scale),
        "true_params": {"transition_mult": TRUE_TRANS,
                        "emission_mult": TRUE_EMIT},
    }
    OUT_DIR.mkdir(exist_ok=True)
    out = OUT_DIR / "loss_overlay.json"
    out.write_text(json.dumps(report))
    print(f"wrote {out}", file=sys.stderr)

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(8, 4.5))
        ax.plot(jax_curve, color="#4f86f7", alpha=0.25, lw=0.8)
        ax.plot(ref_curve, color="#e8833a", alpha=0.25, lw=0.8)
        ax.plot(np.arange(len(sj)) + 12, sj, color="#4f86f7",
                lw=2, label="aesmc_tpu (TPU-native)")
        ax.plot(np.arange(len(sr)) + 12, sr, color="#e8833a",
                lw=2, label="reference (PyTorch)")
        ax.set_xlabel("iteration")
        ax.set_ylabel("AESMC loss (-ELBO)")
        ax.set_title(f"LGSSM T={T} B={B} K={K}: identical data, "
                     f"independent inference noise")
        ax.legend()
        fig.tight_layout()
        fig.savefig(OUT_DIR / "loss_overlay.png", dpi=120)
        print(f"wrote {OUT_DIR / 'loss_overlay.png'}", file=sys.stderr)
    except ImportError:
        pass

    print(json.dumps({k: report[k] for k in
                      ("smoothed_gap_max", "smoothed_gap_mean",
                       "smoothed_gap_rel_mean")}))


if __name__ == "__main__":
    main()
