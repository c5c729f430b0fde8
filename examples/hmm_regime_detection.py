"""Regime detection with the discrete-latent HMM family.

Three hidden market-style regimes (down / flat / up drift on the
observable) under a sticky transition matrix: run the fully-adapted
particle filter (the closed-form optimal proposal - available exactly
because the state space is finite), then compare every inference
product against the exact oracles the module ships:

  - evidence: particle log-Z vs the exact forward recursion;
  - filtered regime probabilities vs the forward recursion (max abs
    error over all (t, state));
  - FFBS smoothed occupancy vs exact forward-backward;
  - Viterbi MAP path accuracy vs the true simulated regimes, compared
    with the (strictly worse, as theory says) pointwise-MAP of the
    smoothed marginals.

  PYTHONPATH=/root/repo python examples/hmm_regime_detection.py
"""

import os
import pathlib
import sys

import jax

if not os.environ.get("AESMC_EXAMPLE_TPU"):
    jax.config.update("jax_platforms", "cpu")
# No persistent cache on the CPU path (see CLAUDE.md cache hazard).

import numpy as np  # noqa: E402

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from aesmc_tpu import inference, smoothing, statistics  # noqa: E402
from aesmc_tpu.models import hmm  # noqa: E402

D, T, K = 3, 120, 2048


def main():
    comps = hmm.make_model(num_states=D, emission_scale=0.8,
                           stay_prob=0.92)
    initial, transition, emission, proposal = comps
    latents, obs = statistics.sample_from_prior(
        initial, transition, emission, T, 1, jax.random.PRNGKey(7))
    truth = np.asarray(latents)[:, 0].astype(int)
    obs_np = np.asarray(obs)[:, 0]
    args = (initial.logits, transition.logits, emission.locs,
            emission.scale)

    out = inference.infer(
        "smc", obs, *comps, K, key=jax.random.PRNGKey(1),
        resampling_method="multinomial",
        return_log_marginal_likelihood=True,
        return_original_latents=True, return_log_weights=True)

    filt_exact, loglik = hmm.hmm_forward(obs_np, *args)
    lz = float(np.asarray(out["log_marginal_likelihood"])[0])

    lat = np.asarray(out["original_latents"])[:, 0]      # [T, K]
    logw = np.asarray(out["log_weights"])[:, 0]
    w = np.exp(logw - logw.max(axis=1, keepdims=True))
    w /= w.sum(axis=1, keepdims=True)
    occ = np.stack([(w * (lat == j)).sum(axis=1)
                    for j in range(D)], axis=-1)         # [T, D]
    filt_err = np.abs(occ - filt_exact).max()

    traj = smoothing.backward_simulation(
        out["original_latents"], out["log_weights"], transition, 500,
        jax.random.PRNGKey(2), observations=obs, backward="rejection",
        transition_log_bound=transition.log_bound)
    traj = np.asarray(traj)[:, 0]                        # [T, M]
    gamma = hmm.hmm_smoother(obs_np, *args)
    smooth_occ = np.stack([(traj == j).mean(axis=1)
                           for j in range(D)], axis=-1)
    smooth_err = np.abs(smooth_occ - gamma).max()

    path, _ = hmm.hmm_viterbi(obs_np, *args)
    viterbi_acc = float((path == truth).mean())
    marginal_map_acc = float((gamma.argmax(axis=1) == truth).mean())
    filtered_map_acc = float((occ.argmax(axis=1) == truth).mean())

    print(f"sticky 3-state HMM, T={T}, K={K} fully-adapted filter\n")
    print(f"log-evidence: particle {lz:.3f}  exact forward {loglik:.3f}"
          f"  (abs err {abs(lz - loglik):.4f})")
    print(f"filtered regime probs vs forward recursion: max abs err "
          f"{filt_err:.4f}")
    print(f"rejection-FFBS occupancy vs forward-backward: max abs err "
          f"{smooth_err:.4f}")
    print(f"\nregime accuracy vs simulated truth:")
    print(f"  filtered pointwise MAP : {100 * filtered_map_acc:.1f}%")
    print(f"  smoothed pointwise MAP : {100 * marginal_map_acc:.1f}%")
    print(f"  Viterbi joint MAP path : {100 * viterbi_acc:.1f}%")


if __name__ == "__main__":
    main()
