"""Data assimilation on Lorenz-96: particle filters vs the EnKF.

The standard chaotic benchmark (D=8, observed every other component):
compares four assimilation strategies on the same trajectory -

  1. bootstrap particle filter (K=1024),
  2. particle filter with the closed-form assimilation proposal
     (aesmc_tpu.models.lorenz, locally-optimal given propagated
     moments),
  3. plain stochastic EnKF at a SMALL ensemble (N=20),
  4. the same N=20 EnKF with multiplicative inflation + Gaspari-Cohn
     localization (the production small-ensemble recipe).

Measured outcome (CPU f32, key 0): at K=64 the bootstrap evidence
COLLAPSES (-247.6 vs the assimilation proposal's -143.7 - a 104-nat
gap from importance-weight degeneracy) while the assimilation proposal
already tracks the truth; at K=1024 both PFs converge to RMSE ~0.43
and beat every N=20 ensemble variant; among the ensembles,
inflation+localization cuts the raw EnKF's RMSE 0.58 -> 0.54 at 50x
fewer members than the PF needs - the classic story of why both tools
exist (weights win when you can afford the particles, ensemble updates
win per member in high dimension).

  PYTHONPATH=/root/repo python examples/lorenz_assimilation.py
"""

import os
import pathlib
import sys

import jax

# CPU by default: the N=20 ensemble rows are [8, 8]/[20, 20] matrix math
# - the measured tiny-matrix TPU trap (per-particle small linear algebra
# serializes on v5e; see CLAUDE.md / BENCH_NOTES "tiny-Cholesky TPU
# trap"). The PF rows have TPU bench coverage in bench_extended.py.
if not os.environ.get("AESMC_EXAMPLE_TPU"):
    jax.config.update("jax_platforms", "cpu")
# No persistent cache on the CPU path: the root .jax_cache holds
# XLA:CPU AOT entries from rotated hosts (see CLAUDE.md cache hazard).

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from aesmc_tpu import enkf, inference, statistics  # noqa: E402
from aesmc_tpu.models import lorenz  # noqa: E402


def main():
    dim, T, B = 8, 30, 1
    obs_idx = tuple(range(0, dim, 2))
    key = jax.random.PRNGKey(0)

    boot = lorenz.make_model(dim=dim, obs_indices=obs_idx,
                             emission_scale=0.5, transition_scale=0.3,
                             proposal="bootstrap")
    assim = lorenz.make_model(dim=dim, obs_indices=obs_idx,
                              emission_scale=0.5, transition_scale=0.3)
    initial, transition, emission, _ = boot
    latents, obs = statistics.sample_from_prior(
        initial, transition, emission, T, B, jax.random.PRNGKey(3))
    truth = np.asarray(latents)[:, 0]               # [T, D]

    rows = []

    def pf_row(name, comps, K):
        out = jax.jit(lambda o, k: inference.infer(
            "smc", o, *comps, K, key=k,
            return_log_marginal_likelihood=True, return_latents=True,
            return_log_weight=True))(obs, key)
        means = np.asarray(jax.vmap(
            statistics.empirical_mean, in_axes=(0, None))(
                out["latents"], out["log_weight"]))[:, 0]
        rmse = np.sqrt(np.mean((means[T // 2:] - truth[T // 2:]) ** 2))
        rows.append((name, rmse,
                     float(np.mean(np.asarray(
                         out["log_marginal_likelihood"])))))

    # Small K is where the proposal earns its keep (at K~1000+ even
    # bootstrap weights cover this 8-dim posterior).
    pf_row("bootstrap PF K=64", boot, 64)
    pf_row("assimilation-proposal PF K=64", assim, 64)
    pf_row("bootstrap PF K=1024", boot, 1024)
    pf_row("assimilation-proposal PF K=1024", assim, 1024)

    def enkf_row(name, **kw):
        out = jax.jit(lambda o, k: enkf.enkf_filter(
            o, initial, transition,
            observation_fn=lambda x: x[np.asarray(obs_idx)],
            obs_cov=0.25, key=k, **kw))(obs, key)
        means = np.asarray(out["filtered_means"])[:, 0]
        rmse = np.sqrt(np.mean((means[T // 2:] - truth[T // 2:]) ** 2))
        rows.append((name, rmse, float(out["log_likelihood"][0])))

    enkf_row("EnKF N=20 (raw)", num_members=20)
    loc = enkf.gaspari_cohn_localization(dim, obs_idx, radius=2.0)
    enkf_row("EnKF N=20 + inflation + localization", num_members=20,
             inflation=1.05, localization=loc)
    enkf_row("ETKF N=20 + inflation", num_members=20, inflation=1.05,
             method="etkf")

    print(f"Lorenz-96 D={dim}, T={T}, observed components {obs_idx}, "
          f"RMSE over the second half:")
    print(f"{'method':>38} {'RMSE':>8} {'log-evidence':>14}")
    for name, rmse, ll in rows:
        print(f"{name:>38} {rmse:>8.3f} {ll:>14.2f}")


if __name__ == "__main__":
    main()
