"""Round-4 TPU probe: large-K smoothing.

Three sections, selectable by argv (default: paris ffbs):

  paris     - PaRIS with the NEW chunked-pairwise backward (streamed
              Gumbel-max; smoothing._chunked_pairwise_backward_indices)
              at K = 32k / 65k / 131k, past the dense [B, K, K] wall.
  ffbs      - backward_simulation (pairwise, [B, K, M] tile - memory is
              O(K*M), no wall) at K = 65k / 262k / 1M, M = 128.
  rejection - PaRIS backward='rejection' bracketing above the known-good
              K=16,384: run LAST / separately - K=65,536 CRASHED the TPU
              worker twice in round 3 (suspect while_loop+searchsorted at
              [B, 131072] lanes). argv 'rejection:K' runs a single K.

Workload: scalar LGSSM, T=25, B=2, h(xp, xc) = xc, N=2 backward draws
(matches benchmarks/smoothing_probe_r3.py so rows are comparable).

Run: PYTHONPATH=/root/repo:/root/.axon_site \
       python benchmarks/smoothing_probe_r4.py [paris] [ffbs] [rejection:32768]
"""

import pathlib
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  str(pathlib.Path(__file__).resolve().parent.parent /
                      ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from aesmc_tpu import inference, smoothing, statistics  # noqa: E402
from aesmc_tpu.models import lgssm  # noqa: E402

T, B = 25, 2
PARIS_KS = (32_768, 65_536, 131_072)
FFBS_KS = (65_536, 262_144, 1_048_576)
FFBS_M = 128


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _setup():
    key = jax.random.PRNGKey(0)
    initial = lgssm.Initial(0.0, 1.0)
    transition = lgssm.Transition.create(0.9, 1.0)
    emission = lgssm.Emission.create(1.0, 0.2)
    proposal = lgssm.Proposal.create(1.0, 1.0, key)
    obs_key, run_key = jax.random.split(key)
    _, observations = statistics.sample_from_prior(
        initial, transition, emission, T, B, key=obs_key)
    return (initial, transition, emission, proposal), observations, run_key


def _timed(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))  # force relay fetch
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
        times.append(time.perf_counter() - t0)
    return min(times), out


def run_paris(comps, observations, run_key, backward, num_particles):
    initial, transition, emission, proposal = comps

    def h(prev, cur, time):
        del prev, time
        return cur

    def call(k):
        out = smoothing.paris(
            observations, initial, transition, emission, proposal,
            num_particles=num_particles, h=h, key=k,
            num_backward_draws=2, backward=backward)
        return out["smoothed"], out.get("backward_unconverged",
                                        jnp.zeros((B,), jnp.int32))

    dt, (smoothed, unconv) = _timed(jax.jit(call), run_key)
    log(f"paris     K={num_particles:>9,} {backward:<9} "
        f"{dt / T * 1e3:9.2f} ms/obs (total {dt*1e3:8.1f} ms, "
        f"smoothed={float(jnp.mean(smoothed)):+.4f}, "
        f"unconverged={int(jnp.sum(unconv))})")


def run_ffbs(comps, observations, run_key, num_particles):
    initial, transition, emission, proposal = comps
    out = jax.jit(lambda k: inference.infer(
        "smc", observations, initial, transition, emission, proposal,
        num_particles, key=k, return_original_latents=True,
        return_log_weights=True, return_latents=False,
        return_log_weight=False))(run_key)
    latents = out["original_latents"]
    logw = out["log_weights"]
    jax.block_until_ready(logw)

    # latents/logw must be ARGUMENTS, not closure constants: closed-over
    # device arrays are serialized into the remote-compile request,
    # which the tunnel rejects with HTTP 413 at K=1M.
    def call(k, lat, lw):
        return smoothing.backward_simulation(
            lat, lw, transition, FFBS_M, k,
            observations=observations)

    dt, traj = _timed(jax.jit(call), run_key, latents, logw)
    log(f"ffbs      K={num_particles:>9,} pairwise  "
        f"{dt / T * 1e3:9.2f} ms/obs (total {dt*1e3:8.1f} ms, "
        f"M={FFBS_M}, mean={float(jnp.mean(traj)):+.4f})")


def main():
    args = sys.argv[1:] or ["paris", "ffbs"]
    comps, observations, run_key = _setup()
    for arg in args:
        if arg == "paris":
            for k in PARIS_KS:
                run_paris(comps, observations, run_key, "pairwise", k)
        elif arg == "ffbs":
            for k in FFBS_KS:
                run_ffbs(comps, observations, run_key, k)
        elif arg.startswith("rejection"):
            k = int(arg.split(":")[1]) if ":" in arg else 32_768
            log(f"rejection bracket: K={k:,} (worker-crash risk above "
                "16,384 - see smoothing.py docstring)")
            run_paris(comps, observations, run_key, "rejection", k)
        else:
            raise SystemExit(f"unknown section {arg!r}")


if __name__ == "__main__":
    main()
