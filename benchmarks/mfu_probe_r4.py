"""Round-4 MFU / roofline probe for the model-compute-bound rows.

VERDICT r3 next #7: the resampling-bound headline has its floor
argument (device-plane trace: kernel 70%); the deep models don't.
This probe publishes, per model step (the full jitted SMC/loss step at
the bench_extended shapes), XLA's own FLOP count
(`compiled.cost_analysis()['flops']`), the measured time, the achieved
TFLOP/s and the fraction of v5e peak - plus a WIDE VRNN variant
(hidden=256, MXU-friendly dims) to separate "small-matmul floor" from
"framework overhead".

v5e peak: 197 TFLOP/s bf16 (f32 inputs are converted on the MXU; the
round-3 bf16-knob probe measured 18.7-21 TFLOP/s on tiny isolated
matmuls either way, so 197e12 is the honest denominator).

Run: PYTHONPATH=/root/repo:/root/.axon_site \
       python benchmarks/mfu_probe_r4.py
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

from aesmc_tpu import inference, statistics  # noqa: E402
from aesmc_tpu.models import bouncing_ball, lorenz, vrnn  # noqa: E402

PEAK = 197e12  # v5e bf16 TFLOP/s
HBM_PEAK = 819e9  # v5e HBM bandwidth, bytes/s
CHAIN = 10


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def measure(name, fn, key, t, b, k):
    """fn(key) -> scalar-reducible output; report FLOPs + bytes + both
    roofline fractions (VERDICT r4 #2: the bandwidth half was missing -
    'bytes accessed' is XLA's post-fusion HBM traffic estimate for the
    compiled program, the number the MFU story was guessed from)."""
    jfn = jax.jit(fn)
    lowered = jfn.lower(key)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    flops = float(ca.get("flops", float("nan")))
    nbytes = float(ca.get("bytes accessed", float("nan")))

    def chained(kk):
        def body(carry, _):
            k_, acc = carry
            k_, sub = jax.random.split(k_)
            return (k_, acc + jnp.sum(fn(sub))), None
        (_, acc), _ = jax.lax.scan(body, (kk, 0.0), None, length=CHAIN)
        return acc

    jc = jax.jit(chained)
    float(jc(key))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jc(key))
        times.append(time.perf_counter() - t0)
    dt = min(times) / CHAIN
    tf = flops / dt
    bw = nbytes / dt
    log(f"{name:<44} {flops/1e9:9.2f} GFLOP/step  "
        f"{nbytes/1e9:8.3f} GB/step  {dt*1e3:8.2f} ms  "
        f"{tf/1e12:7.3f} TFLOP/s ({100*tf/PEAK:5.2f}% MXU)  "
        f"{bw/1e9:7.1f} GB/s ({100*bw/HBM_PEAK:5.1f}% HBM)  "
        f"{t*b*k/dt/1e6:7.1f} M ps/s")


def main():
    key = jax.random.PRNGKey(0)
    log(f"backend: {jax.default_backend()}  (peak {PEAK/1e12:.0f} "
        "TFLOP/s bf16)")

    # Bouncing-ball (config 4 shape) - f32 and bf16-compute variants.
    T, B, K = 64, 16, 256
    for dtype in (None, "bfloat16"):
        bb = bouncing_ball.make_model(key, num_pixels=32, hidden=64,
                                      compute_dtype=dtype)
        _, obs = statistics.sample_from_prior(bb[0], bb[1], bb[2],
                                              T, B, key)

        def bb_fn(k, bb=bb, obs=obs):
            return inference.infer(
                "smc", obs, *bb, num_particles=K, key=k,
                return_latents=False, return_log_weight=False,
                return_log_marginal_likelihood=True,
            )["log_marginal_likelihood"]

        measure(f"bouncing-ball T={T} B={B} K={K} "
                f"dtype={dtype or 'f32'}", bb_fn, key, T, B, K)

    # VRNN at the bench dims, then MXU-friendly wide dims, then wide at
    # growing K (the MFU lever: particle count IS the matmul batch -
    # if the small-K rows are overhead-floor-bound, TFLOP/s should rise
    # near-linearly in K until the MXU or HBM starts to bind).
    for (ld, hd, od, mlp, k_p, tag) in (
            (8, 32, 16, 32, 256, "bench"),
            (64, 256, 64, 256, 256, "wide"),
            (64, 256, 64, 256, 1024, "wide"),
            (64, 256, 64, 256, 4096, "wide"),
            (64, 256, 64, 256, 16384, "wide"),):
        T, B = 64, 16
        comps = vrnn.make_model(latent_dim=ld, hidden_dim=hd,
                                obs_dim=od, key=key, mlp_hidden=mlp)
        initial, encoder, transition, emission, proposal = comps
        _, obs = vrnn.generate(encoder, initial, transition, emission,
                               T, B, key)

        def vr_fn(k, obs=obs, comps=comps):
            initial, encoder, transition, emission, proposal = comps
            return vrnn.vrnn_loss(obs, k_p, "aesmc", initial, encoder,
                                  transition, emission, proposal, key=k)

        measure(f"VRNN {tag} L={ld} H={hd} O={od} K={k_p}",
                vr_fn, key, T, B, k_p)

    # Lorenz-96 bootstrap (elementwise RK4: the quantified VPU floor).
    T, B, K = 50, 8, 1024
    lz = lorenz.make_model(dim=8, emission_scale=0.5,
                           proposal="bootstrap")
    _, obs = statistics.sample_from_prior(lz[0], lz[1], lz[2], T, B, key)

    def lz_fn(k):
        return inference.infer(
            "smc", obs, *lz, num_particles=K, key=k,
            return_latents=False, return_log_weight=False,
                return_log_marginal_likelihood=True,
        )["log_marginal_likelihood"]

    measure(f"Lorenz-96 D=8 T={T} B={B} K={K} bootstrap",
            lz_fn, key, T, B, K)


if __name__ == "__main__":
    main()
