"""Wide-state ([B, K, 64]) sorted-gather variants (round 5, VERDICT r4
missing #2 follow-up).

The VRNN ablation puts the per-step fused resample+gather at ~0.59 ms
(37.7 ms of the 71.0 ms T=64 aesmc sweep) - 14x over the ~41 us HBM
bandwidth floor for moving 2 x 16.8 MB. This probe times the gather in
isolation across lowerings to decide whether a faster route exists or
the floor is the XLA gather itself:

  1. jnp.take_along_axis f32 (the current d>12 route)
  2. jnp.take_along_axis bf16 (half the bytes)
  3. one-hot bf16 MXU matmul (137 GFLOP/step at K=4096 - the FLOP way)
  4. grouped window-kernel route: 6 calls x 11 columns (re-runs the
     CDF search per group; round-4 measured PER-COLUMN calls 7.7-10.8x
     worse, this checks the grouped middle point)
  5. the index kernel alone (to subtract from the fused row)

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/wide_gather_probe_r5.py
"""

import pathlib
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  str(pathlib.Path(__file__).parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from aesmc_tpu import resampling  # noqa: E402
from aesmc_tpu.ops import gather_pallas  # noqa: E402

B, K, D = 16, 4096, 64
STEPS = 192


def timed(name, fn, init):
    jfn = jax.jit(fn)
    try:
        out = jfn(init)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    except Exception as e:  # noqa: BLE001
        print(f"{name:<46} FAILED: {type(e).__name__}: {e}", flush=True)
        return None
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = jfn(init)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
        best = min(best, time.perf_counter() - t0)
    per = best / STEPS
    gbps = 2 * B * K * D * 4 / per / 1e9
    print(f"{name:<46} {per*1e6:9.1f} us/step  "
          f"({gbps:6.1f} GB/s f32-equiv)", flush=True)
    return per


def main():
    key = jax.random.PRNGKey(0)
    print(f"backend: {jax.default_backend()}  B={B} K={K} D={D}",
          flush=True)
    logw = jax.random.normal(key, (B, K))
    val = jax.random.normal(jax.random.PRNGKey(1), (B, K, D))
    # Sorted ancestor indices, fixed (so every variant moves the same
    # data); regenerate tiny per-step variation inside the loop to stop
    # XLA hoisting the gather out of the scan.
    idx0 = jnp.sort(jax.random.randint(jax.random.PRNGKey(2), (B, K),
                                       0, K, dtype=jnp.int32), axis=1)

    def scan_over(step):
        def run(v):
            def body(c, i):
                idx = jnp.minimum(idx0 + (i % 2), K - 1)
                return step(c, idx), None
            c, _ = jax.lax.scan(body, v, jnp.arange(STEPS))
            return c
        return run

    # 1. take_along f32
    timed("take_along_axis f32",
          scan_over(lambda v, idx: jnp.take_along_axis(
              v, idx[:, :, None], axis=1) * 0.999), val)

    # 2. take_along bf16
    timed("take_along_axis bf16",
          scan_over(lambda v, idx: jnp.take_along_axis(
              v, idx[:, :, None], axis=1) * 0.999),
          val.astype(jnp.bfloat16))

    # 3. one-hot bf16 matmul: out[b] = onehot(idx[b]) @ v[b]
    def onehot_mm(v, idx):
        oh = jax.nn.one_hot(idx, K, dtype=jnp.bfloat16)  # [B, K, K]
        return jnp.einsum("bok,bkd->bod", oh, v,
                          preferred_element_type=jnp.bfloat16) * 0.999
    timed("one-hot bf16 MXU matmul", scan_over(onehot_mm),
          val.astype(jnp.bfloat16))

    # 4. grouped window-kernel route: 6 x 11-column sorted gathers.
    def grouped(v, idx):
        outs = []
        for g in range(0, D, 11):
            outs.append(gather_pallas.gather_sorted_pallas(
                v[:, :, g:g + 11], idx))
        return jnp.concatenate(outs, axis=-1) * 0.999
    timed("grouped window kernel (6 x 11 cols)", scan_over(grouped), val)

    # 5. index kernel alone (what the fused row pays before gathering).
    def idx_only(c, _idx):
        i = resampling.sample_ancestral_index(
            logw + c[0, 0, 0] * 1e-9, jax.random.PRNGKey(3),
            method="systematic", implementation="pallas")
        return c + 1e-9 * i[0, 0].astype(c.dtype)
    timed("index kernel alone (systematic pallas)",
          scan_over(lambda v, idx: idx_only(v, idx)), val)


if __name__ == "__main__":
    main()
