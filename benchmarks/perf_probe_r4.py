"""Round-2 kernel redesign probe: the FLIPPED merge.

perf_probe_r3.py isolated the v1 kernel's cost to the [1,128]->[128,1]
column relayouts (3W per trip: cdf, shifted cdf, value column). The
flipped merge transposes the POSITIONS instead (W per trip) and keeps
cdf/prev/value as [1,128] sublane-broadcasts (measured free):

  le_T[j, i] = cdf_i <= pos_j   ([128 pos-sublanes, 128 cdf-lanes])

Counts/gathers then reduce over LANES (once per pos column per trip,
accumulated across the W cdf blocks first). Two reduce variants:
  flip-vpu   jnp.sum(axis=1) (log-lane shuffle tree)
  flip-mxu   counts via [128,128] @ ones[128,1] on the MXU (exact: le
             entries are small ints, bf16-exact; f32 accumulate), values
             still VPU (arbitrary f32 would round through bf16)

Plus micro-op kernels mapping the raw cost of each primitive.

  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/perf_probe_r4.py
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
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import bench  # noqa: E402
from aesmc_tpu import resampling as R  # noqa: E402
from benchmarks.perf_probe_r3 import _cdf_inputs, _prep  # noqa: E402

log = bench.log
LANE = 128
W = 4
B, K = 10, 10000
CHAIN = 400


def make_flip_kernel(reduce_mode, finalize_mode="transpose"):
    """Flipped merge. reduce_mode: 'vpu' | 'mxu-cnt'.
    finalize_mode: 'transpose' (bulk [128,W]->[W,128] at finalize) |
    'columns' (W column->row relayouts at finalize)."""

    def kernel(cmax_ref, pmax_ref, cdf_ref, cdfp_ref, pos_ref, v_ref,
               idx_ref, vout_ref):
        b = pl.program_id(0)
        r = cdf_ref.shape[0]
        n_tiles = r // W
        n_tiles_p = pos_ref.shape[0] // W
        tile_k = W * LANE
        ones_col = jnp.ones((LANE, 1), jnp.float32)

        def trip(carry):
            p, rr, acc, vacc = carry          # acc, vacc: [128, W]
            active = p < n_tiles_p
            p_safe = jnp.minimum(p, n_tiles_p - 1)
            row_done = jnp.logical_and(
                cmax_ref[b, rr] <= pmax_ref[b, p_safe], rr < n_tiles - 1)
            finalize = jnp.logical_and(active, jnp.logical_not(row_done))

            pos_tile = pos_ref[pl.ds(p_safe * W, W), :]
            cum_tile = cdf_ref[pl.ds(rr * W, W), :]
            cump_tile = cdfp_ref[pl.ds(rr * W, W), :]
            v_tile = v_ref[pl.ds(rr * W, W), :]

            # The ONLY per-trip relayouts: W position columns.
            pos_cols = [pos_tile[a:a + 1, :].reshape(LANE, 1)
                        for a in range(W)]
            cum_rows = [jnp.broadcast_to(cum_tile[c:c + 1, :], (LANE, LANE))
                        for c in range(W)]
            prev_rows = [jnp.broadcast_to(cump_tile[c:c + 1, :],
                                          (LANE, LANE)) for c in range(W)]
            v_rows = [jnp.broadcast_to(v_tile[c:c + 1, :], (LANE, LANE))
                      for c in range(W)]

            cnt_cols, val_cols = [], []
            for a in range(W):
                le_sum = jnp.zeros((LANE, LANE), jnp.int32)
                vsum = jnp.zeros((LANE, LANE), jnp.float32)
                for c in range(W):
                    le = cum_rows[c] <= pos_cols[a]       # [128p, 128c]
                    le_sum = le_sum + le.astype(jnp.int32)
                    sel = jnp.logical_and(prev_rows[c] <= pos_cols[a],
                                          jnp.logical_not(le))
                    vsum = vsum + jnp.where(sel, v_rows[c],
                                            jnp.zeros((LANE, LANE)))
                if reduce_mode == "mxu-cnt":
                    # Single-pass bf16 MXU is EXACT here: le_sum entries
                    # are ints <= W (bf16-exact), accumulate is f32.
                    cnt_cols.append(jax.lax.dot(
                        le_sum.astype(jnp.float32), ones_col,
                        precision=jax.lax.Precision.DEFAULT
                    ).astype(jnp.int32))
                else:
                    cnt_cols.append(jnp.sum(le_sum, axis=1, keepdims=True))
                val_cols.append(jnp.sum(vsum, axis=1, keepdims=True))
            cnt = jnp.concatenate(cnt_cols, axis=1)      # [128, W]
            vcnt = jnp.concatenate(val_cols, axis=1)     # [128, W]

            @pl.when(finalize)
            def _():
                total_cnt = acc + cnt
                total_val = vacc + vcnt
                if finalize_mode == "transpose":
                    idx_ref[pl.ds(p_safe * W, W), :] = jnp.transpose(
                        total_cnt, (1, 0))
                    vout_ref[pl.ds(p_safe * W, W), :] = jnp.transpose(
                        total_val, (1, 0))
                else:
                    for a in range(W):
                        idx_ref[pl.ds(p_safe * W + a, 1), :] = \
                            total_cnt[:, a:a + 1].reshape(1, LANE)
                        vout_ref[pl.ds(p_safe * W + a, 1), :] = \
                            total_val[:, a:a + 1].reshape(1, LANE)

            new_acc = jnp.where(row_done, acc + cnt,
                                (tile_k * rr) * jnp.ones_like(acc))
            new_acc = jnp.where(active, new_acc, acc)
            new_vacc = jnp.where(row_done, vacc + vcnt,
                                 jnp.zeros_like(vacc))
            new_vacc = jnp.where(active, new_vacc, vacc)
            new_p = jnp.where(finalize, p + 1, p)
            new_r = jnp.where(jnp.logical_and(active, row_done), rr + 1, rr)
            return new_p, new_r, new_acc, new_vacc

        jax.lax.while_loop(
            lambda c: c[0] < n_tiles_p, trip,
            (jnp.int32(0), jnp.int32(0), jnp.zeros((LANE, W), jnp.int32),
             jnp.zeros((LANE, W), jnp.float32)))

    return kernel


def flip_call(logw_c, value, reduce_mode, finalize_mode, interpret=False):
    cmax, pmax, cdf, prev, pos, val, k_pad = _cdf_inputs(logw_c, value)
    batch = logw_c.shape[0]
    r = k_pad // LANE
    smem = lambda arr: pl.BlockSpec(arr.shape, lambda b: (0, 0),
                                    memory_space=pltpu.SMEM)
    spec = pl.BlockSpec((r, LANE), lambda b: (b, 0),
                        memory_space=pltpu.VMEM)
    idx, g = pl.pallas_call(
        make_flip_kernel(reduce_mode, finalize_mode),
        grid=(batch,),
        in_specs=[smem(cmax), smem(pmax), spec, spec, spec, spec],
        out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((batch * r, LANE), jnp.int32),
                   jax.ShapeDtypeStruct((batch * r, LANE), jnp.float32)],
        interpret=interpret,
    )(cmax, pmax, cdf, prev, pos, val)
    k = logw_c.shape[1]
    idx = jnp.clip(idx.reshape(batch, k_pad)[:, :k], 0, k - 1)
    return idx, g.reshape(batch, k_pad)[:, :k]


def verify(reduce_mode, finalize_mode):
    logw, value = _prep(B, K, seed=7)
    idx, g = jax.jit(lambda lw: flip_call(lw, value, reduce_mode,
                                          finalize_mode))(logw)
    cdf = R._normalized_cumsum(logw)
    pos = R.resampling_positions(logw, jax.random.PRNGKey(2), "systematic")
    idx_ref = jax.vmap(lambda c, p: jnp.searchsorted(c, p, side="right",
                                                     method="sort"))(cdf,
                                                                     pos)
    idx_ref = jnp.clip(idx_ref, 0, K - 1)
    g_ref = jnp.take_along_axis(value, idx_ref, axis=1)
    mi = int((np.asarray(idx) != np.asarray(idx_ref)).sum())
    mg = float(np.abs(np.asarray(g) - np.asarray(g_ref)).max())
    log(f"verify flip-{reduce_mode}/{finalize_mode}: idx mismatches "
        f"{mi}/{B*K}, gather dev {mg}")
    return mi == 0 and mg == 0.0


def run_flip(reduce_mode, finalize_mode, logw, value):
    def chain(carry):
        logw_c, s = carry
        idx, g = flip_call(logw_c, value, reduce_mode, finalize_mode)
        return logw_c + 1e-9 * g, s + jnp.sum(idx)
    return chain


# ---- micro-op kernels: N reps of one primitive inside a fori_loop.
def make_micro_kernel(op, reps):
    def kernel(x_ref, o_ref):
        x = x_ref[:, :]

        def body(i, acc):
            if op == "relayout":
                col = (x[0:1, :] + acc[0:1, 0:1]).reshape(LANE, 1)
                return acc + col
            if op == "sublane_bcast":
                row = jnp.broadcast_to(x[0:1, :] + acc[0:1, 0:1],
                                       (LANE, LANE))
                return acc + row[:, 0:1]
            if op == "lane_reduce":
                s = jnp.sum(x + acc[0:1, 0:1], axis=1, keepdims=True)
                return acc + s
            if op == "sublane_reduce":
                s = jnp.sum(x + acc[0:1, 0:1], axis=0, keepdims=True)
                return acc + s.reshape(LANE, 1)[0:1, 0:1]
            if op == "mxu_dot":
                s = jax.lax.dot(x + acc[0:1, 0:1],
                                jnp.ones((LANE, 1), jnp.float32),
                                precision=jax.lax.Precision.DEFAULT)
                return acc + s
            if op == "transpose":
                t = jnp.transpose(x + acc[0:1, 0:1], (1, 0))
                return acc + t[:, 0:1]
            if op == "compare_block":
                le = (x + acc[0:1, 0:1]) <= x[0:1, :]
                return acc + jnp.sum(le.astype(jnp.int32), axis=0,
                                     keepdims=True).reshape(LANE, 1)[
                                         0:1, 0:1]
            raise ValueError(op)

        acc = jax.lax.fori_loop(0, reps, body,
                                jnp.zeros((LANE, 1), jnp.float32))
        o_ref[:, :] = jnp.broadcast_to(acc, (LANE, LANE))

    return kernel


def run_micro(op, reps=2000):
    x = jax.random.normal(jax.random.PRNGKey(0), (LANE, LANE))
    spec = pl.BlockSpec((LANE, LANE), lambda: (0, 0),
                        memory_space=pltpu.VMEM)

    def call(xx):
        return pl.pallas_call(
            make_micro_kernel(op, reps),
            in_specs=[spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((LANE, LANE), jnp.float32),
        )(xx)

    def chain(carry):
        xx, s = carry
        o = call(xx)
        return xx + 1e-12 * o, s + jnp.sum(o[0, 0])

    dt = bench.timed_chained(chain, (x, jnp.float32(0)), chain=20)
    log(f"micro {op}: {dt/reps*1e9:.1f} ns/op ({reps} reps)")


def main():
    log(f"backend: {jax.default_backend()} W={W} B={B} K={K}")
    for op in ("relayout", "sublane_bcast", "lane_reduce", "sublane_reduce",
               "mxu_dot", "transpose", "compare_block"):
        try:
            run_micro(op)
        except Exception as e:  # noqa: BLE001
            log(f"micro {op}: FAILED {type(e).__name__}: {str(e)[:200]}")

    logw, value = _prep(B, K)
    for reduce_mode in ("vpu", "mxu-cnt"):
        for finalize_mode in ("transpose", "columns"):
            name = f"flip-{reduce_mode}/{finalize_mode}"
            t0 = time.time()
            try:
                ok = verify(reduce_mode, finalize_mode)
                dt = bench.timed_chained(
                    run_flip(reduce_mode, finalize_mode, logw, value),
                    (logw, jnp.float32(0)), chain=CHAIN)
                log(f"{name}: {dt*1e3:.3f} ms/call exact={ok} "
                    f"(compile {time.time()-t0:.0f}s)")
            except Exception as e:  # noqa: BLE001
                log(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
