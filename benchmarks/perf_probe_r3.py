"""Round-2 kernel cost-driver ablations (headline shape B=10, K=10k).

Round-2's nine-variant matrix (BENCH_NOTES.md) showed the fused merge
kernel's cost is invariant to per-pair op count, trip count, scalar
traffic, and idx emission. One quantity NO variant changed: the number
of [1,128]->[128,1] column relayouts (W columns x n_trips ~ constant in
W). This probe varies exactly that, plus program-grid overhead and a
row-interleaved schedule:

  base          v3-style merge (extracted columns, full compares)
  norelayout    same block count, columns faked by SUBLANE broadcasts
                (wrong math, zero transposes) - isolates relayout cost
  relayoutonly  columns extracted + consumed, W^2 compare blocks dropped
  b1/b2/b5      v1 kernel at B in {1,2,5} (per-program overhead test)
  empty-pallas  pallas_call with the same specs, trivial body
  interleavedN  ALL rows in ONE program, N rows' merges per trip
                (independent cursors share the trip loop)

  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/perf_probe_r3.py
"""

import functools
import pathlib
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  str(pathlib.Path(__file__).parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import bench  # noqa: E402
from aesmc_tpu import resampling as R  # noqa: E402
from aesmc_tpu.ops import resample_pallas as rp  # noqa: E402

log = bench.log
LANE = 128
W = 4
B, K = 10, 10000
CHAIN = 400


def _padded_k(k):
    m = max(W, 8) * LANE
    return ((k + m - 1) // m) * m


def _prep(batch, k, seed=0):
    key = jax.random.PRNGKey(seed)
    logw = jax.random.normal(key, (batch, k)) * 1.0
    value = jax.random.normal(jax.random.PRNGKey(1), (batch, k))
    return logw, value


def _cdf_inputs(logw, value):
    """Padded cdf/prev/pos/value [B*Rc, 128] tiles + SMEM tile maxima."""
    cdf = R._normalized_cumsum(logw)
    pos = R.resampling_positions(logw, jax.random.PRNGKey(2), "systematic")
    batch, k = cdf.shape
    k_pad = _padded_k(k)
    if k_pad != k:
        cdf = jnp.pad(cdf, ((0, 0), (0, k_pad - k)), constant_values=2.0)
        pos = jnp.pad(pos, ((0, 0), (0, k_pad - k)), constant_values=2.0)
        value = jnp.pad(value, ((0, 0), (0, k_pad - k)), mode="edge")
    prev = jnp.concatenate([jnp.zeros_like(cdf[:, :1]), cdf[:, :-1]], 1)
    tile_k = W * LANE
    cmax = cdf.reshape(batch, k_pad // tile_k, tile_k)[:, :, -1]
    pmax = pos.reshape(batch, k_pad // tile_k, tile_k)[:, :, -1]
    r = k_pad // LANE
    t = lambda x: x.astype(jnp.float32).reshape(batch * r, LANE)
    return cmax, pmax, t(cdf), t(prev), t(pos), t(value), k_pad


def make_ablation_kernel(mode):
    def kernel(cmax_ref, pmax_ref, cdf_ref, cdfp_ref, pos_ref, v_ref,
               idx_ref, vout_ref):
        b = pl.program_id(0)
        r = cdf_ref.shape[0]
        n_tiles = r // W
        n_tiles_p = pos_ref.shape[0] // W
        tile_k = W * LANE

        def trip(carry):
            p, rr, acc, vacc = carry
            active = p < n_tiles_p
            p_safe = jnp.minimum(p, n_tiles_p - 1)
            row_done = jnp.logical_and(
                cmax_ref[b, rr] <= pmax_ref[b, p_safe], rr < n_tiles - 1)
            finalize = jnp.logical_and(active, jnp.logical_not(row_done))

            pos_tile = pos_ref[pl.ds(p_safe * W, W), :]
            cum_tile = cdf_ref[pl.ds(rr * W, W), :]
            cump_tile = cdfp_ref[pl.ds(rr * W, W), :]
            v_tile = v_ref[pl.ds(rr * W, W), :]

            if mode == "norelayout":
                # Fake columns by SUBLANE broadcast of the [1,128] rows:
                # identical block count/compares, ZERO lane->sublane
                # relayouts. (Mathematically wrong on purpose.)
                cum_cols = [jnp.broadcast_to(cum_tile[c:c + 1, :],
                                             (LANE, LANE))
                            for c in range(W)]
                prev_cols = [jnp.broadcast_to(cump_tile[c:c + 1, :],
                                              (LANE, LANE))
                             for c in range(W)]
                v_cols = [jnp.broadcast_to(v_tile[c:c + 1, :], (LANE, LANE))
                          for c in range(W)]
            else:
                cum_cols = [cum_tile[c:c + 1, :].reshape(LANE, 1)
                            for c in range(W)]
                prev_cols = [cump_tile[c:c + 1, :].reshape(LANE, 1)
                             for c in range(W)]
                v_cols = [v_tile[c:c + 1, :].reshape(LANE, 1)
                          for c in range(W)]

            cnt_rows, vrows = [], []
            if mode == "relayoutonly":
                # Consume the relayouted columns with O(W) work instead
                # of the W^2 [128,128] compare blocks.
                colsum = functools.reduce(
                    lambda a, c: a + c, cum_cols + prev_cols + v_cols,
                    jnp.zeros((LANE, 1), jnp.float32))
                for a in range(W):
                    pos_row = pos_tile[a:a + 1, :]
                    le = jnp.broadcast_to(colsum, (LANE, LANE)) <= pos_row
                    c = jnp.sum(le.astype(jnp.int32), axis=0, keepdims=True)
                    cnt_rows.append(c)
                    vrows.append(c.astype(jnp.float32) * 1e-6)
            else:
                for a in range(W):
                    pos_row = pos_tile[a:a + 1, :]
                    c = jnp.zeros((1, LANE), jnp.int32)
                    vrow = jnp.zeros((1, LANE), jnp.float32)
                    for col in range(W):
                        le = cum_cols[col] <= pos_row
                        c = c + jnp.sum(le.astype(jnp.int32), axis=0,
                                        keepdims=True)
                        sel = jnp.logical_and(prev_cols[col] <= pos_row,
                                              jnp.logical_not(le))
                        vrow = vrow + jnp.sum(
                            jnp.where(sel, v_cols[col],
                                      jnp.zeros((LANE, LANE))),
                            axis=0, keepdims=True)
                    cnt_rows.append(c)
                    vrows.append(vrow)
            cnt = jnp.concatenate(cnt_rows, axis=0)
            vcnt = jnp.concatenate(vrows, axis=0)

            @pl.when(finalize)
            def _():
                idx_ref[pl.ds(p_safe * W, W), :] = acc + cnt
                vout_ref[pl.ds(p_safe * W, W), :] = vacc + vcnt

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
            (jnp.int32(0), jnp.int32(0), jnp.zeros((W, LANE), jnp.int32),
             jnp.zeros((W, LANE), jnp.float32)))

    return kernel


def run_ablation(mode, logw, value):
    def call(logw_c):
        cmax, pmax, cdf, prev, pos, val, k_pad = _cdf_inputs(logw_c, value)
        batch = logw_c.shape[0]
        r = k_pad // LANE
        smem = lambda arr: pl.BlockSpec(arr.shape, lambda b: (0, 0),
                                        memory_space=pltpu.SMEM)
        spec = pl.BlockSpec((r, LANE), lambda b: (b, 0),
                            memory_space=pltpu.VMEM)
        idx, g = pl.pallas_call(
            make_ablation_kernel(mode),
            grid=(batch,),
            in_specs=[smem(cmax), smem(pmax), spec, spec, spec, spec],
            out_specs=[spec, spec],
            out_shape=[
                jax.ShapeDtypeStruct((batch * r, LANE), jnp.int32),
                jax.ShapeDtypeStruct((batch * r, LANE), jnp.float32)],
        )(cmax, pmax, cdf, prev, pos, val)
        return idx, g

    def chain(carry):
        logw_c, s = carry
        idx, g = call(logw_c)
        return (logw_c + 1e-9 * g.reshape(logw_c.shape[0], -1)
                [:, :logw_c.shape[1]],
                s + jnp.sum(idx))

    return chain


def make_interleaved_kernel(batch):
    """ALL rows in one program (grid=(1,)); per trip, every row's merge
    advances one step - independent cursors share the trip loop, so any
    fixed per-trip cost is amortized over `batch` rows."""

    def kernel(cmax_ref, pmax_ref, cdf_ref, cdfp_ref, pos_ref, v_ref,
               idx_ref, vout_ref):
        r = cdf_ref.shape[0] // batch
        n_tiles = r // W
        n_tiles_p = pos_ref.shape[0] // batch // W
        tile_k = W * LANE

        def row_step(i, p, rr, acc, vacc):
            active = p < n_tiles_p
            p_safe = jnp.minimum(p, n_tiles_p - 1)
            row_done = jnp.logical_and(
                cmax_ref[i, rr] <= pmax_ref[i, p_safe], rr < n_tiles - 1)
            finalize = jnp.logical_and(active, jnp.logical_not(row_done))

            pos_tile = pos_ref[pl.ds(i * r + p_safe * W, W), :]
            cum_tile = cdf_ref[pl.ds(i * r + rr * W, W), :]
            cump_tile = cdfp_ref[pl.ds(i * r + rr * W, W), :]
            v_tile = v_ref[pl.ds(i * r + rr * W, W), :]

            cum_cols = [cum_tile[c:c + 1, :].reshape(LANE, 1)
                        for c in range(W)]
            prev_cols = [cump_tile[c:c + 1, :].reshape(LANE, 1)
                         for c in range(W)]
            v_cols = [v_tile[c:c + 1, :].reshape(LANE, 1) for c in range(W)]
            cnt_rows, vrows = [], []
            for a in range(W):
                pos_row = pos_tile[a:a + 1, :]
                c = jnp.zeros((1, LANE), jnp.int32)
                vrow = jnp.zeros((1, LANE), jnp.float32)
                for col in range(W):
                    le = cum_cols[col] <= pos_row
                    c = c + jnp.sum(le.astype(jnp.int32), axis=0,
                                    keepdims=True)
                    sel = jnp.logical_and(prev_cols[col] <= pos_row,
                                          jnp.logical_not(le))
                    vrow = vrow + jnp.sum(
                        jnp.where(sel, v_cols[col], jnp.zeros((LANE, LANE))),
                        axis=0, keepdims=True)
                cnt_rows.append(c)
                vrows.append(vrow)
            cnt = jnp.concatenate(cnt_rows, axis=0)
            vcnt = jnp.concatenate(vrows, axis=0)

            @pl.when(finalize)
            def _():
                idx_ref[pl.ds(i * r + p_safe * W, W), :] = acc + cnt
                vout_ref[pl.ds(i * r + p_safe * W, W), :] = vacc + vcnt

            new_acc = jnp.where(row_done, acc + cnt,
                                (tile_k * rr) * jnp.ones_like(acc))
            new_acc = jnp.where(active, new_acc, acc)
            new_vacc = jnp.where(row_done, vacc + vcnt,
                                 jnp.zeros_like(vacc))
            new_vacc = jnp.where(active, new_vacc, vacc)
            new_p = jnp.where(finalize, p + 1, p)
            new_r = jnp.where(jnp.logical_and(active, row_done), rr + 1, rr)
            return new_p, new_r, new_acc, new_vacc

        def trip(carry):
            ps, rrs, accs, vaccs = carry
            outs = [row_step(i, ps[i], rrs[i], accs[i], vaccs[i])
                    for i in range(batch)]
            return (tuple(o[0] for o in outs), tuple(o[1] for o in outs),
                    tuple(o[2] for o in outs), tuple(o[3] for o in outs))

        def cond(carry):
            ps = carry[0]
            alive = ps[0] < n_tiles_p
            for i in range(1, batch):
                alive = jnp.logical_or(alive, ps[i] < n_tiles_p)
            return alive

        jax.lax.while_loop(
            cond, trip,
            (tuple(jnp.int32(0) for _ in range(batch)),
             tuple(jnp.int32(0) for _ in range(batch)),
             tuple(jnp.zeros((W, LANE), jnp.int32) for _ in range(batch)),
             tuple(jnp.zeros((W, LANE), jnp.float32)
                   for _ in range(batch))))

    return kernel


def run_interleaved(logw, value):
    def call(logw_c):
        cmax, pmax, cdf, prev, pos, val, k_pad = _cdf_inputs(logw_c, value)
        batch = logw_c.shape[0]
        r = k_pad // LANE
        smem = lambda arr: pl.BlockSpec(arr.shape, lambda: (0, 0),
                                        memory_space=pltpu.SMEM)
        spec = pl.BlockSpec((batch * r, LANE), lambda: (0, 0),
                            memory_space=pltpu.VMEM)
        idx, g = pl.pallas_call(
            make_interleaved_kernel(batch),
            in_specs=[smem(cmax), smem(pmax), spec, spec, spec, spec],
            out_specs=[spec, spec],
            out_shape=[
                jax.ShapeDtypeStruct((batch * r, LANE), jnp.int32),
                jax.ShapeDtypeStruct((batch * r, LANE), jnp.float32)],
        )(cmax, pmax, cdf, prev, pos, val)
        return idx, g

    def chain(carry):
        logw_c, s = carry
        idx, g = call(logw_c)
        return (logw_c + 1e-9 * g.reshape(logw_c.shape[0], -1)
                [:, :logw_c.shape[1]],
                s + jnp.sum(idx))

    return chain


def empty_kernel(cmax_ref, pmax_ref, cdf_ref, cdfp_ref, pos_ref, v_ref,
                 idx_ref, vout_ref):
    b = pl.program_id(0)
    idx_ref[:, :] = jnp.full(idx_ref.shape, b, jnp.int32)
    vout_ref[:, :] = cdf_ref[:, :] + pos_ref[:, :]


def run_empty(logw, value):
    def call(logw_c):
        cmax, pmax, cdf, prev, pos, val, k_pad = _cdf_inputs(logw_c, value)
        batch = logw_c.shape[0]
        r = k_pad // LANE
        smem = lambda arr: pl.BlockSpec(arr.shape, lambda b: (0, 0),
                                        memory_space=pltpu.SMEM)
        spec = pl.BlockSpec((r, LANE), lambda b: (b, 0),
                            memory_space=pltpu.VMEM)
        idx, g = pl.pallas_call(
            empty_kernel, grid=(batch,),
            in_specs=[smem(cmax), smem(pmax), spec, spec, spec, spec],
            out_specs=[spec, spec],
            out_shape=[
                jax.ShapeDtypeStruct((batch * r, LANE), jnp.int32),
                jax.ShapeDtypeStruct((batch * r, LANE), jnp.float32)],
        )(cmax, pmax, cdf, prev, pos, val)
        return idx, g

    def chain(carry):
        logw_c, s = carry
        idx, g = call(logw_c)
        return (logw_c + 1e-9 * g.reshape(logw_c.shape[0], -1)
                [:, :logw_c.shape[1]],
                s + jnp.sum(idx))

    return chain


def run_v1(logw, value):
    def chain(carry):
        logw_c, s = carry
        pos = rp.resampling_positions(logw_c, jax.random.PRNGKey(2),
                                      "systematic")
        cdf = R._normalized_cumsum(logw_c)
        idx, (g,) = rp.searchsorted_sorted_cdf_pallas(cdf, pos, (value,))
        return logw_c + 1e-9 * g, s + jnp.sum(idx)
    return chain


def main():
    log(f"backend: {jax.default_backend()} W={W} B={B} K={K} chain={CHAIN}")
    logw, value = _prep(B, K)

    experiments = [
        ("v1-lib B=10", run_v1(logw, value), (logw, jnp.float32(0))),
        ("empty-pallas B=10", run_empty(logw, value),
         (logw, jnp.float32(0))),
        ("ablate-base B=10", run_ablation("base", logw, value),
         (logw, jnp.float32(0))),
        ("ablate-norelayout B=10", run_ablation("norelayout", logw, value),
         (logw, jnp.float32(0))),
        ("ablate-relayoutonly B=10",
         run_ablation("relayoutonly", logw, value), (logw, jnp.float32(0))),
    ]
    for nb in (1, 2, 5):
        lw, vl = _prep(nb, K)
        experiments.append((f"v1-lib B={nb}", run_v1(lw, vl),
                            (lw, jnp.float32(0))))
    for nb in (2, 10):
        lw, vl = _prep(nb, K)
        experiments.append((f"interleaved B={nb}", run_interleaved(lw, vl),
                            (lw, jnp.float32(0))))

    for name, fn, init in experiments:
        t0 = time.time()
        try:
            dt = bench.timed_chained(fn, init, chain=CHAIN)
            log(f"{name}: {dt*1e3:.3f} ms/call "
                f"(compile {time.time()-t0:.0f}s)")
        except Exception as e:  # noqa: BLE001
            log(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
