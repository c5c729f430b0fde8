"""Serving-side model monitoring: log_pred, PIT calibration, online EM.

Simulates the production scenario docs/SERVING.md describes: a
streaming filter serves one observation at a time while the WORLD
CHANGES underneath it - halfway through the stream the sensor develops
a +5.0 (4 predictive sigma) calibration bias the served model knows
nothing about - the classic silent production failure. The monitoring
stack catches it three independent ways (measured, CPU, key 0):

  1. `info['log_pred']` (incremental log-evidence) - a -11.8
     changepoint spike exactly at the shift step (pre-shift mean
     -1.61), then a persistently lower mean (-1.84): the single-outlier
     alarm AND the drift alarm;
  2. PIT values (`aesmc_tpu.forecast.predictive_pit` against each
     step's one-step-ahead forecast) - mean 0.49 (calibrated) before,
     0.64 after: the filter absorbs most of a constant bias into the
     latent, but the mean-reverting transition pulls back every step,
     so forecasts keep under-predicting - the calibration alarm that
     keeps firing long after the spike scrolled away;
  3. streaming PaRIS (`paris_h=`) - the smoothed EM sufficient
     statistics sum E[x_{t-1} x_t | y] / sum E[x_{t-1}^2 | y], the
     running online-EM estimate of the transition multiplier: 0.91
     while the model is right, corrupted to 0.98 after (the absorbed
     drift masquerades as extra persistence) - a parameter-level
     alarm, O(1) memory in t.

  PYTHONPATH=/root/repo python examples/serving_monitoring.py
"""

import os
import pathlib
import sys

import jax

if not os.environ.get("AESMC_EXAMPLE_TPU"):
    jax.config.update("jax_platforms", "cpu")
# No persistent cache on the CPU path: the root .jax_cache holds
# XLA:CPU AOT entries from rotated hosts (see CLAUDE.md cache hazard).

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from aesmc_tpu import forecast, online  # noqa: E402
from aesmc_tpu.models import lgssm  # noqa: E402

A_SERVED, OBS_BIAS, Q, EM, R0 = 0.9, 5.0, 1.0, 1.0, 0.25
T, SHIFT_AT, K = 240, 120, 2048


def main():
    key = jax.random.PRNGKey(0)

    # --- the stream: the sensor breaks at t = SHIFT_AT --------------
    def simulate():
        ks = jax.random.split(jax.random.PRNGKey(42), 2 * T + 1)
        x = float(jax.random.normal(ks[0]))
        xs, ys = [], []
        for t in range(T):
            if t > 0:
                x = A_SERVED * x + float(jax.random.normal(ks[2 * t]))
            xs.append(x)
            bias = 0.0 if t < SHIFT_AT else OBS_BIAS
            ys.append(EM * x + bias + np.sqrt(R0) * float(
                jax.random.normal(ks[2 * t + 1])))
        return np.asarray(xs), np.asarray(ys)

    _, ys = simulate()
    obs_stream = [jnp.asarray([y]) for y in ys]        # batch 1

    # --- the served model (never told about the shift) -------------
    initial = lgssm.Initial(0.0, 1.0)
    transition = lgssm.Transition.create(A_SERVED, np.sqrt(Q))
    emission = lgssm.Emission.create(EM, np.sqrt(R0))
    prec_t = 1.0 / Q + EM ** 2 / R0
    prec_0 = 1.0 + EM ** 2 / R0
    proposal = lgssm.Proposal(
        lin_0_weight=jnp.asarray((EM / R0) / prec_0),
        lin_0_bias=jnp.asarray(0.0),
        lin_t_weight=jnp.asarray([(A_SERVED / Q) / prec_t,
                                  (EM / R0) / prec_t]),
        lin_t_bias=jnp.asarray(0.0),
        scale_0=float(np.sqrt(1.0 / prec_0)),
        scale_t=float(np.sqrt(1.0 / prec_t)))

    # Streaming PaRIS: the two EM sufficient statistics at once.
    init_fn, step_fn = online.make_online_filter(
        initial, transition, emission, proposal, K,
        paris_h=lambda xp, xc, t: jnp.stack([xp * xc, xp * xp], -1),
        paris_h0=lambda x0: jnp.zeros(x0.shape + (2,)))
    jstep = jax.jit(step_fn, donate_argnums=0)
    jfc = jax.jit(lambda fs, k: forecast.forecast_online(
        fs, transition, emission, 1, k))

    keys = online.split_step_keys(key, T, num_streams=3)
    fkeys = jax.random.split(jax.random.PRNGKey(7), T)
    fs = init_fn(obs_stream[0], keys[0])
    log_preds, pits, a_hat = [], [], []
    for t in range(1, T):
        fc = jfc(fs, fkeys[t])
        pits.append(float(forecast.predictive_pit(
            fc["observations"][0], fs.log_weight, obs_stream[t])[0]))
        fs, info = jstep(fs, obs_stream[t], keys[t])
        log_preds.append(float(info["log_pred"][0]))
        s = np.asarray(info["paris_smoothed"][0])      # [2]
        a_hat.append(s[0] / max(s[1], 1e-9))

    log_preds, pits, a_hat = map(np.asarray, (log_preds, pits, a_hat))
    half = SHIFT_AT - 1

    def extreme(p):
        return float(np.mean((p < 0.05) | (p > 0.95)))

    print(f"served model: a = {A_SERVED}; sensor gains a +{OBS_BIAS} "
          f"bias at t = {SHIFT_AT} (T = {T}, K = {K})\n")
    print(f"{'window':>22} {'mean log_pred':>14} {'PIT mean':>9} "
          f"{'PIT extreme%':>13} {'EM a-hat':>9}")
    print(f"{'before shift':>22} {log_preds[:half].mean():>14.3f} "
          f"{pits[:half].mean():>9.3f} "
          f"{100 * extreme(pits[:half]):>12.1f}% "
          f"{a_hat[half - 1]:>9.3f}")
    print(f"{'after shift':>22} {log_preds[half:].mean():>14.3f} "
          f"{pits[half:].mean():>9.3f} "
          f"{100 * extreme(pits[half:]):>12.1f}% "
          f"{a_hat[-1]:>9.3f}")
    spike_t = int(np.argmin(log_preds)) + 1
    print(f"\nchangepoint spike: log_pred = {log_preds.min():.1f} at "
          f"t = {spike_t} (shift injected at t = {SHIFT_AT}; "
          f"pre-shift mean {log_preds[:half].mean():.2f})")


if __name__ == "__main__":
    main()
