"""Predictive forecasting (aesmc_tpu.forecast) vs exact Kalman
predictive moments, plus PIT calibration on on-model data."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aesmc_tpu import forecast, inference, online, statistics
from aesmc_tpu.models import kalman, lgssm

A, Q, EM, R0 = 0.9, 1.0, 1.0, 0.25
T, B, K = 25, 2, 4096


def _components():
    initial = lgssm.Initial(0.0, 1.0)
    transition = lgssm.Transition.create(A, np.sqrt(Q))
    emission = lgssm.Emission.create(EM, np.sqrt(R0))
    prec_t = 1.0 / Q + EM ** 2 / R0
    prec_0 = 1.0 + EM ** 2 / R0
    proposal = lgssm.Proposal(
        lin_0_weight=jnp.asarray((EM / R0) / prec_0),
        lin_0_bias=jnp.asarray(0.0),
        lin_t_weight=jnp.asarray([(A / Q) / prec_t, (EM / R0) / prec_t]),
        lin_t_bias=jnp.asarray(0.0),
        scale_0=float(np.sqrt(1.0 / prec_0)),
        scale_t=float(np.sqrt(1.0 / prec_t)))
    return initial, transition, emission, proposal


def _params():
    return kalman.KalmanParams(0.0, 1.0, A, 0.0, Q, EM, 0.0, R0)


@functools.lru_cache(maxsize=1)
def _filter_cloud():
    comps = _components()
    _, obs = statistics.sample_from_prior(comps[0], comps[1], comps[2],
                                          T, B, jax.random.PRNGKey(5))
    out = inference.infer("smc", obs, *comps, K,
                          key=jax.random.PRNGKey(6), return_latents=True,
                          return_log_weight=True)
    return comps, obs, out


class TestMoments:
    def test_matches_kalman_predictive(self):
        """h-step latent/observation predictive means and variances vs
        the exact Kalman recursion, h = 1..5."""
        comps, obs, out = _filter_cloud()
        last_latent = out["latents"][-1]
        fc = forecast.forecast(
            last_latent, out["log_weight"], comps[1], comps[2],
            horizon=5, key=jax.random.PRNGKey(7), start_time=T - 1)
        w = np.asarray(jax.nn.softmax(out["log_weight"], axis=1))
        lat = np.asarray(fc["latents"])                  # [5, B, K]
        ob = np.asarray(fc["observations"])
        for b in range(B):
            fm, fv = kalman.kalman_filter(
                np.asarray(obs[:, b], np.float64), _params())[:2]
            m, v = fm[-1], fv[-1]
            for h in range(5):
                m = A * m
                v = A * A * v + Q
                pm = float((w[b] * lat[h, b]).sum())
                pv = float((w[b] * (lat[h, b] - pm) ** 2).sum())
                assert abs(pm - m) < 0.12, (h, b, pm, m)
                assert abs(pv - v) / v < 0.1, (h, b, pv, v)
                om = float((w[b] * ob[h, b]).sum())
                ov = float((w[b] * (ob[h, b] - om) ** 2).sum())
                assert abs(om - EM * m) < 0.15, (h, b, om)
                exact_ov = EM * EM * v + R0
                assert abs(ov - exact_ov) / exact_ov < 0.1, (h, b, ov)

    def test_jittable_and_shapes(self):
        comps, obs, out = _filter_cloud()

        @jax.jit
        def run(lat, lw, key):
            return forecast.forecast(lat, lw, comps[1], comps[2], 3,
                                     key, start_time=T - 1)

        fc = run(out["latents"][-1], out["log_weight"],
                 jax.random.PRNGKey(8))
        assert fc["latents"].shape == (3, B, K)
        assert fc["observations"].shape == (3, B, K)
        assert np.all(np.isfinite(np.asarray(fc["latents"])))

    def test_horizon_validation(self):
        comps, obs, out = _filter_cloud()
        with pytest.raises(ValueError, match="horizon"):
            forecast.forecast(out["latents"][-1], out["log_weight"],
                              comps[1], comps[2], 0,
                              jax.random.PRNGKey(0), start_time=T - 1)


class TestQuantiles:
    def test_exact_on_known_weights(self):
        vals = jnp.asarray([[3.0, 1.0, 2.0]])
        lw = jnp.log(jnp.asarray([[0.2, 0.5, 0.3]]))
        q = forecast.weighted_quantiles(vals, lw, [0.25, 0.5, 0.9, 0.99])
        # sorted: 1.0 (w .5), 2.0 (w .3 -> cum .8), 3.0 (cum 1.0)
        np.testing.assert_allclose(np.asarray(q)[0],
                                   [1.0, 1.0, 3.0, 3.0])

    def test_monotone_and_bracketing(self):
        comps, obs, out = _filter_cloud()
        fc = forecast.forecast(out["latents"][-1], out["log_weight"],
                               comps[1], comps[2], 1,
                               jax.random.PRNGKey(9), start_time=T - 1)
        q = np.asarray(forecast.weighted_quantiles(
            fc["observations"][0], out["log_weight"],
            [0.05, 0.5, 0.95]))
        assert np.all(q[:, 0] <= q[:, 1]) and np.all(q[:, 1] <= q[:, 2])
        # 90% interval has nontrivial width at this noise level
        assert np.all(q[:, 2] - q[:, 0] > 1.0)


class TestCalibration:
    def test_pit_uniform_on_model(self):
        """One-step PIT values collected along an on-model run are
        ~Uniform(0,1): mean 0.5, std 0.289 (MC tolerances)."""
        comps, obs, _ = _filter_cloud()
        init_fn, step_fn = online.make_online_filter(*comps, 512)
        keys = online.split_step_keys(jax.random.PRNGKey(1), T)
        fs = init_fn(obs[0], keys[0])
        pits = []
        fkeys = jax.random.split(jax.random.PRNGKey(2), T)
        for t in range(1, T):
            fc = forecast.forecast_online(fs, comps[1], comps[2], 1,
                                          fkeys[t])
            pits.append(np.asarray(forecast.predictive_pit(
                fc["observations"][0], fs.log_weight, obs[t])))
            fs, _ = step_fn(fs, obs[t], keys[t])
        pits = np.concatenate(pits)                  # [(T-1) * B]
        assert 0.38 < pits.mean() < 0.62, pits.mean()
        assert 0.21 < pits.std() < 0.37, pits.std()
        assert pits.min() >= 0.0 and pits.max() <= 1.0

    def test_pit_detects_misspecification(self):
        """A filter whose model under-disperses (0.3x the true
        transition noise) yields PIT mass at the extremes - the
        serving alarm. (An under-dispersed EMISSION barely moves the
        one-step predictive here - transition noise dominates it -
        measured extreme-fraction 0.17 vs 0.60 for this case.)"""
        comps, obs, _ = _filter_cloud()
        bad_transition = lgssm.Transition.create(A, 0.3 * np.sqrt(Q))
        bad = (comps[0], bad_transition, comps[2], comps[3])
        init_fn, step_fn = online.make_online_filter(*bad, 512)
        keys = online.split_step_keys(jax.random.PRNGKey(1), T)
        fs = init_fn(obs[0], keys[0])
        pits = []
        fkeys = jax.random.split(jax.random.PRNGKey(2), T)
        for t in range(1, T):
            fc = forecast.forecast_online(fs, bad[1], bad[2], 1,
                                          fkeys[t])
            pits.append(np.asarray(forecast.predictive_pit(
                fc["observations"][0], fs.log_weight, obs[t])))
            fs, _ = step_fn(fs, obs[t], keys[t])
        pits = np.concatenate(pits)
        extreme = np.mean((pits < 0.05) | (pits > 0.95))
        assert extreme > 0.25, extreme  # uniform would give ~0.10


class TestDiscrete:
    def test_hmm_forecast_rolls_integer_particles(self):
        from aesmc_tpu.models import hmm
        comps = hmm.make_model(num_states=3)
        _, obs = statistics.sample_from_prior(
            comps[0], comps[1], comps[2], 10, 2, jax.random.PRNGKey(3))
        out = inference.infer("smc", obs, *comps, 256,
                              key=jax.random.PRNGKey(4),
                              return_latents=True, return_log_weight=True)
        fc = forecast.forecast(out["latents"][-1], out["log_weight"],
                               comps[1], comps[2], 4,
                               jax.random.PRNGKey(5), start_time=9)
        assert jnp.issubdtype(fc["latents"].dtype, jnp.integer)
        assert fc["latents"].shape == (4, 2, 256)
        # PIT midpoint convention stays in [0, 1] on discrete obs.
        pit = forecast.predictive_pit(fc["observations"][0],
                                      out["log_weight"], obs[-1])
        assert np.all((np.asarray(pit) >= 0) & (np.asarray(pit) <= 1))
