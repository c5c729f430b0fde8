"""Replay audit: recompute an SMC run's internals in float64 numpy.

The statistical tests check distributions; this checks the ENGINE's
arithmetic composition exactly. `infer` returns every artifact of a run
(original latents, ancestor indices, per-step weights, lineage latents,
log-Z); given the scalar-LGSSM densities, each quantity satisfies exact
identities that an independent numpy implementation can verify:

  w_t  = N(x_t; a*resampled_{t-1}, q) + N(y_t; c*x_t, r) - proposal lp
  Z    = sum_t [logsumexp_k(w_t) - log K]
  lineage = backward composition of ancestor maps
  ancestors = valid systematic counts (|count_i - K*w_i| < 1 per row)

Tolerance 1e-4 (f32 engine vs f64 replay; the north-star numeric bar of
SURVEY/BASELINE is 1e-5 on matched precision - the engine's own math is
bitwise-deterministic, the gap here is only f32 evaluation).
"""

import jax
import jax.numpy as jnp
import numpy as np

from aesmc_tpu import inference, statistics
from aesmc_tpu.models import lgssm

KEY = jax.random.PRNGKey(7)

A, Q_SCALE = 0.9, 1.0
C, R_SCALE = 1.0, 0.3
T, B, K = 12, 3, 16


def _logpdf(x, loc, scale):
    z = (x - loc) / scale
    return -0.5 * z * z - np.log(scale) - 0.5 * np.log(2 * np.pi)


class Bootstrap:
    def __call__(self, previous_latents=None, time=None, observations=None):
        from aesmc_tpu import distributions as dists
        from aesmc_tpu.state import BatchShapeMode
        if time == 0:
            return dists.Normal(0.0, 1.0)
        return dists.Normal(A * previous_latents[-1], Q_SCALE,
                            batch_shape_mode=BatchShapeMode.FULLY_EXPANDED)


def _run():
    initial = lgssm.Initial(0.0, 1.0)
    transition = lgssm.Transition.create(A, Q_SCALE)
    emission = lgssm.Emission.create(C, R_SCALE)
    _, obs = statistics.sample_from_prior(initial, transition, emission,
                                          T, B, KEY)
    result = inference.infer(
        "smc", obs, initial, transition, emission, Bootstrap(), K, key=KEY,
        return_log_marginal_likelihood=True, return_original_latents=True,
        return_log_weights=True, return_ancestral_indices=True)
    return np.asarray(obs, np.float64), {
        k: (np.asarray(v, np.float64 if v.dtype != np.int32 else np.int64)
            if v is not None else None)
        for k, v in result.items()}


class TestReplayAudit:
    def setup_method(self):
        self.obs, self.r = _run()

    def test_weights_replay(self):
        x = self.r["original_latents"]          # [T, B, K]
        anc = self.r["ancestral_indices"]       # [T-1, B, K]
        logw = self.r["log_weights"]            # [T, B, K]
        # t = 0: bootstrap proposal == prior => w_0 = emission only.
        w0 = _logpdf(self.obs[0][:, None], C * x[0], R_SCALE)
        np.testing.assert_allclose(logw[0], w0, atol=1e-4)
        for t in range(1, T):
            prev = np.take_along_axis(x[t - 1], anc[t - 1], axis=1)
            trans = _logpdf(x[t], A * prev, Q_SCALE)
            emis = _logpdf(self.obs[t][:, None], C * x[t], R_SCALE)
            prop = _logpdf(x[t], A * prev, Q_SCALE)  # bootstrap
            np.testing.assert_allclose(logw[t], trans + emis - prop,
                                       atol=1e-4)

    def test_log_marginal_likelihood_replay(self):
        logw = self.r["log_weights"]
        m = logw.max(axis=2, keepdims=True)
        lse = np.log(np.exp(logw - m).sum(axis=2)) + m[:, :, 0]
        z = (lse - np.log(K)).sum(axis=0)
        np.testing.assert_allclose(self.r["log_marginal_likelihood"], z,
                                   atol=1e-4)

    def test_lineage_replay(self):
        x = self.r["original_latents"]
        anc = self.r["ancestral_indices"].astype(np.int64)
        lineage = self.r["latents"]
        idx = np.tile(np.arange(K), (B, 1))
        expect = np.empty_like(x)
        for t in range(T - 1, -1, -1):
            expect[t] = np.take_along_axis(x[t], idx, axis=1)
            if t > 0:
                idx = np.take_along_axis(anc[t - 1], idx, axis=1)
        np.testing.assert_allclose(lineage, expect, atol=0)

    def test_ancestors_are_valid_systematic(self):
        logw = self.r["log_weights"]
        anc = self.r["ancestral_indices"].astype(np.int64)
        for t in range(T - 1):
            w = np.exp(logw[t] - logw[t].max(axis=1, keepdims=True))
            w = w / w.sum(axis=1, keepdims=True)
            for b in range(B):
                counts = np.bincount(anc[t, b], minlength=K)
                assert np.all(np.abs(counts - K * w[b]) < 1 + 1e-3), (t, b)
                # systematic output indices are nondecreasing
                assert np.all(np.diff(anc[t, b]) >= 0)

    def test_last_latent_matches(self):
        np.testing.assert_allclose(self.r["last_latent"],
                                   self.r["original_latents"][-1], atol=0)
