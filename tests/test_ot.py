"""Entropy-regularized OT resampling tests: marginal constraints, moment
preservation, degenerate limits, and differentiability in the weights
(the property discrete resampling lacks)."""

import jax
import jax.numpy as jnp
import numpy as np

from aesmc_tpu import ot

KEY = jax.random.PRNGKey(0)


class TestSinkhorn:
    def test_marginals(self):
        rng = np.random.RandomState(0)
        B, K = 2, 32
        logw = jnp.asarray(rng.randn(B, K).astype(np.float32))
        x = jnp.asarray(rng.randn(B, K, 1).astype(np.float32))
        sq = jnp.sum(x * x, -1)
        cost = sq[:, :, None] + sq[:, None, :] - \
            2 * jnp.einsum("bkd,bld->bkl", x, x)
        f, g = ot.sinkhorn_potentials(logw, cost, 0.5, 200)
        plan = jnp.exp((f[:, :, None] + g[:, None, :] - cost) / 0.5)
        row = np.asarray(plan.sum(2))
        col = np.asarray(plan.sum(1))
        np.testing.assert_allclose(row, np.asarray(
            jax.nn.softmax(logw, -1)), atol=1e-3)
        np.testing.assert_allclose(col, np.full((B, K), 1.0 / K), atol=1e-3)


class TestOtResample:
    def test_preserves_weighted_mean(self):
        rng = np.random.RandomState(1)
        B, K = 3, 64
        logw = jnp.asarray(rng.randn(B, K).astype(np.float32))
        x = jnp.asarray(rng.randn(B, K).astype(np.float32))
        transported, new_logw = ot.ot_resample(logw, x, epsilon=0.2,
                                               num_iterations=200)
        w = np.asarray(jax.nn.softmax(logw, -1))
        weighted_mean = (w * np.asarray(x)).sum(-1)
        uniform_mean = np.asarray(transported).mean(-1)
        np.testing.assert_allclose(uniform_mean, weighted_mean, atol=5e-3)
        np.testing.assert_array_equal(np.asarray(new_logw),
                                      np.zeros((B, K)))

    def test_uniform_weights_near_identity(self):
        # With uniform weights and small epsilon, transport ~ identity.
        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.randn(1, 32).astype(np.float32)) * 3
        logw = jnp.zeros((1, 32))
        transported, _ = ot.ot_resample(logw, x, epsilon=0.01,
                                        num_iterations=300)
        # Entropic OT blurs within ~sqrt(eps * mean cost); require the
        # transport to track the originals tightly, not exactly.
        t, x_np = np.asarray(transported), np.asarray(x)
        np.testing.assert_allclose(t, x_np, atol=0.25)
        corr = np.corrcoef(t.ravel(), x_np.ravel())[0, 1]
        assert corr > 0.995, corr

    def test_pytree_particles(self):
        rng = np.random.RandomState(3)
        value = {"a": jnp.asarray(rng.randn(2, 16).astype(np.float32)),
                 "b": jnp.asarray(rng.randn(2, 16, 3).astype(np.float32))}
        logw = jnp.asarray(rng.randn(2, 16).astype(np.float32))
        out, _ = ot.ot_resample(logw, value)
        assert out["a"].shape == (2, 16)
        assert out["b"].shape == (2, 16, 3)

    def test_differentiable_in_weights(self):
        rng = np.random.RandomState(4)
        x = jnp.asarray(rng.randn(1, 24).astype(np.float32))

        def objective(logw):
            transported, _ = ot.ot_resample(logw, x, epsilon=0.3,
                                            num_iterations=60)
            return jnp.sum(transported ** 2)

        g = jax.grad(objective)(jnp.asarray(
            rng.randn(1, 24).astype(np.float32)))
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).sum() > 0
