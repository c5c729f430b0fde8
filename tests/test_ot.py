"""Entropy-regularized OT resampling tests: marginal constraints, moment
preservation, degenerate limits, and differentiability in the weights
(the property discrete resampling lacks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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


class TestBlockedOT:
    """Streaming log-Sinkhorn: O(K * block) memory, matches dense."""

    def test_matches_dense_forward(self):
        k = 1024
        key = jax.random.PRNGKey(0)
        logw = jax.random.normal(key, (2, k))
        x = jax.random.normal(jax.random.PRNGKey(1), (2, k, 3))
        dense_t, dense_w = ot.ot_resample(logw, x, num_iterations=20)
        blk_t, blk_w = ot.ot_resample(logw, x, num_iterations=20,
                                      block_size=256)
        np.testing.assert_allclose(np.asarray(blk_t), np.asarray(dense_t),
                                   rtol=2e-3, atol=2e-4)
        np.testing.assert_array_equal(np.asarray(blk_w),
                                      np.asarray(dense_w))

    def test_gradients_match_dense(self):
        k = 1024
        key = jax.random.PRNGKey(0)
        logw = jax.random.normal(key, (1, k))
        x = jax.random.normal(jax.random.PRNGKey(1), (1, k, 2))

        def loss(impl_kwargs, lw, xx):
            t, _ = ot.ot_resample(lw, xx, num_iterations=10,
                                  **impl_kwargs)
            return jnp.sum(jnp.sin(t))

        gd_w, gd_x = jax.grad(loss, argnums=(1, 2))({}, logw, x)
        gb_w, gb_x = jax.grad(loss, argnums=(1, 2))(
            {"block_size": 256}, logw, x)
        np.testing.assert_allclose(np.asarray(gb_w), np.asarray(gd_w),
                                   rtol=5e-3, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gb_x), np.asarray(gd_x),
                                   rtol=5e-3, atol=1e-4)

    def test_large_k_compiles_under_memory_budget(self):
        # K = 65536: the dense kernel matrix alone would be 17 GB; the
        # blocked form must compile (CPU) with < 2 GB of temporaries,
        # including the rematerialized backward.
        k = 65536
        logw = jnp.zeros((1, k))
        x = jnp.zeros((1, k, 2))

        def loss(lw, xx):
            t, _ = ot.ot_resample(lw, xx, num_iterations=5,
                                  block_size=512)
            return jnp.sum(t)

        compiled = jax.jit(jax.grad(loss, argnums=(0, 1))).lower(
            logw, x).compile()
        temp = compiled.memory_analysis().temp_size_in_bytes
        assert temp < 2 * 1024 ** 3, f"temp bytes: {temp}"

    def test_auto_routing_threshold(self):
        # K > OT_DENSE_MAX_K routes to the blocked path automatically;
        # the auto block size picks a DIVISOR of K, so awkward K works
        # (round-2 review fix: 2048 blindly applied used to raise). An
        # explicit non-divisor block still raises clearly.
        k = ot.OT_DENSE_MAX_K + 512 + 1          # 4609 = 11 * 419
        logw = jnp.zeros((1, k))
        x = jax.random.normal(jax.random.PRNGKey(0), (1, k, 1))
        t, _ = ot.ot_resample(logw, x, num_iterations=1)
        assert bool(jnp.isfinite(t).all())
        with pytest.raises(ValueError, match="multiple of block_size"):
            ot.ot_resample(logw, x, num_iterations=1, block_size=2048)

    def test_uniform_weights_near_identity(self):
        # Uniform weights, tiny epsilon: transport ~ identity.
        k = 512
        x = jax.random.normal(jax.random.PRNGKey(2), (1, k, 2))
        t, _ = ot.ot_resample(jnp.zeros((1, k)), x, epsilon=0.01,
                              num_iterations=100, block_size=128)
        err = float(jnp.max(jnp.abs(t - x)))
        assert err < 0.35, err


def test_blocked_auto_handles_non_divisible_k():
    """Round-2 review fix: auto block size must divide K (K=10000 is not
    a multiple of the swept-optimal 2048; the auto picker now takes the
    largest divisor <= 2048)."""
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 10000))
    lw = jax.random.normal(jax.random.PRNGKey(1), (2, 10000))
    out, new_lw = ot.ot_resample(lw, x, num_iterations=2)
    assert bool(jnp.isfinite(out).all())
    assert out.shape == x.shape and new_lw.shape == lw.shape
