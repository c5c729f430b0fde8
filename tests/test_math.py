"""L0 numerics tests; mirrors /root/reference/test/test_math.py strategy:
dimension preservation, hand-computed values at atol 1e-6."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aesmc_tpu import math as amath


class TestLognormexp:
    def test_dimensions_and_type(self):
        for shape in [(5,), (3, 4), (2, 3, 4)]:
            for dim in range(len(shape)):
                values = np.random.randn(*shape)
                out = amath.lognormexp(values, dim=dim)
                assert out.shape == shape

    def test_values_f64(self):
        # Exact-value check in double precision (atol 1e-6, the
        # reference's tolerance at test_math.py:51-64).
        with jax.enable_x64(True):
            test_input = np.array([1.0, 2.0, 3.0])
            temp = np.exp(1) + np.exp(2) + np.exp(3)
            expected = np.log(np.exp(test_input) / temp)
            out = amath.lognormexp(jnp.asarray(test_input), dim=0)
            np.testing.assert_allclose(np.asarray(out), expected, atol=1e-6)

    def test_values_f32(self):
        # Single precision: this backend's exp/log are ~5e-5 accurate.
        test_input = [1.0, 2.0, 3.0]
        temp = np.exp(1) + np.exp(2) + np.exp(3)
        expected = np.log(np.exp(test_input) / temp)
        out = amath.lognormexp(jnp.asarray(test_input), dim=0)
        np.testing.assert_allclose(np.asarray(out), expected, atol=1e-3)

    def test_normalization(self):
        values = np.random.randn(4, 7) * 10
        out = amath.lognormexp(values, dim=1)
        sums = np.exp(np.asarray(out)).sum(axis=1)
        np.testing.assert_allclose(sums, np.ones(4), atol=1e-4)

    def test_extreme_values_stable(self):
        values = jnp.array([1e6, 1e6 + 1.0, 1e6 - 1.0])
        out = amath.lognormexp(values, dim=0)
        assert bool(jnp.all(jnp.isfinite(out)))


class TestExponentiateAndNormalize:
    def test_dimensions(self):
        values = np.random.randn(2, 3, 4)
        for dim in range(3):
            out = amath.exponentiate_and_normalize(values, dim=dim)
            assert out.shape == (2, 3, 4)

    def test_values_f64(self):
        with jax.enable_x64(True):
            test_input = np.array([1.0, 2.0, 3.0])
            temp = np.exp(1) + np.exp(2) + np.exp(3)
            expected = np.exp(test_input) / temp
            out = amath.exponentiate_and_normalize(
                jnp.asarray(test_input), dim=0)
            np.testing.assert_allclose(np.asarray(out), expected, atol=1e-6)

    def test_shift_invariance(self):
        # Use an exactly-representable shift (f32 at 1e6 rounds the inputs
        # themselves); ESS shift invariance at +-1e6 is tested separately
        # in test_statistics (it cancels analytically there).
        values = np.random.randn(6).astype(np.float32)
        a = amath.exponentiate_and_normalize(values)
        b = amath.exponentiate_and_normalize(values + 64.0)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


class TestDistributedLogsumexp:
    def test_matches_local(self):
        from jax.sharding import Mesh, PartitionSpec as P
        from jax.experimental.shard_map import shard_map

        devices = np.array(jax.devices()[:4])
        mesh = Mesh(devices, ("particle",))
        values = jnp.asarray(np.random.randn(8, 128))

        @jax.jit
        def distributed(values):
            def f(v):
                return amath.distributed_logsumexp(v, "particle", axis=1)
            return shard_map(f, mesh=mesh, in_specs=P(None, "particle"),
                             out_specs=P(None))(values)

        expected = jax.nn.logsumexp(values, axis=1)
        np.testing.assert_allclose(np.asarray(distributed(values)),
                                   np.asarray(expected), atol=1e-5)


class TestTableLookup:
    """Round-5 public helper: one-hot masked-sum `table[idx]` for small
    tables (the TPU-fast route behind the HMM/discrete fixes)."""

    def test_matches_plain_gather_all_ranks(self):
        key = jax.random.PRNGKey(0)
        idx = jax.random.randint(key, (3, 7), 0, 5)
        for trailing in [(), (4,), (2, 3)]:
            table = jax.random.normal(jax.random.PRNGKey(1),
                                      (5,) + trailing)
            out = amath.table_lookup(table, idx)
            np.testing.assert_array_equal(np.asarray(out),
                                          np.asarray(table[idx]))

    def test_int_table_dtype_preserved(self):
        table = jnp.asarray([[3, -7], [100, 0], [5, 5]], jnp.int32)
        idx = jnp.asarray([[0, 2, 1]])
        out = amath.table_lookup(table, idx)
        assert out.dtype == jnp.int32
        np.testing.assert_array_equal(np.asarray(out),
                                      np.asarray(table[idx]))

    def test_threshold_falls_back(self):
        table = jax.random.normal(jax.random.PRNGKey(2), (5, 2))
        idx = jnp.asarray([[4, 0]])
        out = amath.table_lookup(table, idx, threshold=0)
        np.testing.assert_array_equal(np.asarray(out),
                                      np.asarray(table[idx]))

    def test_index_semantics_match_plain_gather(self):
        """Round-5 review fix: the masked-sum path matches `table[idx]`'s
        traced-index semantics (one negative wrap, then clamp) instead
        of silently returning 0 for out-of-range indices."""
        table = jnp.asarray([10.0, 20.0, 30.0])
        idx = jnp.asarray([[-1, 5, -5, 0, 2]])
        out = amath.table_lookup(table, idx)
        np.testing.assert_array_equal(np.asarray(out),
                                      np.asarray(table[idx]))

    def test_small_int_and_bool_dtypes_preserved(self):
        """Round-5 review fix: jnp.sum promotes int8/bool accumulators;
        the helper casts back, matching the d>threshold fallback."""
        for dtype in (jnp.int8, jnp.int16, jnp.uint8, jnp.bool_):
            table = jnp.asarray([1, 0, 1], jnp.int32).astype(dtype)
            idx = jnp.asarray([[2, 0], [1, 1]])
            out = amath.table_lookup(table, idx)
            assert out.dtype == table.dtype, dtype
            np.testing.assert_array_equal(np.asarray(out),
                                          np.asarray(table[idx]))
