"""State/shape algebra tests; ports the strategy of
/root/reference/test/test_state.py: batch-shape-mode inference grid with
expected ambiguity warnings, explicit-mode override, sample-shape grids,
statistical sanity, log-prob equivalence against manually expanded
distributions (incl. non-trivial event shapes), exact resampling, and
dict/pytree observation expansion."""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aesmc_tpu import distributions as dists
from aesmc_tpu import state
from aesmc_tpu.state import BatchShapeMode

KEY = jax.random.PRNGKey(0)


class TestBatchShapeMode:
    def test_inference_grid(self):
        batch_size, num_particles, dim1 = 2, 3, 4
        cases = [
            ((), BatchShapeMode.NOT_EXPANDED, False),
            ((batch_size,), BatchShapeMode.BATCH_EXPANDED, True),
            ((dim1,), BatchShapeMode.NOT_EXPANDED, False),
            ((batch_size, num_particles), BatchShapeMode.FULLY_EXPANDED,
             True),
            ((batch_size, dim1), BatchShapeMode.BATCH_EXPANDED, True),
            ((batch_size, num_particles, dim1),
             BatchShapeMode.FULLY_EXPANDED, True),
        ]
        for batch_shape, expected, ambiguous in cases:
            d = dists.Normal(jnp.zeros(batch_shape), jnp.ones(batch_shape))
            if ambiguous:
                with pytest.warns(RuntimeWarning):
                    assert state.get_batch_shape_mode(
                        d, batch_size, num_particles) == expected
            else:
                assert state.get_batch_shape_mode(
                    d, batch_size, num_particles) == expected

    def test_explicit_mode(self):
        batch_size, num_particles = 2, 3
        for mode in BatchShapeMode:
            d = state.set_batch_shape_mode(
                dists.Normal(jnp.zeros((batch_size, num_particles)),
                             jnp.ones((batch_size, num_particles))), mode)
            assert state.get_batch_shape_mode(
                d, batch_size, num_particles) == mode

    def test_explicit_mode_dict(self):
        d = state.set_batch_shape_mode(
            {"a": dists.Normal(0.0, 1.0), "b": dists.Normal(1.0, 2.0)},
            BatchShapeMode.NOT_EXPANDED)
        assert d["a"].batch_shape_mode == BatchShapeMode.NOT_EXPANDED


class TestSample:
    def test_shape_grid(self):
        for batch_size, num_particles in [(2, 2), (2, 3)]:
            for dims in [(), (4,), (4, 5)]:
                cases = [
                    (dims, (batch_size, num_particles) + dims, False),
                    ((batch_size,), (batch_size, num_particles), True),
                    ((batch_size, num_particles),
                     (batch_size, num_particles), True),
                    ((batch_size,) + dims,
                     (batch_size, num_particles) + dims, True),
                    ((batch_size, num_particles) + dims,
                     (batch_size, num_particles) + dims, True),
                ]
                for batch_shape, expected_shape, ambiguous in cases:
                    # Skip grid rows where inference would mis-classify due
                    # to coincidental shape equality (same as the reference
                    # grid, which only uses non-colliding dims).
                    d = dists.Normal(jnp.zeros(batch_shape),
                                     jnp.ones(batch_shape))
                    with warnings.catch_warnings():
                        warnings.simplefilter("ignore")
                        out = state.sample(d, batch_size, num_particles, KEY)
                    assert out.shape == expected_shape, (
                        batch_shape, expected_shape, out.shape)

    def test_explicit_modes_shapes(self):
        batch_size, num_particles, dim = 3, 4, 2
        d = state.set_batch_shape_mode(
            dists.Normal(jnp.zeros((dim,)), jnp.ones((dim,))),
            BatchShapeMode.NOT_EXPANDED)
        assert state.sample(d, batch_size, num_particles, KEY).shape == \
            (batch_size, num_particles, dim)

        d = state.set_batch_shape_mode(
            dists.Normal(jnp.zeros((batch_size, dim)),
                         jnp.ones((batch_size, dim))),
            BatchShapeMode.BATCH_EXPANDED)
        assert state.sample(d, batch_size, num_particles, KEY).shape == \
            (batch_size, num_particles, dim)

        d = state.set_batch_shape_mode(
            dists.Normal(jnp.zeros((batch_size, num_particles, dim)),
                         jnp.ones((batch_size, num_particles, dim))),
            BatchShapeMode.FULLY_EXPANDED)
        assert state.sample(d, batch_size, num_particles, KEY).shape == \
            (batch_size, num_particles, dim)

    def test_non_reparameterizable_samples_without_gradient(self):
        """DEVIATION from the reference's rsample-only raise: discrete
        proposals sample under stop_gradient (filtering-valid; train
        them with gradient_estimator='score')."""
        d = dists.Categorical.from_probs(jnp.asarray([0.5, 0.5]))
        out = state.sample(d, 2, 3, KEY)
        assert out.shape == (2, 3)
        assert jnp.issubdtype(out.dtype, jnp.integer)

        def f(p):
            # No pathwise gradient may leak through the draw.
            s = state.sample(dists.Normal(
                p, 1.0, batch_shape_mode=BatchShapeMode.NOT_EXPANDED,
                has_rsample=False), 1, 1, KEY)
            return jnp.sum(s)

        assert float(jax.grad(f)(jnp.asarray(0.5))) == 0.0

    def test_raw_array_passthrough(self):
        x = jnp.ones((2, 3))
        assert state.sample(x, 2, 3, KEY) is x

    def test_statistical_sanity(self):
        # Sample mean within 10 sigma of loc (reference
        # test_state.py:165-193).
        loc, scale = 5.0, 2.0
        batch_size, num_particles = 100, 100
        d = dists.Normal(loc, scale)
        out = state.sample(d, batch_size, num_particles, KEY)
        n = batch_size * num_particles
        assert abs(float(out.mean()) - loc) < 10 * scale / np.sqrt(n)

    def test_dict_sampling(self):
        d = {"x": dists.Normal(0.0, 1.0), "y": dists.Normal(1.0, 1.0)}
        out = state.sample(d, 2, 3, KEY)
        assert set(out.keys()) == {"x", "y"}
        assert out["x"].shape == (2, 3)
        # Distinct sub-keys: leaves must differ.
        assert not np.allclose(np.asarray(out["x"]),
                               np.asarray(out["y"] - 1.0))


class TestLogProb:
    def test_not_expanded_equivalence(self):
        batch_size, num_particles, dim = 2, 3, 4
        loc = np.random.randn(dim)
        d = dists.Normal(jnp.asarray(loc), 1.0)
        value = jnp.asarray(np.random.randn(batch_size, num_particles, dim))
        out = state.log_prob(d, value)
        manual = np.asarray(d.log_prob(value)).sum(-1)
        assert out.shape == (batch_size, num_particles)
        np.testing.assert_allclose(np.asarray(out), manual, atol=1e-6)

    def test_batch_expanded_equivalence(self):
        batch_size, num_particles = 2, 3
        loc = np.random.randn(batch_size)
        d = state.set_batch_shape_mode(
            dists.Normal(jnp.asarray(loc), 1.0),
            BatchShapeMode.BATCH_EXPANDED)
        value = np.random.randn(batch_size, num_particles)
        out = state.log_prob(d, jnp.asarray(value))
        expanded = dists.Normal(jnp.asarray(loc)[:, None], 1.0)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(expanded.log_prob(value)), atol=1e-6)

    def test_fully_expanded(self):
        batch_size, num_particles = 2, 3
        loc = np.random.randn(batch_size, num_particles)
        d = dists.Normal(jnp.asarray(loc), 1.0)
        value = np.random.randn(batch_size, num_particles)
        out = state.log_prob(d, jnp.asarray(value))
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(d.log_prob(value)), atol=1e-6)

    def test_event_shape_one_hot(self):
        # Non-trivial event shape (reference test_state.py:196-268).
        batch_size, num_particles, k = 2, 3, 5
        logits = np.random.randn(batch_size, num_particles, k)
        d = dists.OneHotCategorical(jnp.asarray(logits))
        value = jax.nn.one_hot(
            jnp.asarray(np.random.randint(0, k,
                                          (batch_size, num_particles))), k)
        out = state.log_prob(d, value)
        assert out.shape == (batch_size, num_particles)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(d.log_prob(value)), atol=1e-6)

    def test_dict_log_prob_sums(self):
        # The reference crashes on dict log_prob (state.py:129-132); here
        # it must work and equal the sum of components.
        batch_size, num_particles = 2, 3
        d = {"a": dists.Normal(0.0, 1.0), "b": dists.Normal(2.0, 0.5)}
        value = {
            "a": jnp.asarray(np.random.randn(batch_size, num_particles)),
            "b": jnp.asarray(np.random.randn(batch_size, num_particles)),
        }
        out = state.log_prob(d, value)
        expected = np.asarray(state.log_prob(d["a"], value["a"])) + \
            np.asarray(state.log_prob(d["b"], value["b"]))
        np.testing.assert_allclose(np.asarray(out), expected, atol=1e-6)


class TestResample:
    def test_exact_small_case(self):
        value = jnp.asarray([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]])
        idx = jnp.asarray([[0, 2, 1], [2, 2, 0]])
        out = state.resample(value, idx)
        np.testing.assert_array_equal(
            np.asarray(out), np.array([[1.0, 3.0, 2.0], [6.0, 6.0, 4.0]]))

    def test_trailing_dims(self):
        value = jnp.asarray(np.arange(2 * 3 * 4).reshape(2, 3, 4))
        idx = jnp.asarray([[2, 2, 2], [0, 0, 0]])
        out = state.resample(value, idx)
        expected = np.stack([
            np.tile(np.asarray(value)[0, 2], (3, 1)),
            np.tile(np.asarray(value)[1, 0], (3, 1)),
        ])
        np.testing.assert_array_equal(np.asarray(out), expected)

    def test_pytree(self):
        value = {"x": jnp.asarray([[1.0, 2.0]]),
                 "y": jnp.asarray([[[1.0, 1.0], [2.0, 2.0]]])}
        idx = jnp.asarray([[1, 1]])
        out = state.resample(value, idx)
        np.testing.assert_array_equal(np.asarray(out["x"]),
                                      np.array([[2.0, 2.0]]))
        np.testing.assert_array_equal(
            np.asarray(out["y"]), np.array([[[2.0, 2.0], [2.0, 2.0]]]))


class TestExpandObservation:
    def test_array(self):
        obs = jnp.asarray(np.random.randn(3, 4))
        out = state.expand_observation(obs, 5)
        assert out.shape == (3, 5, 4)
        np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(obs))
        np.testing.assert_allclose(np.asarray(out[:, 4]), np.asarray(obs))

    def test_dict(self):
        obs = {"a": jnp.zeros((3,)), "b": jnp.zeros((3, 2))}
        out = state.expand_observation(obs, 4)
        assert out["a"].shape == (3, 4)
        assert out["b"].shape == (3, 4, 2)
