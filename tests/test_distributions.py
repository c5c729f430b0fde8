"""Distribution library tests: shapes, closed-form log-probs, rsample
gradients, pytree behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats

from aesmc_tpu import distributions as dists

KEY = jax.random.PRNGKey(0)


class TestNormal:
    def test_shapes(self):
        d = dists.Normal(jnp.zeros((2, 3)), jnp.ones((2, 3)))
        assert d.batch_shape == (2, 3)
        assert d.event_shape == ()
        assert d.sample(KEY).shape == (2, 3)
        assert d.sample(KEY, (5,)).shape == (5, 2, 3)
        assert d.log_prob(jnp.zeros((5, 2, 3))).shape == (5, 2, 3)

    def test_broadcasting(self):
        d = dists.Normal(jnp.zeros((4,)), 2.0)
        assert d.batch_shape == (4,)
        assert d.sample(KEY, (2, 3)).shape == (2, 3, 4)

    def test_log_prob_values(self):
        locs = np.array([0.0, 1.5, -2.0])
        scales = np.array([1.0, 0.5, 3.0])
        xs = np.array([0.3, -1.2, 4.0])
        d = dists.Normal(jnp.asarray(locs), jnp.asarray(scales))
        np.testing.assert_allclose(
            np.asarray(d.log_prob(jnp.asarray(xs))),
            scipy.stats.norm.logpdf(xs, locs, scales), atol=1e-4)

    def test_rsample_gradient(self):
        def f(loc):
            d = dists.Normal(loc, 2.0)
            return jnp.sum(d.rsample(KEY, (100,)))
        g = jax.grad(f)(jnp.asarray(1.0))
        np.testing.assert_allclose(float(g), 100.0, atol=1e-4)

    def test_sample_statistics(self):
        d = dists.Normal(3.0, 2.0)
        x = np.asarray(d.sample(KEY, (200000,)))
        np.testing.assert_allclose(x.mean(), 3.0, atol=0.05)
        np.testing.assert_allclose(x.std(), 2.0, atol=0.05)


class TestMultivariateNormalDiag:
    def test_shapes_and_values(self):
        loc = np.random.randn(2, 5)
        scale = np.abs(np.random.randn(2, 5)) + 0.1
        d = dists.MultivariateNormalDiag(jnp.asarray(loc), jnp.asarray(scale))
        assert d.batch_shape == (2,)
        assert d.event_shape == (5,)
        x = np.random.randn(2, 5)
        expected = scipy.stats.norm.logpdf(x, loc, scale).sum(-1)
        np.testing.assert_allclose(
            np.asarray(d.log_prob(jnp.asarray(x))), expected, atol=1e-4)


class TestIndependent:
    def test_matches_sum(self):
        base = dists.Normal(jnp.zeros((2, 3, 4)), jnp.ones((2, 3, 4)))
        d = dists.Independent(base, 2)
        assert d.batch_shape == (2,)
        assert d.event_shape == (3, 4)
        x = jnp.asarray(np.random.randn(2, 3, 4))
        np.testing.assert_allclose(
            np.asarray(d.log_prob(x)),
            np.asarray(base.log_prob(x)).sum((-1, -2)), atol=1e-4)


class TestCategorical:
    def test_log_prob(self):
        probs = np.array([[0.2, 0.3, 0.5], [0.6, 0.3, 0.1]])
        d = dists.Categorical.from_probs(jnp.asarray(probs))
        value = jnp.asarray([2, 0])
        np.testing.assert_allclose(
            np.asarray(d.log_prob(value)),
            np.log(np.array([0.5, 0.6])), atol=1e-4)

    def test_log_prob_broadcasts_scalar_batch_to_batched_value(self):
        # Regression: an untagged scalar-batch Categorical scored at
        # [B, K] samples raised a take_along_axis rank mismatch.
        probs = np.array([0.2, 0.3, 0.5])
        d = dists.Categorical.from_probs(jnp.asarray(probs))
        value = jnp.asarray([[0, 1], [2, 2]])
        np.testing.assert_allclose(
            np.asarray(d.log_prob(value)),
            np.log(np.array([[0.2, 0.3], [0.5, 0.5]])), atol=1e-4)

    def test_sampler_marginals(self):
        probs = np.array([0.2, 0.3, 0.5])
        d = dists.Categorical.from_probs(jnp.asarray(probs))
        x = np.asarray(d.sample(KEY, (20000,)))
        emp = np.bincount(x, minlength=3) / 20000
        np.testing.assert_allclose(emp, probs, atol=2e-2)

    def test_not_reparameterizable(self):
        d = dists.Categorical.from_probs(jnp.asarray([0.5, 0.5]))
        assert not d.has_rsample
        try:
            d.rsample(KEY)
            raised = False
        except ValueError:
            raised = True
        assert raised


class TestOneHotCategorical:
    def test_shapes_and_log_prob(self):
        probs = np.array([[0.2, 0.8], [0.7, 0.3]])
        d = dists.OneHotCategorical.from_probs(jnp.asarray(probs))
        assert d.batch_shape == (2,)
        assert d.event_shape == (2,)
        x = jnp.asarray([[0.0, 1.0], [1.0, 0.0]])
        np.testing.assert_allclose(
            np.asarray(d.log_prob(x)),
            np.log(np.array([0.8, 0.7])), atol=1e-4)
        s = d.sample(KEY, (7,))
        assert s.shape == (7, 2, 2)
        np.testing.assert_allclose(np.asarray(s.sum(-1)), np.ones((7, 2)))


class TestBernoulli:
    def test_log_prob(self):
        d = dists.Bernoulli.from_probs(jnp.asarray([0.2, 0.9]))
        np.testing.assert_allclose(
            np.asarray(d.log_prob(jnp.asarray([1.0, 0.0]))),
            np.log(np.array([0.2, 0.1])), atol=1e-4)


class TestUniform:
    def test_log_prob_and_sample(self):
        d = dists.Uniform(1.0, 3.0)
        np.testing.assert_allclose(float(d.log_prob(jnp.asarray(2.0))),
                                   -np.log(2.0), atol=1e-4)
        assert float(d.log_prob(jnp.asarray(5.0))) == -np.inf
        x = np.asarray(d.sample(KEY, (10000,)))
        assert (x >= 1.0).all() and (x < 3.0).all()


class TestPytree:
    def test_distributions_are_pytrees(self):
        d = dists.Normal(jnp.zeros((2,)), jnp.ones((2,)))
        leaves = jax.tree_util.tree_leaves(d)
        assert len(leaves) == 2

        @jax.jit
        def f(d):
            return d.log_prob(jnp.zeros((2,)))

        np.testing.assert_allclose(
            np.asarray(f(d)),
            scipy.stats.norm.logpdf(np.zeros(2)), atol=1e-4)

    def test_mode_is_static(self):
        from aesmc_tpu.state import BatchShapeMode
        d = dists.Normal(jnp.zeros((2,)), 1.0,
                         batch_shape_mode=BatchShapeMode.FULLY_EXPANDED)
        d2 = jax.tree_util.tree_map(lambda x: x, d)
        assert d2.batch_shape_mode == BatchShapeMode.FULLY_EXPANDED


class TestLaplace:
    def test_log_prob_and_stats(self):
        d = dists.Laplace(1.0, 2.0)
        np.testing.assert_allclose(
            float(d.log_prob(jnp.asarray(1.5))),
            scipy.stats.laplace.logpdf(1.5, 1.0, 2.0), atol=1e-4)
        x = np.asarray(d.sample(KEY, (100000,)))
        np.testing.assert_allclose(x.mean(), 1.0, atol=0.05)
        np.testing.assert_allclose(x.var(), 2 * 2.0 ** 2, rtol=0.05)

    def test_rsample_gradient(self):
        g = jax.grad(lambda loc: jnp.mean(
            dists.Laplace(loc, 1.0).rsample(KEY, (256,))))(jnp.asarray(0.0))
        np.testing.assert_allclose(float(g), 1.0, atol=1e-5)


class TestLogNormal:
    def test_log_prob_and_mean(self):
        d = dists.LogNormal(0.3, 0.5)
        np.testing.assert_allclose(
            float(d.log_prob(jnp.asarray(2.0))),
            scipy.stats.lognorm.logpdf(2.0, 0.5, scale=np.exp(0.3)),
            atol=1e-4)
        x = np.asarray(d.sample(KEY, (200000,)))
        np.testing.assert_allclose(x.mean(), float(d.mean), rtol=0.02)


class TestTransformedDistribution:
    @pytest.mark.parametrize("bijector,ref", [
        ("exp", lambda base_lp, x: None),
    ])
    def test_exp_matches_lognormal(self, bijector, ref):
        base = dists.Normal(0.3, 0.5)
        d = dists.TransformedDistribution(base, "exp")
        ln = dists.LogNormal(0.3, 0.5)
        xs = jnp.asarray([0.5, 1.0, 2.0, 5.0])
        np.testing.assert_allclose(np.asarray(d.log_prob(xs)),
                                   np.asarray(ln.log_prob(xs)), atol=1e-4)

    @pytest.mark.parametrize("bijector", ["exp", "sigmoid", "tanh",
                                          "softplus"])
    def test_density_integrates(self, bijector):
        # Check log|dF/dx| via change of variables: samples' empirical
        # mean of any test function matches direct integration.
        base = dists.Normal(0.0, 0.7)
        d = dists.TransformedDistribution(base, bijector)
        x = d.sample(KEY, (200000,))
        # E[f(y)] by sampling vs by importance-free quadrature over y.
        emp = float(jnp.mean(x))
        ys = np.linspace(float(jnp.min(x)) + 1e-4,
                         float(jnp.max(x)) - 1e-4, 20001)
        pdf = np.exp(np.asarray(d.log_prob(jnp.asarray(ys))))
        quad = np.trapezoid(ys * pdf, ys)
        np.testing.assert_allclose(emp, quad, atol=2e-2)

    def test_rsample_flag_propagates(self):
        d = dists.TransformedDistribution(
            dists.Categorical.from_probs(jnp.asarray([0.5, 0.5])), "exp")
        assert not d.has_rsample


class TestCategoricalLookupRouteParity:
    """Round-5 review fix: the d<=64 one-hot log_prob route must match
    the take_along gather route (AESMC_HMM_INDEX_GATHER=1) bit-for-bit
    for ANY value, including out-of-range: one negative wrap, then NaN
    fill (an invalid category scores NaN, never a silent 0.0)."""

    def test_out_of_range_matches_gather_route(self, monkeypatch):
        logits = jnp.log(jnp.asarray([0.2, 0.3, 0.5]))
        values = jnp.asarray([[-4, -1, 0, 2, 3, 5]])

        def run():
            d = dists.Categorical(logits)
            return np.asarray(d.log_prob(values))

        out_onehot = run()
        monkeypatch.setenv("AESMC_HMM_INDEX_GATHER", "1")
        out_gather = run()
        np.testing.assert_array_equal(out_onehot, out_gather)
        # -1 wraps to the last category; -4, 3, 5 are NaN.
        assert np.isnan(out_onehot[0, [0, 4, 5]]).all()
        np.testing.assert_allclose(out_onehot[0, 1], np.log(0.5),
                                   rtol=1e-6)
