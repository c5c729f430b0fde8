"""Tests for sequential quasi-Monte Carlo (aesmc_tpu/sqmc.py).

Strategy mirrors the repo's three tiers: exact/golden unit tests
(Sobol digits vs the published Joe-Kuo sequence, Hilbert-curve
adjacency by exhaustive enumeration), statistical tests with fixed
keys (RQMC integration error, quantile-transform moments), and
oracle end-to-end tests (SQMC log-Z against the exact Kalman
likelihood, variance-reduction factor vs the plain SMC engine).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aesmc_tpu import inference, sqmc, statistics
from aesmc_tpu import distributions as dists
from aesmc_tpu.models import kalman, kalman_nd, lgssm, lgssm_nd
from aesmc_tpu.state import BatchShapeMode

# First 8 points of the unscrambled Joe-Kuo Sobol sequence in 4
# dimensions (matches scipy.stats.qmc.Sobol(d=4, scramble=False)).
_SOBOL_4D_8 = np.array([
    [0.0, 0.0, 0.0, 0.0],
    [0.5, 0.5, 0.5, 0.5],
    [0.75, 0.25, 0.25, 0.25],
    [0.25, 0.75, 0.75, 0.75],
    [0.375, 0.375, 0.625, 0.875],
    [0.875, 0.875, 0.125, 0.375],
    [0.625, 0.125, 0.875, 0.625],
    [0.125, 0.625, 0.375, 0.125],
])


class TestSobol:
    def test_unscrambled_matches_joe_kuo(self):
        pts = np.asarray(sqmc.sobol_points(8, 4, scramble=False))
        np.testing.assert_allclose(pts, _SOBOL_4D_8, atol=0)

    def test_scrambled_points_in_unit_cube(self):
        pts = np.asarray(sqmc.sobol_points(
            257, 5, key=jax.random.PRNGKey(3)))
        assert pts.shape == (257, 5)
        assert pts.min() >= 0.0 and pts.max() < 1.0

    def test_scramble_reproducible_and_key_dependent(self):
        k = jax.random.PRNGKey(0)
        a = np.asarray(sqmc.sobol_points(64, 3, key=k))
        b = np.asarray(sqmc.sobol_points(64, 3, key=k))
        c = np.asarray(sqmc.sobol_points(64, 3, key=jax.random.PRNGKey(1)))
        np.testing.assert_array_equal(a, b)
        assert not np.allclose(a, c)

    def test_scramble_requires_key(self):
        with pytest.raises(ValueError, match="requires a PRNG key"):
            sqmc.sobol_points(8, 2)

    def test_integration_beats_monte_carlo(self):
        # smooth integrand prod(u_j) over [0,1]^3, exact value 1/8.
        errs_q, errs_m = [], []
        for s in range(10):
            k = jax.random.PRNGKey(s)
            q = np.asarray(sqmc.sobol_points(1024, 3, key=k))
            m = np.asarray(jax.random.uniform(k, (1024, 3)))
            errs_q.append(np.prod(q, 1).mean() - 0.125)
            errs_m.append(np.prod(m, 1).mean() - 0.125)
        rmse_q = np.sqrt(np.mean(np.square(errs_q)))
        rmse_m = np.sqrt(np.mean(np.square(errs_m)))
        assert rmse_q * 5 < rmse_m, (rmse_q, rmse_m)

    def test_scrambled_first_moment_exact_batch(self):
        # LMS + digital shift keeps every marginal exactly uniform:
        # averaged over many scrambles the mean converges to 1/2.
        keys = jax.random.split(jax.random.PRNGKey(7), 64)
        pts = jax.vmap(
            lambda k: sqmc.sobol_points(128, 2, key=k))(keys)
        mean = float(jnp.mean(pts))
        assert abs(mean - 0.5) < 5e-3

    def test_jittable(self):
        f = jax.jit(lambda k: sqmc.sobol_points(32, 2, key=k))
        a = f(jax.random.PRNGKey(0))
        b = sqmc.sobol_points(32, 2, key=jax.random.PRNGKey(0))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_high_dim_via_scipy_table(self):
        pytest.importorskip("scipy")
        pts = np.asarray(sqmc.sobol_points(16, 100, scramble=False))
        assert pts.shape == (16, 100)
        # second point of every Sobol dimension is 0.5.
        np.testing.assert_allclose(pts[1], 0.5)


class TestHilbert:
    @pytest.mark.parametrize("d,bits", [(2, 1), (2, 2), (2, 4),
                                        (3, 2), (3, 3), (4, 2)])
    def test_exhaustive_adjacency_and_bijectivity(self, d, bits):
        import itertools
        cells = np.array(
            list(itertools.product(range(2 ** bits), repeat=d)),
            dtype=np.uint32)
        keys = np.asarray(sqmc.hilbert_index(jnp.asarray(cells), bits))
        idx = (keys[:, 0].astype(np.uint64) * (2 ** 31) +
               keys[:, 1].astype(np.uint64))
        assert len(np.unique(idx)) == len(cells)  # bijective
        path = cells[np.argsort(idx, kind="stable")].astype(int)
        assert (path[0] == 0).all()               # starts at the origin
        steps = np.abs(np.diff(path, axis=0)).sum(axis=1)
        assert (steps == 1).all()                 # unit steps only

    def test_two_word_keys_consistent_with_single_word(self):
        # Hilbert curves nest: doubling the resolution (d*bits crossing
        # the 31-bit single-word boundary) preserves the coarse order.
        rng = np.random.default_rng(0)
        cells = rng.integers(0, 2 ** 10, size=(256, 3)).astype(np.uint32)
        cells = np.unique(cells, axis=0)
        k30 = np.asarray(sqmc.hilbert_index(jnp.asarray(cells), 10))
        k33 = np.asarray(sqmc.hilbert_index(jnp.asarray(cells * 2), 11))
        i30 = k30[:, 0].astype(np.uint64) * 2 ** 31 + k30[:, 1]
        i33 = k33[:, 0].astype(np.uint64) * 2 ** 31 + k33[:, 1]
        np.testing.assert_array_equal(np.argsort(i30, kind="stable"),
                                      np.argsort(i33, kind="stable"))

    def test_sort_indices_scalar_is_value_order(self):
        x = jnp.asarray([[3.0, 1.0, 2.0], [0.0, -1.0, 5.0]])
        order = np.asarray(sqmc.hilbert_sort_indices(x))
        np.testing.assert_array_equal(order, [[1, 2, 0], [1, 0, 2]])

    def test_sort_indices_vector_locality(self):
        # Sorted 2-D particles must traverse with small average jumps:
        # the Hilbert order beats a lexicographic (x-then-y) order.
        key = jax.random.PRNGKey(0)
        x = jax.random.uniform(key, (1, 512, 2))
        order = np.asarray(sqmc.hilbert_sort_indices(x, bits=8))[0]
        pts = np.asarray(x)[0][order]
        hilbert_jump = np.linalg.norm(np.diff(pts, axis=0), axis=1).mean()
        lex = np.lexsort((np.asarray(x)[0][:, 1], np.asarray(x)[0][:, 0]))
        lex_jump = np.linalg.norm(
            np.diff(np.asarray(x)[0][lex], axis=0), axis=1).mean()
        assert hilbert_jump * 2 < lex_jump, (hilbert_jump, lex_jump)

    def test_rejects_oversize_grid(self):
        with pytest.raises(ValueError, match="62"):
            sqmc.hilbert_index(jnp.zeros((4, 8), dtype=jnp.uint32), 16)


class TestQuantileSample:
    def test_normal_batch_expanded_moments(self):
        b, k = 4, 4096
        loc = jnp.arange(b, dtype=jnp.float32)
        dist = dists.Normal(loc, 2.0,
                            batch_shape_mode=BatchShapeMode.BATCH_EXPANDED)
        u = jax.vmap(lambda kk: sqmc.sobol_points(k, 1, key=kk))(
            jax.random.split(jax.random.PRNGKey(0), b))
        x = np.asarray(sqmc.quantile_sample(dist, b, k, u))
        assert x.shape == (b, k)
        np.testing.assert_allclose(x.mean(axis=1), np.arange(b), atol=5e-3)
        np.testing.assert_allclose(x.std(axis=1), 2.0, atol=5e-3)

    def test_mvn_tril_covariance(self):
        k = 8192
        tril = jnp.asarray([[1.0, 0.0], [0.8, 0.6]])
        dist = dists.MultivariateNormalTriL(
            jnp.zeros(2), tril,
            batch_shape_mode=BatchShapeMode.NOT_EXPANDED)
        u = sqmc.sobol_points(k, 2, key=jax.random.PRNGKey(1))[None]
        x = np.asarray(sqmc.quantile_sample(dist, 1, k, u))[0]
        np.testing.assert_allclose(np.cov(x.T), np.asarray(tril @ tril.T),
                                   atol=2e-2)

    def test_deterministic_ignores_uniforms(self):
        dist = dists.Deterministic(
            jnp.asarray(3.0), batch_shape_mode=BatchShapeMode.NOT_EXPANDED)
        x = sqmc.quantile_sample(dist, 2, 5, jnp.zeros((2, 5, 1)))
        np.testing.assert_allclose(np.asarray(x), 3.0)

    def test_unsupported_distribution_raises(self):
        dist = dists.Gamma(1.0, 1.0) if hasattr(dists, "Gamma") else \
            dists.Bernoulli(logits=jnp.zeros((2, 5)))
        with pytest.raises(TypeError, match="quantile transform"):
            sqmc.quantile_sample(dist, 2, 5, jnp.zeros((2, 5, 1)))


def _optimal_lgssm_proposal(tr_mult, tr_scale, em_mult, em_scale,
                            initial_scale=1.0):
    s0, st = lgssm.optimal_proposal_scales(initial_scale, tr_scale,
                                           em_mult, em_scale)
    var_t = 1.0 / (1.0 / tr_scale ** 2 + em_mult ** 2 / em_scale ** 2)
    var_0 = 1.0 / (1.0 / initial_scale ** 2 +
                   em_mult ** 2 / em_scale ** 2)
    return lgssm.Proposal(
        lin_0_weight=jnp.asarray(var_0 * em_mult / em_scale ** 2),
        lin_0_bias=jnp.asarray(0.0),
        lin_t_weight=jnp.asarray([var_t * tr_mult / tr_scale ** 2,
                                  var_t * em_mult / em_scale ** 2]),
        lin_t_bias=jnp.asarray(0.0),
        scale_0=s0, scale_t=st)


class TestSqmcInfer:
    def _lgssm(self, T=20, B=1, key=7):
        initial = lgssm.Initial(0.0, 1.0)
        transition = lgssm.Transition.create(0.9, 1.0)
        emission = lgssm.Emission.create(1.0, 0.5)
        proposal = _optimal_lgssm_proposal(0.9, 1.0, 1.0, 0.5)
        _, obs = statistics.sample_from_prior(
            initial, transition, emission, T, B, jax.random.PRNGKey(key))
        params = kalman.KalmanParams(0.0, 1.0, 0.9, 0.0, 1.0, 1.0, 0.0,
                                     0.25)
        exact = kalman.kalman_filter(
            np.asarray(obs, np.float64)[:, 0], params)[4]
        return initial, transition, emission, proposal, obs, exact

    def test_logz_unbiased_and_beats_smc_variance(self):
        initial, transition, emission, proposal, obs, exact = self._lgssm()
        K = 256

        @jax.jit
        def run_q(k):
            return sqmc.sqmc_infer(
                obs, initial, transition, emission, proposal, K, key=k,
                return_log_marginal_likelihood=True, return_latents=False,
                return_log_weight=False)["log_marginal_likelihood"][0]

        @jax.jit
        def run_m(k):
            return inference.infer(
                "smc", obs, initial, transition, emission, proposal, K,
                key=k, return_log_marginal_likelihood=True,
                return_latents=False,
                return_log_weight=False)["log_marginal_likelihood"][0]

        zq = np.array([float(run_q(jax.random.PRNGKey(s)))
                       for s in range(20)])
        zm = np.array([float(run_m(jax.random.PRNGKey(s)))
                       for s in range(20)])
        # Measured at these settings: sqmc std ~0.007 / bias ~0.002 vs
        # smc std ~0.13; variance ratio ~300. Thresholds are 10x slack.
        assert abs(zq.mean() - exact) < 0.05
        assert zm.var() > 20 * zq.var(), (zm.var(), zq.var())

    def test_filtered_means_match_kalman(self):
        initial, transition, emission, proposal, obs, _ = self._lgssm()
        out = jax.jit(lambda k: sqmc.sqmc_infer(
            obs, initial, transition, emission, proposal, 512, key=k,
            return_latents=True, return_log_weight=True))(
                jax.random.PRNGKey(0))
        params = kalman.KalmanParams(0.0, 1.0, 0.9, 0.0, 1.0, 1.0, 0.0,
                                     0.25)
        exact_means = kalman.kalman_filter(
            np.asarray(obs, np.float64)[:, 0], params)[0]
        # smoothed latents from lineage tracing: compare only the last
        # few steps where filtering == smoothing at the final time.
        w = out["log_weight"]
        last_mean = float(statistics.empirical_mean(
            out["latents"][-1], w)[0])
        assert abs(last_mean - exact_means[-1]) < 0.1

    def test_return_contract_shapes(self):
        initial, transition, emission, proposal, obs, _ = self._lgssm(
            T=6, B=3)
        out = sqmc.sqmc_infer(
            obs, initial, transition, emission, proposal, 32,
            key=jax.random.PRNGKey(0),
            return_log_marginal_likelihood=True, return_latents=True,
            return_original_latents=True, return_log_weight=True,
            return_log_weights=True, return_ancestral_indices=True)
        assert out["log_marginal_likelihood"].shape == (3,)
        assert out["latents"].shape == (6, 3, 32)
        assert out["original_latents"].shape == (6, 3, 32)
        assert out["log_weight"].shape == (3, 32)
        assert out["log_weights"].shape == (6, 3, 32)
        assert out["ancestral_indices"].shape == (5, 3, 32)
        assert out["last_latent"].shape == (3, 32)
        idx = np.asarray(out["ancestral_indices"])
        assert idx.min() >= 0 and idx.max() < 32

    def test_single_timestep(self):
        initial, transition, emission, proposal, obs, _ = self._lgssm(
            T=1, B=2)
        out = sqmc.sqmc_infer(
            obs, initial, transition, emission, proposal, 64,
            key=jax.random.PRNGKey(0),
            return_log_marginal_likelihood=True)
        assert out["log_marginal_likelihood"].shape == (2,)
        assert np.isfinite(np.asarray(out["log_marginal_likelihood"])).all()

    def test_multivariate_hilbert_path(self):
        # 2-D latent: exercises the Hilbert sort + the TriL-constant
        # optimal proposal, against the exact nd Kalman likelihood.
        dim, T, K = 2, 12, 256
        initial, transition, emission, _ = lgssm_nd.make_model(
            dim=dim, key=jax.random.PRNGKey(2), emission_scale=0.5)
        _, obs = statistics.sample_from_prior(
            initial, transition, emission, T, 1, jax.random.PRNGKey(5))

        a = np.asarray(transition.matrix)
        c = np.asarray(emission.matrix)
        q = float(transition.noise_scale[0]) ** 2
        r = float(emission.noise_scale[0]) ** 2
        params = kalman_nd.KalmanNdParams(
            initial_mean=np.zeros(dim), initial_cov=np.eye(dim),
            transition_matrix=a, transition_cov=q * np.eye(dim),
            emission_matrix=c, emission_cov=r * np.eye(dim))
        exact = kalman_nd.kalman_filter_nd(
            np.asarray(obs, np.float64)[:, 0], params)[4]

        # Closed-form locally-optimal proposal: constant covariance
        # (Q^-1 + C^T R^-1 C)^-1 shared by every particle.
        prec = np.linalg.inv(q * np.eye(dim)) + c.T @ c / r
        cov = np.linalg.inv(prec)
        tril = jnp.asarray(np.linalg.cholesky(cov), dtype=jnp.float32)
        cov_j = jnp.asarray(cov, dtype=jnp.float32)
        a_j = jnp.asarray(a, dtype=jnp.float32)
        c_j = jnp.asarray(c, dtype=jnp.float32)

        prec0 = np.eye(dim) + c.T @ c / r
        cov0 = np.linalg.inv(prec0)
        tril0 = jnp.asarray(np.linalg.cholesky(cov0), dtype=jnp.float32)
        cov0_j = jnp.asarray(cov0, dtype=jnp.float32)

        class OptProposal:
            def __call__(self, previous_latents=None, time=None,
                         observations=None):
                if time == 0:
                    obs0 = observations[0]                    # [B, Do]
                    loc = (obs0 / r) @ c_j @ cov0_j.T
                    return dists.MultivariateNormalTriL(
                        loc, tril0,
                        batch_shape_mode=BatchShapeMode.BATCH_EXPANDED)
                prev = previous_latents[-1]                   # [B, K, D]
                obs_t = observations[time]                    # [B, Do]
                nat = (prev @ a_j.T) / q + ((obs_t / r) @ c_j)[:, None, :]
                loc = nat @ cov_j.T
                return dists.MultivariateNormalTriL(
                    loc, tril,
                    batch_shape_mode=BatchShapeMode.FULLY_EXPANDED)

        proposal = OptProposal()

        @jax.jit
        def run_q(k):
            return sqmc.sqmc_infer(
                obs, initial, transition, emission, proposal, K, key=k,
                return_log_marginal_likelihood=True, return_latents=False,
                return_log_weight=False)["log_marginal_likelihood"][0]

        @jax.jit
        def run_m(k):
            return inference.infer(
                "smc", obs, initial, transition, emission, proposal, K,
                key=k, return_log_marginal_likelihood=True,
                return_latents=False,
                return_log_weight=False)["log_marginal_likelihood"][0]

        zq = np.array([float(run_q(jax.random.PRNGKey(s)))
                       for s in range(15)])
        zm = np.array([float(run_m(jax.random.PRNGKey(s)))
                       for s in range(15)])
        assert abs(zq.mean() - exact) < 0.1, (zq.mean(), exact)
        assert zm.var() > 2 * zq.var(), (zm.var(), zq.var())


class TestPallasRoute:
    """Round-5 (VERDICT r4 #4): the fused inverse-CDF route
    (`resampling_implementation='pallas'`, interpret mode on CPU) is
    bit-identical to the XLA cumsum+searchsorted+gather route."""

    def test_pallas_route_bit_identical(self):
        from aesmc_tpu.ops import resample_pallas
        key = jax.random.PRNGKey(7)
        T, B, K = 12, 2, 512
        initial = lgssm.Initial(0.0, 1.0)
        transition = lgssm.Transition.create(0.9, 1.0)
        emission = lgssm.Emission.create(1.0, 0.5)
        proposal = lgssm.Proposal.create(1.0, 1.0, key)
        _, obs = statistics.sample_from_prior(
            initial, transition, emission, T, B, key)
        comps = (initial, transition, emission, proposal)
        kwargs = dict(num_particles=K, key=key,
                      return_log_marginal_likelihood=True,
                      return_ancestral_indices=True,
                      return_log_weights=True)
        out_x = sqmc.sqmc_infer(obs, *comps,
                                resampling_implementation="xla",
                                **kwargs)
        resample_pallas.FORCE_INTERPRET = True
        try:
            out_p = sqmc.sqmc_infer(obs, *comps,
                                    resampling_implementation="pallas",
                                    **kwargs)
        finally:
            resample_pallas.FORCE_INTERPRET = False
        np.testing.assert_array_equal(
            np.asarray(out_p["ancestral_indices"]),
            np.asarray(out_x["ancestral_indices"]))
        np.testing.assert_allclose(
            np.asarray(out_p["log_marginal_likelihood"]),
            np.asarray(out_x["log_marginal_likelihood"]), rtol=0,
            atol=0)


class TestImplementationGuards:
    """Round-5 review fixes: no silent downgrades of an explicit
    resampling_implementation."""

    def _setup(self):
        import numpy as np
        from aesmc_tpu import statistics
        from aesmc_tpu.models import lgssm
        comps = (lgssm.Initial(0.0, 1.0),
                 lgssm.Transition.create(0.9, 1.0),
                 lgssm.Emission.create(1.0, 0.5),
                 lgssm.Proposal.create(1.0, 1.0, jax.random.PRNGKey(0)))
        _, obs = statistics.sample_from_prior(
            comps[0], comps[1], comps[2], 4, 1,
            key=jax.random.PRNGKey(1))
        return comps, obs

    def test_callable_implementation_raises(self):
        comps, obs = self._setup()
        with pytest.raises(ValueError, match="Hilbert inverse-CDF"):
            sqmc.sqmc_infer(obs, *comps, 64, key=jax.random.PRNGKey(2),
                            resampling_implementation=lambda *a: None)

    def test_large_k_pallas_fallback_warns(self):
        """K > 2^21 with explicit 'pallas' warns and still runs (the
        XLA route). Uses a tiny T so the big-K run stays cheap."""
        comps, obs = self._setup()
        with pytest.warns(UserWarning, match="2\\^21"):
            out = sqmc.sqmc_infer(
                obs, *comps, (1 << 21) + 128, key=jax.random.PRNGKey(2),
                resampling_implementation="pallas",
                return_log_marginal_likelihood=True,
                return_latents=False)
        assert bool(jnp.isfinite(out["log_marginal_likelihood"]).all())
