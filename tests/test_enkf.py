"""Ensemble Kalman filter (aesmc_tpu.enkf).

Oracle strategy: on a linear-Gaussian model both EnKF schemes are
consistent - filtered ensemble moments and the innovation
log-likelihood converge to the exact matrix Kalman filter as N grows.
Then Lorenz-96: a small localized+inflated ensemble tracks the chaotic
truth (the regime the EnKF exists for).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aesmc_tpu import enkf, statistics
from aesmc_tpu.models import kalman_nd, lgssm_nd, lorenz

KEY = jax.random.PRNGKey(0)


def _linear_model(dim=4, obs_dim=4, seed=0):
    rng = np.random.default_rng(seed)
    a = 0.9 * np.eye(dim) + 0.05 * rng.normal(size=(dim, dim))
    c = np.eye(obs_dim, dim)
    initial = lgssm_nd.Initial.create(dim, 0.0, 1.0)
    transition = lgssm_nd.Transition.create(a, 0.7)
    emission = lgssm_nd.Emission.create(c, 0.5)
    params = kalman_nd.KalmanNdParams(
        initial_mean=np.zeros(dim), initial_cov=np.eye(dim),
        transition_matrix=a, transition_cov=0.7 ** 2 * np.eye(dim),
        emission_matrix=c, emission_cov=0.5 ** 2 * np.eye(obs_dim))
    return initial, transition, emission, params, c


class TestLinearOracle:
    @pytest.mark.parametrize("method", ["stochastic", "etkf"])
    def test_matches_exact_kalman(self, method):
        T, B, N, dim = 12, 2, 4000, 4
        initial, transition, emission, params, c = _linear_model(dim)
        _, obs = statistics.sample_from_prior(
            initial, transition, emission, T, B, jax.random.PRNGKey(1))

        out = jax.jit(lambda o, k: enkf.enkf_filter(
            o, initial, transition,
            observation_fn=lambda x: c.astype(np.float32) @ x,
            obs_cov=0.25, num_members=N, key=k, method=method))(
                obs, KEY)

        for b in range(B):
            m_exact, p_exact, _, _, ll_exact = kalman_nd.kalman_filter_nd(
                np.asarray(obs)[:, b], params)
            m_enkf = np.asarray(out["filtered_means"])[:, b]
            rmse = np.sqrt(np.mean((m_enkf - m_exact) ** 2))
            assert rmse < 0.08, (method, rmse)
            v_enkf = np.asarray(out["filtered_variances"])[:, b]
            v_exact = np.stack([np.diag(p) for p in p_exact])
            np.testing.assert_allclose(v_enkf, v_exact, atol=0.08,
                                       err_msg=method)
            ll = float(np.asarray(out["log_likelihood"])[b])
            assert abs(ll - ll_exact) < 0.05 * abs(ll_exact), (
                method, ll, ll_exact)

    def test_etkf_mean_is_deterministic_given_forecast(self):
        """ETKF adds no perturbation noise: two runs differing only in
        the analysis perturbation stream coincide (all randomness is in
        init/forecast draws, which the key fixes)."""
        T, B, N = 5, 1, 64
        initial, transition, emission, params, c = _linear_model()
        _, obs = statistics.sample_from_prior(
            initial, transition, emission, T, B, jax.random.PRNGKey(2))
        run = lambda: enkf.enkf_filter(
            obs, initial, transition, lambda x: c.astype(np.float32) @ x,
            0.25, N, key=KEY, method="etkf")
        a, b = run(), run()
        np.testing.assert_array_equal(
            np.asarray(a["filtered_means"]),
            np.asarray(b["filtered_means"]))


class TestLorenz:
    def test_small_localized_ensemble_tracks(self):
        """N=20 with inflation + Gaspari-Cohn localization tracks an
        8-dim Lorenz-96 truth observed every other component."""
        T, B, N, dim = 25, 1, 20, 8
        obs_idx = tuple(range(0, dim, 2))
        comps = lorenz.make_model(dim=dim, obs_indices=obs_idx,
                                  emission_scale=0.5,
                                  transition_scale=0.3,
                                  proposal="bootstrap")
        initial, transition, emission, _ = comps
        latents, obs = statistics.sample_from_prior(
            initial, transition, emission, T, B, jax.random.PRNGKey(3))

        loc = enkf.gaspari_cohn_localization(dim, obs_idx, radius=2.0)
        out = jax.jit(lambda o, k: enkf.enkf_filter(
            o, initial, transition,
            observation_fn=lambda x: x[np.asarray(obs_idx)],
            obs_cov=0.25, num_members=N, key=k,
            inflation=1.05, localization=loc))(obs, KEY)

        truth = np.asarray(
            jax.tree_util.tree_map(lambda x: x, latents))[:, 0]
        means = np.asarray(out["filtered_means"])[:, 0]
        # RMSE over the second half (after spin-up), all components
        # (including unobserved ones - the localization carries
        # information to them through the dynamics).
        rmse = np.sqrt(np.mean((means[T // 2:] - truth[T // 2:]) ** 2))
        assert rmse < 1.0, rmse
        assert np.isfinite(float(out["log_likelihood"][0]))

    def test_return_ensembles_shape(self):
        T, B, N, dim = 4, 2, 12, 6
        comps = lorenz.make_model(dim=dim, proposal="bootstrap")
        initial, transition, emission, _ = comps
        _, obs = statistics.sample_from_prior(
            initial, transition, emission, T, B, jax.random.PRNGKey(4))
        out = enkf.enkf_filter(
            obs, initial, transition, lambda x: x, 1.0, N, key=KEY,
            return_ensembles=True)
        assert np.asarray(out["ensembles"]).shape == (T, B, N, dim)
        assert np.asarray(out["last_ensemble"]).shape == (B, N, dim)
        np.testing.assert_allclose(
            np.asarray(out["ensembles"])[-1],
            np.asarray(out["last_ensemble"]), atol=0)


class TestHelpers:
    def test_gaspari_cohn_endpoints(self):
        assert float(enkf.gaspari_cohn(0.0, 2.0)) == 1.0
        assert float(enkf.gaspari_cohn(4.0, 2.0)) == 0.0
        assert float(enkf.gaspari_cohn(5.0, 2.0)) == 0.0
        mid = float(enkf.gaspari_cohn(2.0, 2.0))
        assert 0.0 < mid < 0.5

    def test_localization_masks_cyclic(self):
        loc_xy, loc_yy = enkf.gaspari_cohn_localization(8, range(0, 8, 2),
                                                        radius=1.0)
        assert loc_xy.shape == (8, 4) and loc_yy.shape == (4, 4)
        # Cyclic: state 7 is distance 1 from observed component 0.
        assert float(loc_xy[7, 0]) > 0.0
        # Distance 4 (opposite side) is fully tapered at radius 1.
        assert float(loc_xy[4, 0]) == 0.0
        np.testing.assert_allclose(np.asarray(jnp.diagonal(loc_yy)),
                                   np.ones(4))

    def test_validation(self):
        comps = lorenz.make_model(dim=6, proposal="bootstrap")
        initial, transition, emission, _ = comps
        obs = jnp.zeros((3, 1, 6))
        with pytest.raises(ValueError, match="method"):
            enkf.enkf_filter(obs, initial, transition, lambda x: x, 1.0,
                             8, method="bogus")
        with pytest.raises(ValueError, match="localization"):
            enkf.enkf_filter(obs, initial, transition, lambda x: x, 1.0,
                             8, method="etkf",
                             localization=(jnp.ones((6, 6)),
                                           jnp.ones((6, 6))))
        with pytest.raises(ValueError, match="num_members"):
            enkf.enkf_filter(obs, initial, transition, lambda x: x, 1.0,
                             1)
