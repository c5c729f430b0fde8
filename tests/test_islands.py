"""Island particle model (aesmc_tpu.parallel.islands).

Validation strategy:
- exact reduction: with island_resampling_criterion='never' the
  combined estimator IS the log-mean-exp of the per-island batch-engine
  log-Z estimates (island streams reuse the engine's key layout, so
  each island reproduces `infer(key=fold_in(key, i))`);
- statistical: E[Z-hat] equals the exact Kalman evidence on an LGSSM,
  for independent AND interacting islands (the Verge et al. 2015
  double unbiasedness);
- mesh: sharding the island axis over the 8 virtual CPU devices leaves
  every output numerically unchanged.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aesmc_tpu import inference, statistics
from aesmc_tpu.models import kalman, lgssm
from aesmc_tpu.parallel import islands

KEY = jax.random.PRNGKey(42)

A, Q_SCALE = 0.9, 1.0
C, R_SCALE = 1.0, 2.0


def _components():
    """Bootstrap LGSSM: the proposal equals the transition, so weights
    are pure emission likelihoods (broad emission keeps them mild - the
    fixture lesson: on-model observations + a sane proposal, or Jensen
    bias swamps the statistics)."""
    initial = lgssm.Initial(0.0, 1.0)
    transition = lgssm.Transition.create(A, Q_SCALE)
    emission = lgssm.Emission.create(C, R_SCALE)
    proposal = lgssm.Proposal(
        lin_0_weight=jnp.asarray(0.0), lin_0_bias=jnp.asarray(0.0),
        lin_t_weight=jnp.asarray([A, 0.0]), lin_t_bias=jnp.asarray(0.0),
        scale_0=1.0, scale_t=Q_SCALE)
    return initial, transition, emission, proposal


def _model_observations(T, B, seed=0):
    """Observations generated FROM the model."""
    rng = np.random.default_rng(seed)
    x = rng.normal(0.0, 1.0, size=B)
    ys = []
    for t in range(T):
        if t > 0:
            x = A * x + rng.normal(0.0, Q_SCALE, size=B)
        ys.append(C * x + rng.normal(0.0, R_SCALE, size=B))
    return jnp.asarray(np.stack(ys), jnp.float32)


def _exact_log_z(obs_col):
    params = kalman.KalmanParams(
        initial_mean=0.0, initial_variance=1.0,
        transition_mult=A, transition_offset=0.0,
        transition_variance=Q_SCALE ** 2,
        emission_mult=C, emission_offset=0.0,
        emission_variance=R_SCALE ** 2)
    return kalman.kalman_filter(np.asarray(obs_col), params)[4]


class TestExactReductions:
    def test_never_is_logmeanexp_of_independent_filters(self):
        T, B, K, N = 6, 2, 8, 3
        comps = _components()
        obs = _model_observations(T, B)
        out = islands.island_infer(
            obs, *comps, num_particles=K, num_islands=N, key=KEY,
            island_resampling_criterion="never")
        per_island = []
        for i in range(N):
            res = inference.infer(
                "smc", obs, *comps, K,
                key=jax.random.fold_in(KEY, jnp.uint32(i)),
                return_log_marginal_likelihood=True,
                return_latents=False)
            per_island.append(res["log_marginal_likelihood"])
        expected = jax.nn.logsumexp(
            jnp.stack(per_island), axis=0) - np.log(N)
        np.testing.assert_allclose(
            np.asarray(out["log_marginal_likelihood"]),
            np.asarray(expected), atol=2e-4)
        np.testing.assert_allclose(
            np.asarray(out["island_log_marginal_likelihood"]),
            np.asarray(jnp.stack(per_island)), atol=2e-4)
        assert np.all(np.asarray(out["num_island_events"]) == 0)

    def test_single_island_matches_infer(self):
        T, B, K = 5, 3, 16
        comps = _components()
        obs = _model_observations(T, B, seed=1)
        out = islands.island_infer(
            obs, *comps, num_particles=K, num_islands=1, key=KEY)
        res = inference.infer(
            "smc", obs, *comps, K,
            key=jax.random.fold_in(KEY, jnp.uint32(0)),
            return_log_marginal_likelihood=True, return_latents=False)
        np.testing.assert_allclose(
            np.asarray(out["log_marginal_likelihood"]),
            np.asarray(res["log_marginal_likelihood"]), atol=2e-4)

    def test_always_counts_every_step(self):
        T, B, K, N = 5, 2, 8, 4
        comps = _components()
        obs = _model_observations(T, B, seed=2)
        out = islands.island_infer(
            obs, *comps, num_particles=K, num_islands=N, key=KEY,
            island_resampling_criterion="always")
        assert np.all(np.asarray(out["num_island_events"]) == T - 1)

    def test_pooled_weights_normalized(self):
        T, B, K, N = 6, 2, 8, 3
        comps = _components()
        obs = _model_observations(T, B, seed=3)
        for crit in ("never", "always", 0.7):
            out = islands.island_infer(
                obs, *comps, num_particles=K, num_islands=N, key=KEY,
                island_resampling_criterion=crit)
            pooled = out["pooled_log_weight"]       # [N, B, K]
            total = jax.nn.logsumexp(
                pooled.swapaxes(0, 1).reshape(B, -1), axis=1)
            np.testing.assert_allclose(np.asarray(total),
                                       np.zeros(B), atol=1e-5)

    def test_validation(self):
        comps = _components()
        obs = _model_observations(3, 1)
        with pytest.raises(ValueError, match="num_islands"):
            islands.island_infer(obs, *comps, num_particles=4,
                                 num_islands=0)
        with pytest.raises(ValueError, match="criterion"):
            islands.island_infer(obs, *comps, num_particles=4,
                                 num_islands=2,
                                 island_resampling_criterion=1.5)


class TestUnbiasedness:
    @pytest.mark.parametrize("criterion", ["never", "always", 0.5])
    def test_evidence_unbiased_vs_kalman(self, criterion):
        """mean over replicates of Z-hat / Z_exact ~ 1, including with
        island interaction (the island model's double unbiasedness)."""
        T, K, N, R = 6, 32, 4, 300
        comps = _components()
        obs = _model_observations(T, 1, seed=4)
        exact = _exact_log_z(np.asarray(obs)[:, 0])

        def one(key):
            out = islands.island_infer(
                obs, *comps, num_particles=K, num_islands=N, key=key,
                island_resampling_criterion=criterion,
                resampling_method="multinomial")
            return out["log_marginal_likelihood"][0]

        keys = jax.random.split(jax.random.PRNGKey(7), R)
        lmls = np.asarray(jax.lax.map(jax.jit(one), keys), np.float64)
        ratio = np.exp(lmls - exact).mean()
        assert 0.85 < ratio < 1.15, (criterion, ratio)

    def test_pooled_posterior_tracks_kalman_filter(self):
        """Pooled-ensemble mean at the final step vs the exact filtered
        mean."""
        T, B, K, N = 10, 1, 64, 4
        comps = _components()
        obs = _model_observations(T, B, seed=5)
        params = kalman.KalmanParams(
            initial_mean=0.0, initial_variance=1.0,
            transition_mult=A, transition_offset=0.0,
            transition_variance=Q_SCALE ** 2,
            emission_mult=C, emission_offset=0.0,
            emission_variance=R_SCALE ** 2)
        m_filt = kalman.kalman_filter(np.asarray(obs)[:, 0], params)[0]

        out = islands.island_infer(
            obs, *comps, num_particles=K, num_islands=N, key=KEY,
            island_resampling_criterion=0.5)
        latent = out["last_latent"].swapaxes(0, 1).reshape(B, N * K)
        log_w = out["pooled_log_weight"].swapaxes(0, 1).reshape(B, N * K)
        mean = statistics.empirical_mean(latent, log_w)
        assert abs(float(mean[0]) - m_filt[-1]) < 0.4


class TestMesh:
    def test_island_axis_sharding_is_numerically_invariant(self):
        from jax.sharding import Mesh

        T, B, K, N = 6, 2, 8, 8
        comps = _components()
        obs = _model_observations(T, B, seed=6)
        mesh = Mesh(np.asarray(jax.devices()[:8]), ("island",))
        kwargs = dict(num_particles=K, num_islands=N, key=KEY,
                      island_resampling_criterion=0.5)
        plain = islands.island_infer(obs, *comps, **kwargs)
        with_mesh = jax.jit(
            lambda o: islands.island_infer(o, *comps, mesh=mesh,
                                           **kwargs))(obs)
        for k in ("log_marginal_likelihood",
                  "island_log_marginal_likelihood", "log_weight",
                  "pooled_log_weight"):
            np.testing.assert_allclose(np.asarray(with_mesh[k]),
                                       np.asarray(plain[k]), atol=1e-5,
                                       err_msg=k)

    def test_bad_island_axis_raises(self):
        from jax.sharding import Mesh

        comps = _components()
        obs = _model_observations(3, 1)
        mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
        with pytest.raises(ValueError, match="island_axis"):
            islands.island_infer(obs, *comps, num_particles=4,
                                 num_islands=2, mesh=mesh)
