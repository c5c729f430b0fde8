"""Conditional SMC + Particle Gibbs (aesmc_tpu.csmc, beyond parity):
reference pinning, lineage sampling, and the exact-posterior-invariance
property checked against the Kalman smoother on the LGSSM oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aesmc_tpu import csmc, inference, statistics
from aesmc_tpu.models import kalman, lgssm

KEY = jax.random.PRNGKey(0)


def _problem(T=12, B=2, emission_scale=0.3, seed=0):
    initial = lgssm.Initial(0.0, 1.0)
    transition = lgssm.Transition.create(0.9, 1.0)
    emission = lgssm.Emission.create(1.0, emission_scale)
    proposal = lgssm.Proposal.create(1.0, 1.0, KEY)
    lat, obs = statistics.sample_from_prior(
        initial, transition, emission, T, B, jax.random.PRNGKey(seed))
    return (initial, transition, emission, proposal), jnp.asarray(lat), \
        jnp.asarray(obs)


class TestCsmcSweep:
    @pytest.mark.parametrize("ancestor_sampling", [False, True])
    def test_reference_pinned_every_step(self, ancestor_sampling):
        comps, lat, obs = _problem()
        ref = lat  # [T, B]
        out = csmc.csmc_infer(obs, *comps, 16, ref, key=KEY,
                              ancestor_sampling=ancestor_sampling)
        np.testing.assert_array_equal(
            np.asarray(out["original_latents"][:, :, 0]),
            np.asarray(ref))
        if not ancestor_sampling:
            np.testing.assert_array_equal(
                np.asarray(out["ancestral_indices"][:, :, 0]), 0)
        assert np.isfinite(
            np.asarray(out["log_marginal_likelihood"])).all()

    def test_k1_raises(self):
        comps, lat, obs = _problem()
        with pytest.raises(ValueError, match="num_particles"):
            csmc.csmc_infer(obs, *comps, 1, lat, key=KEY)

    def test_lml_consistent_with_smc(self):
        # Both estimate log Z; with many particles they should agree to
        # a couple of nats on a short sequence.
        comps, lat, obs = _problem(T=10)
        smc = inference.infer(
            "smc", obs, *comps, 512, key=KEY,
            return_log_marginal_likelihood=True, return_latents=False)
        cs = csmc.csmc_infer(obs, *comps, 512, lat,
                             key=jax.random.PRNGKey(5))
        dev = np.abs(
            np.asarray(smc["log_marginal_likelihood"]) -
            np.asarray(cs["log_marginal_likelihood"]))
        assert dev.max() < 2.0, dev


class TestSampleTrajectory:
    def test_hand_traced_lineage(self):
        # T=3, B=1, K=2; deterministic final weights pick particle 1;
        # ancestry: a_2 = [1, 0] (slot 1's parent is 0), a_1 = [0, 1].
        lat = jnp.asarray(
            [[[10.0, 11.0]], [[20.0, 21.0]], [[30.0, 31.0]]])
        anc = jnp.asarray([[[0, 1]], [[1, 0]]], jnp.int32)
        logw = jnp.asarray([[-1e9, 0.0]])
        traj = csmc.sample_trajectory(lat, anc, logw, KEY)
        # j_2 = 1 -> x_2 = 31; parent = anc[1][1] = 0 -> x_1 = 20;
        # parent = anc[0][0] = 0 -> x_0 = 10.
        np.testing.assert_allclose(np.asarray(traj)[:, 0],
                                   [10.0, 20.0, 31.0])

    def test_shapes_multidim(self):
        comps, lat, obs = _problem()
        out = inference.infer(
            "smc", obs, *comps, 8, key=KEY, return_latents=False,
            return_original_latents=True, return_ancestral_indices=True,
            return_log_weight=True,
            return_log_marginal_likelihood=False)
        traj = csmc.sample_trajectory(
            out["original_latents"], out["ancestral_indices"],
            out["log_weight"], KEY)
        assert traj.shape == lat.shape


class TestParticleGibbs:
    def test_recovers_kalman_smoother(self):
        # PGAS chain averages must converge to the EXACT joint-smoothing
        # posterior mean (the invariance property) - checked against
        # the RTS smoother on the LGSSM oracle.
        T, B = 15, 2
        emission_scale = 0.5
        comps, lat, obs = _problem(T=T, B=B,
                                   emission_scale=emission_scale, seed=3)
        trajectories, lmls = csmc.particle_gibbs(
            obs, *comps, num_particles=64, num_iterations=300, key=KEY,
            ancestor_sampling=True)
        assert np.isfinite(np.asarray(lmls)).all()
        keep = np.asarray(trajectories)[50:]                 # burn-in
        pg_mean = keep.mean(axis=0)                          # [T, B]
        obs_np = np.asarray(obs)
        params = kalman.KalmanParams(0.0, 1.0, 0.9, 0.0, 1.0, 1.0, 0.0,
                                     emission_scale ** 2)
        exact = np.stack([kalman.kalman_smoother(obs_np[:, b], params)[0]
                          for b in range(B)], axis=1)        # [T, B]
        rmse = float(np.sqrt(np.mean((pg_mean - exact) ** 2)))
        assert rmse < 0.25, rmse

    def test_vanilla_pg_runs(self):
        comps, lat, obs = _problem(T=6)
        trajectories, lmls = csmc.particle_gibbs(
            obs, *comps, num_particles=16, num_iterations=5, key=KEY,
            ancestor_sampling=False)
        assert np.asarray(trajectories).shape[0] == 5
        assert np.isfinite(np.asarray(lmls)).all()

    def test_explicit_initial_reference(self):
        comps, lat, obs = _problem(T=6)
        trajectories, _ = csmc.particle_gibbs(
            obs, *comps, num_particles=16, num_iterations=3, key=KEY,
            initial_reference=lat)
        assert np.asarray(trajectories).shape == (3,) + lat.shape
