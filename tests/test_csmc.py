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


class TestPmmh:
    """Particle marginal Metropolis-Hastings: the pseudo-marginal chain
    over model parameters must target the TRUE parameter posterior
    (computable exactly on the LGSSM via the Kalman likelihood)."""

    def test_recovers_exact_parameter_posterior(self):
        T, B = 30, 1
        emission_scale = 0.5
        true_mult = 0.8
        key = jax.random.PRNGKey(2)
        initial = lgssm.Initial(0.0, 1.0)
        emission = lgssm.Emission.create(1.0, emission_scale)
        # Near-optimal proposal (sigma^2 = 1/(1/q^2 + c^2/r^2) = 0.2 at
        # q=1, c=1, r=0.5): a mismatched proposal inflates the lml
        # estimator noise to ~10 nats at K=256 and a pseudo-marginal
        # chain sticks; with this one the noise is <1 nat.
        sig = float(np.sqrt(0.2))
        proposal = lgssm.Proposal(
            lin_0_weight=jnp.asarray(0.8), lin_0_bias=jnp.asarray(0.0),
            lin_t_weight=jnp.asarray([0.2 * true_mult, 0.8]),
            lin_t_bias=jnp.asarray(0.0), scale_0=sig, scale_t=sig)
        _, obs = statistics.sample_from_prior(
            initial, lgssm.Transition.create(true_mult, 1.0), emission,
            T, B, key)

        def build(theta):
            # Direct construction (create() coerces to host floats -
            # not traceable under the MH scan).
            return (initial, lgssm.Transition(mult=theta["mult"],
                                              scale=1.0),
                    emission, proposal)

        def log_prior(theta):
            return -0.5 * theta["mult"] ** 2          # N(0, 1)

        thetas, lps, acc = csmc.pmmh(
            obs, build, {"mult": jnp.asarray(0.2)}, log_prior,
            num_particles=256, num_iterations=1500,
            key=jax.random.PRNGKey(7), step_size=0.15)
        assert 0.05 < float(acc) < 0.95, float(acc)
        chain = np.asarray(thetas["mult"])[300:]

        # Exact posterior on a grid via the Kalman likelihood.
        grid = np.linspace(0.4, 1.2, 161)
        obs_np = np.asarray(obs)[:, 0]
        log_post = np.array([
            kalman.kalman_filter(
                obs_np, kalman.KalmanParams(
                    0.0, 1.0, float(m), 0.0, 1.0, 1.0, 0.0,
                    emission_scale ** 2))[4] - 0.5 * m ** 2
            for m in grid])
        w = np.exp(log_post - log_post.max())
        w /= w.sum()
        exact_mean = float((grid * w).sum())
        exact_std = float(np.sqrt(((grid - exact_mean) ** 2 * w).sum()))

        assert abs(chain.mean() - exact_mean) < max(0.06, exact_std), \
            (chain.mean(), exact_mean, exact_std)
        assert 0.4 < chain.std() / exact_std < 2.5, \
            (chain.std(), exact_std)

    def test_pytree_theta_and_is_mode(self):
        T, B = 8, 2
        key = jax.random.PRNGKey(0)
        initial = lgssm.Initial(0.0, 1.0)
        emission = lgssm.Emission.create(1.0, 0.3)
        proposal = lgssm.Proposal.create(1.0, 1.0, key)
        _, obs = statistics.sample_from_prior(
            initial, lgssm.Transition.create(0.9, 1.0), emission, T, B,
            key)

        def build(theta):
            return (initial,
                    lgssm.Transition(mult=theta["a"], scale=1.0),
                    lgssm.Emission(mult=theta["c"], scale=0.3),
                    proposal)

        thetas, lps, acc = csmc.pmmh(
            obs, build, {"a": jnp.asarray(0.5), "c": jnp.asarray(1.0)},
            lambda th: -0.5 * (th["a"] ** 2 + th["c"] ** 2),
            num_particles=32, num_iterations=20, algorithm="is",
            step_size={"a": 0.1, "c": 0.05})
        assert np.asarray(thetas["a"]).shape == (20,)
        assert np.isfinite(np.asarray(lps)).all()
