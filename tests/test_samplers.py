"""Annealed SMC sampler (aesmc_tpu.samplers, beyond parity):
evidence estimates vs the exact conjugate-Gaussian normalizer, exact
mixture-target recovery, adaptive-ladder behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aesmc_tpu import samplers

KEY = jax.random.PRNGKey(0)


def _gaussian_problem(D=4, s0=2.0, s=0.5, seed=3):
    """Prior N(0, s0^2 I); L(x) = log N(y; x, s^2 I).
    Exact log Z = log N(y; 0, (s0^2 + s^2) I)."""
    y = np.asarray(jax.random.normal(jax.random.PRNGKey(seed), (D,)))

    def log_prior(x):
        return (-0.5 * jnp.sum((x / s0) ** 2) -
                D * jnp.log(s0 * jnp.sqrt(2 * jnp.pi)))

    def log_lik(x):
        return (-0.5 * jnp.sum(((x - y) / s) ** 2) -
                D * jnp.log(s * jnp.sqrt(2 * jnp.pi)))

    var = s0 ** 2 + s ** 2
    exact_log_z = float(-0.5 * np.sum(y ** 2) / var -
                        D / 2 * np.log(2 * np.pi * var))
    post_mean = y * s0 ** 2 / var
    post_var = s0 ** 2 * s ** 2 / var
    return log_prior, log_lik, y, exact_log_z, post_mean, post_var


class TestGaussianOracle:
    def test_evidence_and_posterior_moments(self):
        D = 4
        log_prior, log_lik, y, exact_lz, pm, pv = _gaussian_problem(D)
        K = 2048
        x0 = 2.0 * jax.random.normal(jax.random.PRNGKey(1), (K, D))
        lzs, means = [], []
        for seed in range(3):
            out = samplers.smc_sampler(
                log_prior, log_lik, x0, key=jax.random.PRNGKey(seed),
                num_moves=4, step_size=0.4, return_history=True)
            assert bool(out["reached_final"])
            lzs.append(float(out["log_normalizer"]))
            means.append(np.asarray(out["particles"]).mean(0))
        assert abs(np.mean(lzs) - exact_lz) < 0.1, (np.mean(lzs),
                                                    exact_lz)
        np.testing.assert_allclose(np.mean(means, axis=0), pm,
                                   atol=4 * np.sqrt(pv / 2048) + 0.02)

    def test_fixed_ladder_matches(self):
        log_prior, log_lik, y, exact_lz, pm, pv = _gaussian_problem()
        K = 2048
        x0 = 2.0 * jax.random.normal(jax.random.PRNGKey(1), (K, 4))
        betas = jnp.linspace(0.05, 1.0, 20)
        out = samplers.smc_sampler(
            log_prior, log_lik, x0, key=KEY, num_moves=4,
            step_size=0.4, betas=betas, return_history=True)
        assert abs(float(out["log_normalizer"]) - exact_lz) < 0.15
        assert int(out["num_steps"]) == 20
        assert out["ess_history"].shape == (20,)
        np.testing.assert_allclose(np.asarray(out["beta_history"]),
                                   np.asarray(betas))


class TestMixtureTarget:
    def test_bimodal_mass_split(self):
        # Target IS an equal two-mode mixture (log Z = 0 exactly):
        # p0 = N(0, 3^2), exp(L) = mixture / p0.
        s0, mu, sm = 3.0, 4.0, 0.4

        def log_prior(x):
            return (-0.5 * (x[0] / s0) ** 2 -
                    jnp.log(s0 * jnp.sqrt(2 * jnp.pi)))

        def log_mix(x):
            a = -0.5 * ((x[0] - mu) / sm) ** 2
            b = -0.5 * ((x[0] + mu) / sm) ** 2
            return (jnp.logaddexp(a, b) - jnp.log(2.0) -
                    jnp.log(sm * jnp.sqrt(2 * jnp.pi)))

        log_lik = lambda x: log_mix(x) - log_prior(x)
        K = 4096
        x0 = s0 * jax.random.normal(KEY, (K, 1))
        out = samplers.smc_sampler(log_prior, log_lik, x0,
                                   key=jax.random.PRNGKey(2),
                                   num_moves=5, step_size=0.5)
        xs = np.asarray(out["particles"])[:, 0]
        right = (xs > 0).mean()
        assert 0.35 < right < 0.65, right
        assert abs(float(out["log_normalizer"])) < 0.1
        # Mode locations correct.
        assert abs(np.abs(xs).mean() - mu) < 0.2


class TestStructure:
    def test_pytree_particles_and_per_leaf_steps(self):
        log_prior = lambda p: (-0.5 * jnp.sum(p["a"] ** 2) -
                               0.5 * jnp.sum((p["b"] / 2.0) ** 2))
        log_lik = lambda p: -0.5 * jnp.sum((p["a"] - 1.0) ** 2)
        K = 512
        x0 = {"a": jax.random.normal(KEY, (K, 2)),
              "b": 2.0 * jax.random.normal(jax.random.PRNGKey(1),
                                           (K, 3))}
        out = samplers.smc_sampler(
            log_prior, log_lik, x0, key=KEY, num_moves=2,
            step_size={"a": 0.3, "b": 0.6}, return_history=True)
        assert out["particles"]["a"].shape == (K, 2)
        assert out["particles"]["b"].shape == (K, 3)
        assert 0.0 < float(out["acceptance_rate"]) < 1.0
        assert int(out["num_steps"]) >= 1
        bh = np.asarray(out["beta_history"])
        taken = bh[np.isfinite(bh)]
        assert taken[-1] == 1.0
        assert np.all(np.diff(taken) > 0) if len(taken) > 1 else True

    def test_max_steps_forces_completion(self):
        log_prior, log_lik, *_ = _gaussian_problem()
        x0 = 2.0 * jax.random.normal(KEY, (256, 4))
        out = samplers.smc_sampler(log_prior, log_lik, x0, key=KEY,
                                   ess_target=0.99, max_steps=3)
        assert int(out["num_steps"]) == 3
        assert not bool(out["reached_final"])
        assert np.isfinite(float(out["log_normalizer"]))

    def test_num_moves_zero_is_pure_annealed_is(self):
        log_prior, log_lik, *_ = _gaussian_problem(D=2)
        x0 = 2.0 * jax.random.normal(KEY, (512, 2))
        out = samplers.smc_sampler(log_prior, log_lik, x0, key=KEY,
                                   num_moves=0)
        assert float(out["acceptance_rate"]) == 0.0
        assert np.isfinite(float(out["log_normalizer"]))

    def test_jittable(self):
        log_prior, log_lik, *_ = _gaussian_problem(D=2)
        x0 = 2.0 * jax.random.normal(KEY, (128, 2))

        @jax.jit
        def run(k):
            return samplers.smc_sampler(
                log_prior, log_lik, x0, key=k)["log_normalizer"]

        a, b = run(KEY), run(KEY)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_validation_errors(self):
        log_prior, log_lik, *_ = _gaussian_problem(D=2)
        x0 = jnp.zeros((8, 2))
        with pytest.raises(ValueError, match="ess_target"):
            samplers.smc_sampler(log_prior, log_lik, x0,
                                 ess_target=1.5)
        with pytest.raises(ValueError, match="num_moves"):
            samplers.smc_sampler(log_prior, log_lik, x0, num_moves=-1)


class TestDistributed:
    """The sampler is mesh-capable through the standard
    `resampling_implementation` callable hook: a shard_map distributed
    resampler + GSPMD-sharded densities/moves."""

    @pytest.mark.parametrize("pp", [8, 4])
    def test_sharded_matches_single_device(self, pp):
        from jax.sharding import NamedSharding, PartitionSpec as P
        from aesmc_tpu import parallel

        log_prior, log_lik, y, exact_lz, pm, pv = _gaussian_problem()
        K = 1024
        x0 = 2.0 * jax.random.normal(jax.random.PRNGKey(1), (K, 4))
        ref = samplers.smc_sampler(log_prior, log_lik, x0, key=KEY,
                                   num_moves=2, step_size=0.4)

        mesh = parallel.make_mesh(data=1, particle=pp)
        dist = parallel.make_distributed_resampler(
            mesh, method="systematic")
        x0_sharded = jax.device_put(
            x0, NamedSharding(mesh, P("particle", None)))
        out = jax.jit(lambda x: samplers.smc_sampler(
            log_prior, log_lik, x, key=KEY, num_moves=2,
            step_size=0.4, resampling_implementation=dist))(x0_sharded)
        # Indices are bit-exact vs single-device; remaining diffs are
        # f32 reduction-order only.
        assert int(out["num_steps"]) == int(ref["num_steps"])
        np.testing.assert_allclose(
            float(out["log_normalizer"]),
            float(ref["log_normalizer"]), rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(out["particles"]).mean(0),
            np.asarray(ref["particles"]).mean(0), atol=1e-3)
        assert abs(float(out["log_normalizer"]) - exact_lz) < 0.2


class TestWasteFree:
    """Waste-free SMC (Dau & Chopin 2022): all chain states kept."""

    @pytest.mark.parametrize("method", ["multinomial", "systematic"])
    def test_evidence_and_posterior_moments(self, method):
        D = 4
        log_prior, log_lik, y, exact_lz, pm, pv = _gaussian_problem(D)
        K, M = 2048, 64
        x0 = 2.0 * jax.random.normal(jax.random.PRNGKey(1), (K, D))
        lzs, means = [], []
        for seed in range(3):
            out = samplers.smc_sampler(
                log_prior, log_lik, x0, key=jax.random.PRNGKey(seed),
                num_moves=1, step_size=0.4, waste_free_chains=M,
                resampling_method=method, return_history=True)
            assert bool(out["reached_final"])
            assert np.asarray(out["particles"]).shape == (K, D)
            lzs.append(float(out["log_normalizer"]))
            means.append(np.asarray(out["particles"]).mean(0))
        assert abs(np.mean(lzs) - exact_lz) < 0.15, (np.mean(lzs),
                                                     exact_lz)
        np.testing.assert_allclose(np.mean(means, axis=0), pm,
                                   atol=4 * np.sqrt(pv / 2048) + 0.05)

    def test_chain_structure_and_acceptance(self):
        log_prior, log_lik, *_ = _gaussian_problem(D=2)
        K, M = 64, 8
        x0 = 2.0 * jax.random.normal(KEY, (K, 2))
        out = samplers.smc_sampler(
            log_prior, log_lik, x0, key=KEY, num_moves=2,
            step_size=0.5, waste_free_chains=M)
        assert np.asarray(out["particles"]).shape == (K, 2)
        acc = float(out["acceptance_rate"])
        assert 0.0 < acc <= 1.0, acc

    def test_fixed_ladder_waste_free(self):
        log_prior, log_lik, y, exact_lz, *_ = _gaussian_problem()
        K = 2048
        x0 = 2.0 * jax.random.normal(jax.random.PRNGKey(1), (K, 4))
        betas = jnp.linspace(0.05, 1.0, 20)
        out = samplers.smc_sampler(
            log_prior, log_lik, x0, key=KEY, num_moves=1,
            step_size=0.4, betas=betas, waste_free_chains=128)
        assert abs(float(out["log_normalizer"]) - exact_lz) < 0.2

    def test_more_chains_fewer_steps_tradeoff_runs(self):
        """Same budget, different M: both valid clouds (smoke for the
        M knob across its range)."""
        log_prior, log_lik, y, exact_lz, *_ = _gaussian_problem(D=2)
        K = 512
        x0 = 2.0 * jax.random.normal(KEY, (K, 2))
        for M in (2, 256):
            out = samplers.smc_sampler(
                log_prior, log_lik, x0, key=KEY, num_moves=1,
                step_size=0.4, waste_free_chains=M)
            assert np.isfinite(float(out["log_normalizer"]))

    def test_validation(self):
        log_prior, log_lik, *_ = _gaussian_problem(D=2)
        x0 = jnp.zeros((32, 2))
        with pytest.raises(ValueError, match="divide"):
            samplers.smc_sampler(log_prior, log_lik, x0,
                                 waste_free_chains=7)
        with pytest.raises(ValueError, match="1 <= M < K"):
            samplers.smc_sampler(log_prior, log_lik, x0,
                                 waste_free_chains=32)
        with pytest.raises(ValueError, match="num_moves"):
            samplers.smc_sampler(log_prior, log_lik, x0,
                                 waste_free_chains=8, num_moves=0)
