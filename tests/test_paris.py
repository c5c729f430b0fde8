"""PaRIS forward-only smoothing (aesmc_tpu.smoothing.paris).

Ground truth: exact RTS smoothed moments of the LGSSM, including
lag-one cross-moments E[x_{t-1} x_t | y] from the standard RTS gain
J_t = a * Vf_t / Ppred_{t+1}, Cov(x_t, x_{t+1} | y) = J_t * Vs_{t+1}.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aesmc_tpu import smoothing
from aesmc_tpu.models import kalman, lgssm

KEY = jax.random.PRNGKey(0)
A, Q, EM, R0 = 0.9, 1.0, 1.0, 0.5
T, B, K = 20, 2, 1024


def _components():
    """LGSSM with the ANALYTICALLY OPTIMAL proposal (conjugate one-step
    posterior): q(x_t | x_{t-1}, y_t) = N((a x/q + em y/r) / prec, 1/prec)
    with prec = 1/q + em^2/r - so the filter's MC error is tiny and the
    exact-RTS comparisons below are sharp."""
    initial = lgssm.Initial(0.0, 1.0)
    transition = lgssm.Transition.create(A, np.sqrt(Q))
    emission = lgssm.Emission.create(EM, np.sqrt(R0))
    prec_t = 1.0 / Q + EM ** 2 / R0
    prec_0 = 1.0 / 1.0 + EM ** 2 / R0
    proposal = lgssm.Proposal(
        lin_0_weight=jnp.asarray((EM / R0) / prec_0),
        lin_0_bias=jnp.asarray(0.0),
        lin_t_weight=jnp.asarray([(A / Q) / prec_t, (EM / R0) / prec_t]),
        lin_t_bias=jnp.asarray(0.0),
        scale_0=float(np.sqrt(1.0 / prec_0)),
        scale_t=float(np.sqrt(1.0 / prec_t)))
    return initial, transition, emission, proposal


def _params():
    return kalman.KalmanParams(
        initial_mean=0.0, initial_variance=1.0,
        transition_mult=A, transition_offset=0.0, transition_variance=Q,
        emission_mult=EM, emission_offset=0.0, emission_variance=R0)


def _observations():
    """Observations GENERATED FROM THE MODEL (the regime every oracle
    test in this suite uses - off-model data inflates the proposal
    mismatch and the log-Z Jensen bias at finite K)."""
    from aesmc_tpu import statistics
    initial, transition, emission, _ = _components()
    _, obs = statistics.sample_from_prior(
        initial, transition, emission, T, B, key=jax.random.PRNGKey(11))
    return obs


def _exact_moments(obs_b):
    """(smoothed means, smoothed vars, lag-one cross moments E[x_t x_{t+1}])."""
    params = _params()
    fm, fv = kalman.kalman_filter(obs_b, params)[:2]
    sm, sv = kalman.kalman_smoother(obs_b, params)
    ppred = A ** 2 * fv[:-1] + Q                    # prior var at t+1
    j = A * fv[:-1] / ppred                         # RTS gain J_t
    cross = j * sv[1:] + sm[:-1] * sm[1:]           # E[x_t x_{t+1} | y]
    return sm, sv, cross


class TestExactness:
    def test_smoothed_sum_of_states(self):
        obs = _observations()
        out = smoothing.paris(
            obs, *_components(), K,
            h=lambda xp, xc, t: xc, h0=lambda x0: x0, key=KEY)
        est = np.asarray(out["smoothed"])
        for b in range(B):
            sm, _, _ = _exact_moments(np.asarray(obs[:, b], np.float64))
            assert abs(est[b] - sm.sum()) < 0.35, (b, est[b], sm.sum())

    def test_smoothed_cross_moments(self):
        """E[sum_t x_{t-1} x_t | y] - the EM sufficient statistic."""
        obs = _observations()
        out = smoothing.paris(
            obs, *_components(), K,
            h=lambda xp, xc, t: xp * xc, key=KEY)
        est = np.asarray(out["smoothed"])
        for b in range(B):
            _, _, cross = _exact_moments(np.asarray(obs[:, b], np.float64))
            assert abs(est[b] - cross.sum()) < 0.5, (b, est[b], cross.sum())

    def test_log_ml_matches_exact(self):
        obs = _observations()
        out = smoothing.paris(obs, *_components(), K,
                              h=lambda xp, xc, t: xc, key=KEY)
        lml = np.asarray(out["log_marginal_likelihood"])
        for b in range(B):
            exact = kalman.kalman_filter(
                np.asarray(obs[:, b], np.float64), _params())[-1]
            assert abs(lml[b] - exact) < 0.5, (b, lml[b], exact)


class TestScore:
    def test_score_matches_kalman_finite_differences(self):
        """Fisher-identity score via PaRIS vs central differences of the
        EXACT Kalman log-likelihood in (a, c)."""
        obs = _observations()
        params = {"a": jnp.asarray(A), "c": jnp.asarray(EM)}

        def build(p):
            initial = lgssm.Initial(0.0, 1.0)
            transition = lgssm.Transition(mult=p["a"],
                                          scale=float(np.sqrt(Q)))
            emission = lgssm.Emission(mult=p["c"],
                                      scale=float(np.sqrt(R0)))
            proposal = _components()[3]
            return initial, transition, emission, proposal

        out = smoothing.paris_score(obs, build, params, K, key=KEY)
        score = out["score"]
        assert score["a"].shape == (B,) and score["c"].shape == (B,)

        def exact_lml(a, c, obs_b):
            p = kalman.KalmanParams(0.0, 1.0, a, 0.0, Q, c, 0.0, R0)
            return kalman.kalman_filter(obs_b, p)[-1]

        eps = 1e-4
        for b in range(B):
            ob = np.asarray(obs[:, b], np.float64)
            da = (exact_lml(A + eps, EM, ob) -
                  exact_lml(A - eps, EM, ob)) / (2 * eps)
            dc = (exact_lml(A, EM + eps, ob) -
                  exact_lml(A, EM - eps, ob)) / (2 * eps)
            # MC tolerance at K=1024, T=20 with the optimal proposal.
            assert abs(float(score["a"][b]) - da) < 0.25 * max(
                1.0, abs(da)), (b, float(score["a"][b]), da)
            assert abs(float(score["c"][b]) - dc) < 0.25 * max(
                1.0, abs(dc)), (b, float(score["c"][b]), dc)

    def test_score_near_zero_at_mle_direction(self):
        """Sanity: at the data-generating parameters the average score
        over many sequences is ~0 (the ML estimating equation)."""
        from aesmc_tpu import statistics

        params = {"a": jnp.asarray(A), "c": jnp.asarray(EM)}

        def build(p):
            initial = lgssm.Initial(0.0, 1.0)
            transition = lgssm.Transition(mult=p["a"],
                                          scale=float(np.sqrt(Q)))
            emission = lgssm.Emission(mult=p["c"],
                                      scale=float(np.sqrt(R0)))
            return initial, transition, emission, _components()[3]

        _, obs = statistics.sample_from_prior(
            *build(params)[:3], 30, 16, key=jax.random.PRNGKey(21))
        out = smoothing.paris_score(obs, build, params, 256, key=KEY)
        mean_score_a = float(np.mean(np.asarray(out["score"]["a"])))
        # Per-sequence score std is O(sqrt(T)); the 16-sequence mean
        # should be near zero relative to that scale.
        per_seq_std = float(np.std(np.asarray(out["score"]["a"])))
        assert abs(mean_score_a) < per_seq_std, (mean_score_a,
                                                 per_seq_std)


class TestStructure:
    def test_vmap_matches_broadcast(self):
        """Identical logits => identical draws => identical outputs."""
        obs = jax.random.normal(jax.random.PRNGKey(5), (6, 2))
        o1 = smoothing.paris(obs, *_components(), 64,
                             h=lambda xp, xc, t: xc, key=KEY,
                             pairwise="broadcast")
        o2 = smoothing.paris(obs, *_components(), 64,
                             h=lambda xp, xc, t: xc, key=KEY,
                             pairwise="vmap")
        np.testing.assert_allclose(np.asarray(o1["smoothed"]),
                                   np.asarray(o2["smoothed"]),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(o1["tau"]),
                                   np.asarray(o2["tau"]),
                                   rtol=1e-5, atol=1e-6)

    def test_vector_statistic(self):
        """[B, K, D] increments carry through (joint sufficient stats)."""
        obs = jax.random.normal(jax.random.PRNGKey(6), (5, 2))
        out = smoothing.paris(
            obs, *_components(), 128,
            h=lambda xp, xc, t: jnp.stack([xc, xp * xc, xc * xc], axis=-1),
            h0=lambda x0: jnp.stack([x0, jnp.zeros_like(x0),
                                     x0 * x0], axis=-1),
            key=KEY)
        assert out["smoothed"].shape == (2, 3)
        assert out["tau"].shape == (2, 128, 3)
        assert np.all(np.isfinite(np.asarray(out["smoothed"])))
        # Third column is sum of second moments: strictly positive.
        assert np.all(np.asarray(out["smoothed"])[:, 2] > 0)

    def test_t1_returns_h0_expectation(self):
        obs = jax.random.normal(jax.random.PRNGKey(7), (1, 2))
        out = smoothing.paris(obs, *_components(), 256,
                              h=lambda xp, xc, t: xc,
                              h0=lambda x0: x0, key=KEY)
        w = jax.nn.softmax(out["log_weight"], axis=1)
        # smoothed == weighted tau == weighted h0 here.
        np.testing.assert_allclose(
            np.asarray(out["smoothed"]),
            np.asarray(jnp.sum(w * out["tau"], axis=1)), rtol=1e-6)

    def test_jittable_and_remat(self):
        obs = jax.random.normal(jax.random.PRNGKey(8), (5, 2))
        f = jax.jit(lambda o: smoothing.paris(
            obs, *_components(), 64, h=lambda xp, xc, t: xc,
            key=KEY, remat=True)["smoothed"])
        assert np.all(np.isfinite(np.asarray(f(obs))))

    def test_single_draw_allowed(self):
        obs = jax.random.normal(jax.random.PRNGKey(9), (4, 1))
        out = smoothing.paris(obs, *_components(), 64,
                              h=lambda xp, xc, t: xc, key=KEY,
                              num_backward_draws=1)
        assert np.all(np.isfinite(np.asarray(out["smoothed"])))

    def test_validation(self):
        obs = jax.random.normal(jax.random.PRNGKey(9), (4, 1))
        with pytest.raises(ValueError, match="num_backward_draws"):
            smoothing.paris(obs, *_components(), 8,
                            h=lambda xp, xc, t: xc,
                            num_backward_draws=0)
        with pytest.raises(ValueError, match="pairwise"):
            smoothing.paris(obs, *_components(), 8,
                            h=lambda xp, xc, t: xc, pairwise="bogus")
        with pytest.raises(ValueError, match="backward"):
            smoothing.paris(obs, *_components(), 8,
                            h=lambda xp, xc, t: xc, backward="bogus")


class TestRejectionBackward:
    """backward='rejection': O(K) backward draws by rejection against
    the auto transition-density bound (exact for Gaussians)."""

    def test_matches_exact_moments(self):
        """Same RTS oracle as the pairwise tests - the rejection draw
        targets the identical categorical, so the estimator tolerance
        is unchanged."""
        obs = _observations()
        out = smoothing.paris(
            obs, *_components(), K,
            h=lambda xp, xc, t: jnp.stack([xc, xp * xc], axis=-1),
            h0=lambda x0: jnp.stack([x0, jnp.zeros_like(x0)], axis=-1),
            key=KEY, backward="rejection", num_backward_draws=4)
        est = np.asarray(out["smoothed"])
        for b in range(B):
            sm, _, cross = _exact_moments(np.asarray(obs[:, b],
                                                     np.float64))
            assert abs(est[b, 0] - sm.sum()) < 0.35, (b, est[b, 0],
                                                      sm.sum())
            assert abs(est[b, 1] - cross.sum()) < 0.5, (b, est[b, 1],
                                                        cross.sum())

    def test_diagnostics_exact_run(self):
        """With the exact Gaussian bound and 64 rounds every lane
        accepts: unconverged == 0 means the draw was EXACT."""
        obs = _observations()
        out = smoothing.paris(obs, *_components(), 256,
                              h=lambda xp, xc, t: xc, key=KEY,
                              backward="rejection")
        acc = np.asarray(out["backward_accept_rate"])
        unc = np.asarray(out["backward_unconverged"])
        assert np.all(unc == 0), unc
        assert np.all((acc > 0.0) & (acc <= 1.0)), acc

    def test_explicit_bound(self):
        """User-supplied transition_log_bound rides instead of auto.
        A looser (valid) bound only slows acceptance - the smoothed
        estimate stays consistent with the pairwise run."""
        obs = _observations()

        def bound(prev_latent, time, prev_obs):
            # N(.; mu, Q) peak is 1/sqrt(2 pi Q); pad by log 2.
            peak = -0.5 * np.log(2 * np.pi * Q)
            return jnp.full((B,), peak + np.log(2.0))

        o_rej = smoothing.paris(obs, *_components(), K,
                                h=lambda xp, xc, t: xc, key=KEY,
                                backward="rejection",
                                transition_log_bound=bound)
        o_pair = smoothing.paris(obs, *_components(), K,
                                 h=lambda xp, xc, t: xc, key=KEY)
        np.testing.assert_allclose(np.asarray(o_rej["smoothed"]),
                                   np.asarray(o_pair["smoothed"]),
                                   atol=0.5)
        assert np.all(np.asarray(o_rej["backward_unconverged"]) == 0)

    def test_jittable(self):
        obs = jax.random.normal(jax.random.PRNGKey(12), (6, 2))
        f = jax.jit(lambda o: smoothing.paris(
            o, *_components(), 64, h=lambda xp, xc, t: xc, key=KEY,
            backward="rejection")["smoothed"])
        assert np.all(np.isfinite(np.asarray(f(obs))))

    def test_t1_has_diagnostics(self):
        obs = jax.random.normal(jax.random.PRNGKey(13), (1, 2))
        out = smoothing.paris(obs, *_components(), 64,
                              h=lambda xp, xc, t: xc, key=KEY,
                              backward="rejection")
        assert out["backward_unconverged"].shape == (2,)
        assert np.all(np.asarray(out["backward_accept_rate"]) == 1.0)


class TestChunkedPairwise:
    """The streamed Gumbel-max pairwise backward (the exact categorical
    past the dense [B, K, K] tile wall)."""

    def _setup(self, Kp=12, C=5, B_=2):
        transition = lgssm.Transition.create(A, np.sqrt(Q))
        kx, kc, kw = jax.random.split(jax.random.PRNGKey(3), 3)
        prev_latent = jax.random.normal(kx, (B_, Kp))
        children = jax.random.normal(kc, (B_, C))
        prev_logw = jax.random.normal(kw, (B_, Kp))
        return transition, prev_latent, prev_logw, children

    def test_chunk_size_invariance(self):
        """Per-parent Gumbel keying: the draw is bit-identical whatever
        the chunking (chunk=K is the dense Gumbel-max)."""
        transition, prev_latent, prev_logw, children = self._setup()
        time = smoothing.TimeIndex(jnp.asarray(3, jnp.int32))
        draws = [
            smoothing._chunked_pairwise_backward_indices(
                KEY, prev_latent, prev_logw, children, transition, time,
                None, 2, "broadcast", chunk_target=ct)
            for ct in (12, 6, 4, 3, 2, 1)]
        for d in draws[1:]:
            np.testing.assert_array_equal(np.asarray(draws[0]),
                                          np.asarray(d))

    def test_vmap_matches_broadcast_mode(self):
        transition, prev_latent, prev_logw, children = self._setup()
        time = smoothing.TimeIndex(jnp.asarray(2, jnp.int32))
        a = smoothing._chunked_pairwise_backward_indices(
            KEY, prev_latent, prev_logw, children, transition, time,
            None, 1, "broadcast", chunk_target=4)
        b = smoothing._chunked_pairwise_backward_indices(
            KEY, prev_latent, prev_logw, children, transition, time,
            None, 1, "vmap", chunk_target=4)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_marginals_match_exact_categorical(self):
        """Identical children: every lane's draw is iid from the exact
        backward categorical - empirical frequencies match softmax of
        log w_j + log p(child | parent_j)."""
        Kp, C = 8, 8192
        transition = lgssm.Transition.create(A, np.sqrt(Q))
        kx, kw = jax.random.split(jax.random.PRNGKey(4))
        prev_latent = jax.random.normal(kx, (1, Kp))
        prev_logw = jax.random.normal(kw, (1, Kp))
        child_val = 0.3
        children = jnp.full((1, C), child_val)
        time = smoothing.TimeIndex(jnp.asarray(1, jnp.int32))
        idx = smoothing._chunked_pairwise_backward_indices(
            KEY, prev_latent, prev_logw, children, transition, time,
            None, 1, "broadcast", chunk_target=2)     # [1, C, 1]
        lp = jax.scipy.stats.norm.logpdf(
            child_val, A * prev_latent[0], np.sqrt(Q))
        probs = np.asarray(jax.nn.softmax(lp + prev_logw[0]))
        emp = np.array([(np.asarray(idx[0, :, 0]) == j).mean()
                        for j in range(Kp)])
        np.testing.assert_allclose(emp, probs, atol=0.02)

    def test_paris_routes_through_chunked_above_wall(self, monkeypatch):
        """Force the dense wall to zero: paris must still match the RTS
        smoothed sum (the streamed path is the same exact categorical)."""
        monkeypatch.setattr(smoothing, "PAIRWISE_DENSE_MAX_BYTES", 0)
        obs = _observations()
        out = smoothing.paris(
            obs, *_components(), K,
            h=lambda xp, xc, t: xc, h0=lambda x0: x0, key=KEY)
        est = np.asarray(out["smoothed"])
        for b in range(B):
            sm, _, _ = _exact_moments(np.asarray(obs[:, b], np.float64))
            assert abs(est[b] - sm.sum()) < 0.35, (b, est[b], sm.sum())
