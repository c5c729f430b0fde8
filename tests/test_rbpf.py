"""Rao-Blackwellized PF (aesmc_tpu.rbpf, beyond parity).

Two exact oracles: with u-independent linear parameters the log-
evidence must equal the exact N-dim Kalman likelihood for ANY K (the
particle weights are identical, so no Monte Carlo error survives); on
a 2-regime switching LGSSM the evidence and regime posterior must
match exhaustive enumeration over all 2^T regime paths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aesmc_tpu import distributions, rbpf
from aesmc_tpu.models import kalman_nd

KEY = jax.random.PRNGKey(0)


# ---------------------------------------------------------------------
# Oracle 1: linear parameters independent of u.
# ---------------------------------------------------------------------

def _u_independent_problem(T=15, B=3, D=2, seed=2):
    rng = np.random.default_rng(seed)
    a = np.array([[0.9, 0.1], [0.0, 0.8]])
    q = 0.5 * np.eye(D)
    c = np.array([[1.0, 0.5]])
    r = np.array([[0.09]])
    m0 = np.zeros(D)
    p0 = np.eye(D)
    params = kalman_nd.KalmanNdParams(m0, p0, a, q, c, r)
    # Simulate observations from the model.
    obs = np.zeros((T, B, 1))
    for b in range(B):
        x = rng.multivariate_normal(m0, p0)
        for t in range(T):
            if t > 0:
                x = a @ x + rng.multivariate_normal(np.zeros(D), q)
            obs[t, b] = c @ x + rng.multivariate_normal(np.zeros(1), r)
    comps = dict(
        initial=lambda: distributions.Normal(jnp.zeros(()),
                                             jnp.ones(())),
        transition=lambda previous_latents, time: distributions.Normal(
            0.5 * previous_latents[0], 1.0),
        linear_initial=lambda u0: (jnp.asarray(m0), jnp.asarray(p0)),
        linear_dynamics=lambda u, time: (jnp.asarray(a), jnp.zeros(D),
                                         jnp.asarray(q)),
        linear_emission=lambda u, time: (jnp.asarray(c), jnp.zeros(1),
                                         jnp.asarray(r)),
    )
    return obs, comps, params


class TestUIndependentExactness:
    @pytest.mark.parametrize("num_particles", [1, 7, 64])
    def test_log_z_equals_kalman_for_any_k(self, num_particles):
        obs, comps, params = _u_independent_problem()
        out = rbpf.rbpf(jnp.asarray(obs), num_particles=num_particles,
                        key=KEY, **comps)
        for b in range(obs.shape[1]):
            exact = kalman_nd.kalman_filter_nd(obs[:, b], params)[4]
            got = float(out["log_marginal_likelihood"][b])
            assert abs(got - exact) < 1e-3 * abs(exact), (got, exact)

    def test_filtered_means_equal_kalman(self):
        obs, comps, params = _u_independent_problem()
        out = rbpf.rbpf(jnp.asarray(obs), num_particles=5, key=KEY,
                        **comps)
        for b in range(obs.shape[1]):
            m_exact = kalman_nd.kalman_filter_nd(obs[:, b], params)[0]
            np.testing.assert_allclose(
                np.asarray(out["filtered_means"][:, b]), m_exact,
                atol=1e-3)


# ---------------------------------------------------------------------
# Oracle 2: 2-regime switching LGSSM vs exhaustive path enumeration.
# ---------------------------------------------------------------------

SW = dict(pi0=np.array([0.6, 0.4]),
          pmat=np.array([[0.85, 0.15], [0.3, 0.7]]),
          a_by_regime=np.array([0.95, 0.2]),
          qvar=1.0, cmat=1.0, rvar=0.25, m0=0.0, p0=2.0)


def _switching_problem(T=8, B=1, seed=7):
    rng = np.random.default_rng(seed)
    obs = np.zeros((T, B, 1))
    for b in range(B):
        u = rng.choice(2, p=SW["pi0"])
        x = rng.normal(SW["m0"], np.sqrt(SW["p0"]))
        for t in range(T):
            if t > 0:
                u = rng.choice(2, p=SW["pmat"][u])
                x = SW["a_by_regime"][u] * x + rng.normal(
                    0.0, np.sqrt(SW["qvar"]))
            obs[t, b, 0] = SW["cmat"] * x + rng.normal(
                0.0, np.sqrt(SW["rvar"]))
    return obs


def _scalar_tv_kalman(y, a_path):
    """Time-varying scalar Kalman log-lik for one regime path.
    a_path[t] applies to the transition INTO time t (ignored at t=0)."""
    m, p = SW["m0"], SW["p0"]
    ll = 0.0
    for t in range(len(y)):
        if t > 0:
            m = a_path[t] * m
            p = a_path[t] ** 2 * p + SW["qvar"]
        s = SW["cmat"] ** 2 * p + SW["rvar"]
        innov = y[t] - SW["cmat"] * m
        ll += -0.5 * (np.log(2 * np.pi * s) + innov ** 2 / s)
        gain = p * SW["cmat"] / s
        m = m + gain * innov
        p = (1.0 - gain * SW["cmat"]) * p
    return ll


def _enumerate_exact(y):
    """Exact log p(y) and regime posteriors by summing all 2^T paths."""
    T = len(y)
    log_joint, last_regime, regime_paths = [], [], []
    for bits in range(2 ** T):
        path = [(bits >> t) & 1 for t in range(T)]
        lp = np.log(SW["pi0"][path[0]])
        for t in range(1, T):
            lp += np.log(SW["pmat"][path[t - 1], path[t]])
        a_path = [np.nan] + [SW["a_by_regime"][path[t]]
                             for t in range(1, T)]
        log_joint.append(lp + _scalar_tv_kalman(y, a_path))
        last_regime.append(path[-1])
        regime_paths.append(path)
    log_joint = np.array(log_joint)
    mx = log_joint.max()
    log_z = mx + np.log(np.exp(log_joint - mx).sum())
    w = np.exp(log_joint - log_z)
    e_last = float((w * np.array(last_regime)).sum())
    return float(log_z), e_last


def _switching_components():
    pi0 = jnp.log(jnp.asarray(SW["pi0"]))
    pl = jnp.log(jnp.asarray(SW["pmat"]))
    a_r = jnp.asarray(SW["a_by_regime"])

    def initial():
        return distributions.Categorical(logits=pi0)

    def transition(previous_latents, time):
        return distributions.Categorical(logits=pl[previous_latents[0]])

    def linear_initial(u0):
        return (jnp.full(u0.shape + (1,), SW["m0"]),
                jnp.full(u0.shape + (1, 1), SW["p0"]))

    def linear_dynamics(u, time):
        return (a_r[u][..., None, None], jnp.zeros(1),
                jnp.full((1, 1), SW["qvar"]))

    def linear_emission(u, time):
        return (jnp.full((1, 1), SW["cmat"]), jnp.zeros(1),
                jnp.full((1, 1), SW["rvar"]))

    return dict(initial=initial, transition=transition,
                linear_initial=linear_initial,
                linear_dynamics=linear_dynamics,
                linear_emission=linear_emission)


class TestSwitchingOracle:
    def test_evidence_and_regime_posterior_match_enumeration(self):
        obs = _switching_problem()
        exact_lz, exact_e_last = _enumerate_exact(obs[:, 0, 0])
        comps = _switching_components()
        lzs, e_lasts = [], []
        for seed in range(4):
            out = rbpf.rbpf(jnp.asarray(obs), num_particles=4096,
                            key=jax.random.PRNGKey(seed),
                            resampling_method="systematic", **comps)
            lzs.append(float(out["log_marginal_likelihood"][0]))
            w = np.asarray(
                jax.nn.softmax(out["log_weight"], axis=1))[0]
            u_last = np.asarray(out["nonlinear_latents"])[0]
            e_lasts.append(float((w * u_last).sum()))
        assert abs(np.mean(lzs) - exact_lz) < 0.05, (np.mean(lzs),
                                                     exact_lz)
        assert abs(np.mean(e_lasts) - exact_e_last) < 0.03, \
            (np.mean(e_lasts), exact_e_last)

    def test_multinomial_and_stratified_agree(self):
        obs = _switching_problem()
        exact_lz, _ = _enumerate_exact(obs[:, 0, 0])
        comps = _switching_components()
        for method in ("multinomial", "stratified"):
            out = rbpf.rbpf(jnp.asarray(obs), num_particles=4096,
                            key=KEY, resampling_method=method, **comps)
            assert abs(float(out["log_marginal_likelihood"][0]) -
                       exact_lz) < 0.25, method


# ---------------------------------------------------------------------
# Structure / API.
# ---------------------------------------------------------------------

class TestStructure:
    def test_shapes_history_jit(self):
        obs = _switching_problem(T=5, B=2)
        comps = _switching_components()
        out = jax.jit(lambda o: rbpf.rbpf(
            o, num_particles=16, key=KEY, return_history=True,
            **comps))(jnp.asarray(obs))
        assert out["log_marginal_likelihood"].shape == (2,)
        assert out["nonlinear_latents"].shape == (2, 16)
        assert out["linear_means"].shape == (2, 16, 1)
        assert out["linear_covs"].shape == (2, 16, 1, 1)
        assert out["filtered_means"].shape == (5, 2, 1)
        assert out["nonlinear_latents_history"].shape == (5, 2, 16)
        assert out["linear_means_history"].shape == (5, 2, 16, 1)
        assert out["log_weights_history"].shape == (5, 2, 16)

    def test_2d_observations_and_t1(self):
        obs, comps, params = _u_independent_problem(T=1, B=2)
        out = rbpf.rbpf(jnp.asarray(obs[:, :, 0]), num_particles=4,
                        key=KEY, return_history=True, **comps)
        exact = kalman_nd.kalman_filter_nd(obs[:, 0], params)[4]
        assert abs(float(out["log_marginal_likelihood"][0]) -
                   exact) < 1e-3 * abs(exact)
        assert out["filtered_means"].shape == (1, 2, 2)
        assert out["log_weights_history"].shape == (1, 2, 4)

    def test_proposal_equal_prior_matches_bootstrap(self):
        obs = _switching_problem(T=6)
        comps = _switching_components()
        pl = jnp.log(jnp.asarray(SW["pmat"]))
        pi0 = jnp.log(jnp.asarray(SW["pi0"]))

        def proposal(previous_latents=None, time=None,
                     observations=None):
            if previous_latents is None:
                return distributions.Categorical(logits=pi0)
            return distributions.Categorical(
                logits=pl[previous_latents[0]])

        a = rbpf.rbpf(jnp.asarray(obs), num_particles=32, key=KEY,
                      **comps)
        b = rbpf.rbpf(jnp.asarray(obs), num_particles=32, key=KEY,
                      proposal=proposal, **comps)
        np.testing.assert_allclose(
            np.asarray(a["log_marginal_likelihood"]),
            np.asarray(b["log_marginal_likelihood"]), rtol=1e-6)
        np.testing.assert_array_equal(
            np.asarray(a["nonlinear_latents"]),
            np.asarray(b["nonlinear_latents"]))

    def test_never_resample_threshold_zero(self):
        obs = _switching_problem(T=6)
        comps = _switching_components()
        out = rbpf.rbpf(jnp.asarray(obs), num_particles=32, key=KEY,
                        ess_threshold=0.0, return_history=True, **comps)
        assert np.isfinite(
            float(out["log_marginal_likelihood"][0]))
        # Without resampling the weights accumulate (non-uniform).
        w = np.asarray(out["log_weights_history"])
        assert np.std(w[-1]) > 0.0

    def test_distributed_resampler_matches_single_device(self):
        from jax.sharding import NamedSharding, PartitionSpec as P
        from aesmc_tpu import parallel

        obs = _switching_problem(T=8, B=2)
        comps = _switching_components()
        ref = rbpf.rbpf(jnp.asarray(obs), num_particles=256, key=KEY,
                        **comps)
        mesh = parallel.make_mesh(data=2, particle=4)
        dist = parallel.make_distributed_resampler(
            mesh, method="systematic")
        obs_sharded = jax.device_put(
            jnp.asarray(obs), NamedSharding(mesh, P(None, "data")))
        out = jax.jit(lambda o: rbpf.rbpf(
            o, num_particles=256, key=KEY,
            resampling_implementation=dist, **comps))(obs_sharded)
        np.testing.assert_allclose(
            np.asarray(out["log_marginal_likelihood"]),
            np.asarray(ref["log_marginal_likelihood"]),
            rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(out["filtered_means"]),
            np.asarray(ref["filtered_means"]), atol=1e-3)

    def test_validation_errors(self):
        obs = _switching_problem(T=3)
        comps = _switching_components()
        with pytest.raises(ValueError, match="num_particles"):
            rbpf.rbpf(jnp.asarray(obs), num_particles=0, key=KEY,
                      **comps)
        with pytest.raises(ValueError, match="ess_threshold"):
            rbpf.rbpf(jnp.asarray(obs), num_particles=4, key=KEY,
                      ess_threshold=2.0, **comps)
        with pytest.raises(ValueError, match="observations"):
            rbpf.rbpf(jnp.zeros((3, 2, 1, 1)), num_particles=4,
                      key=KEY, **comps)


def test_psd_inverse_small_matches_cholesky():
    """The closed-form Do<=3 solves and the Do in [4, 8] Schur-block
    recursion (the tiny-Cholesky-trap bypass) match the generic
    factorization route on random PSD batches."""
    import numpy as np
    from aesmc_tpu.rbpf import _psd_inverse_small
    rng = np.random.RandomState(0)
    for do in (1, 2, 3, 4, 5, 6, 7, 8):
        a = rng.randn(5, 7, do, do)
        s = jnp.asarray(a @ np.swapaxes(a, -1, -2) + 0.5 * np.eye(do))
        log_det, inv = _psd_inverse_small(s)
        s64 = np.asarray(s, np.float64)
        sign, ref_logdet = np.linalg.slogdet(s64)
        assert np.all(sign > 0)
        np.testing.assert_allclose(np.asarray(log_det), ref_logdet,
                                   rtol=2e-6, atol=2e-6)
        np.testing.assert_allclose(np.asarray(inv), np.linalg.inv(s64),
                                   rtol=2e-4, atol=2e-5)


def test_psd_inverse_warns_above_do8():
    """Do > 8 engages the serialized-Cholesky fallback and must say so."""
    import numpy as np
    from aesmc_tpu.rbpf import _psd_inverse_small
    rng = np.random.RandomState(1)
    a = rng.randn(2, 3, 9, 9)
    s = jnp.asarray(a @ np.swapaxes(a, -1, -2) + 0.5 * np.eye(9))
    with pytest.warns(UserWarning, match="tiny-Cholesky"):
        log_det, inv = _psd_inverse_small(s)
    s64 = np.asarray(s, np.float64)
    np.testing.assert_allclose(np.asarray(log_det),
                               np.linalg.slogdet(s64)[1],
                               rtol=2e-6, atol=2e-6)
    np.testing.assert_allclose(np.asarray(inv), np.linalg.inv(s64),
                               rtol=2e-4, atol=2e-5)
