"""Streaming filter (aesmc_tpu.online) vs the batch engine.

The contract under test: init_fn + T-1 step_fn calls, fed the batch
engine's own per-step key pairs (`online.split_step_keys`), reproduce
`infer('smc', ...)` exactly - same particles, weights, and log-Z - for
every resampling method, the ESS-adaptive criterion, and the APF
lookahead.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aesmc_tpu import inference, online
from aesmc_tpu.models import lgssm

KEY = jax.random.PRNGKey(7)
T, B, K = 12, 3, 64


def _components():
    initial = lgssm.Initial(0.0, 1.0)
    transition = lgssm.Transition.create(0.9, 1.0)
    emission = lgssm.Emission.create(1.0, 0.3)
    proposal = lgssm.Proposal.create(1.0, 1.0, key=jax.random.PRNGKey(3))
    return initial, transition, emission, proposal


def _observations():
    return jax.random.normal(jax.random.PRNGKey(11), (T, B))


def _run_online(obs, key, **kwargs):
    init_fn, step_fn = online.make_online_filter(*_components(), K, **kwargs)
    step_keys = online.split_step_keys(key, T)
    fs = init_fn(obs[0], step_keys[0])
    infos = []
    for t in range(1, T):
        fs, info = step_fn(fs, obs[t], step_keys[t])
        infos.append(info)
    return fs, infos


class TestParity:
    @pytest.mark.parametrize("method",
                             ["systematic", "stratified", "multinomial",
                              "residual"])
    def test_discrete_methods_match_infer(self, method):
        obs = _observations()
        ref = inference.infer(
            "smc", obs, *_components(), K, key=KEY,
            resampling_method=method,
            return_log_marginal_likelihood=True, return_latents=False)
        fs, _ = _run_online(obs, KEY, resampling_method=method)
        np.testing.assert_allclose(
            np.asarray(online.log_marginal_likelihood(fs)),
            np.asarray(ref["log_marginal_likelihood"]), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(fs.log_weight),
                                   np.asarray(ref["log_weight"]), rtol=2e-6, atol=1e-4)
        np.testing.assert_allclose(np.asarray(fs.latent),
                                   np.asarray(ref["last_latent"]),
                                   rtol=2e-6, atol=1e-4)
        assert int(fs.t) == T

    def test_soft_matches_infer(self):
        obs = _observations()
        ref = inference.infer(
            "smc", obs, *_components(), K, key=KEY,
            resampling_method="soft", soft_resampling_alpha=0.6,
            return_log_marginal_likelihood=True, return_latents=False)
        fs, _ = _run_online(obs, KEY, resampling_method="soft",
                            soft_resampling_alpha=0.6)
        np.testing.assert_allclose(
            np.asarray(online.log_marginal_likelihood(fs)),
            np.asarray(ref["log_marginal_likelihood"]), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(fs.log_weight),
                                   np.asarray(ref["log_weight"]), rtol=2e-6, atol=1e-4)

    def test_ot_matches_infer(self):
        obs = _observations()
        ref = inference.infer(
            "smc", obs, *_components(), K, key=KEY,
            resampling_method="ot", ot_num_iterations=10,
            return_log_marginal_likelihood=True, return_latents=False)
        fs, _ = _run_online(obs, KEY, resampling_method="ot",
                            ot_num_iterations=10)
        np.testing.assert_allclose(
            np.asarray(online.log_marginal_likelihood(fs)),
            np.asarray(ref["log_marginal_likelihood"]), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(fs.latent),
                                   np.asarray(ref["last_latent"]),
                                   rtol=2e-6, atol=1e-4)

    def test_adaptive_matches_infer(self):
        obs = _observations()
        ref = inference.infer(
            "smc", obs, *_components(), K, key=KEY,
            resampling_criterion=0.2,
            return_log_marginal_likelihood=True, return_latents=False)
        fs, infos = _run_online(obs, KEY, resampling_criterion=0.2)
        np.testing.assert_allclose(
            np.asarray(online.log_marginal_likelihood(fs)),
            np.asarray(ref["log_marginal_likelihood"]), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(fs.log_weight),
                                   np.asarray(ref["log_weight"]), rtol=2e-6, atol=1e-4)
        resampled = np.stack([np.asarray(i["resampled"]) for i in infos])
        assert resampled.any() and not resampled.all(), \
            "the adaptive test config should mix resampled/kept steps"

    def test_apf_lookahead_matches_infer(self):
        obs = _observations()
        initial, transition, emission, proposal = _components()
        look = lgssm.Lookahead.create(0.9, 1.0, 1.0, 0.3)
        ref = inference.infer(
            "smc", obs, initial, transition, emission, proposal, K,
            key=KEY, lookahead=look,
            return_log_marginal_likelihood=True, return_latents=False)
        init_fn, step_fn = online.make_online_filter(
            initial, transition, emission, proposal, K, lookahead=look)
        step_keys = online.split_step_keys(KEY, T)
        fs = init_fn(obs[0], step_keys[0])
        for t in range(1, T):
            fs, _ = step_fn(fs, obs[t], step_keys[t])
        np.testing.assert_allclose(
            np.asarray(online.log_marginal_likelihood(fs)),
            np.asarray(ref["log_marginal_likelihood"]), rtol=1e-6)

    def test_ancestors_match_infer(self):
        obs = _observations()
        ref = inference.infer(
            "smc", obs, *_components(), K, key=KEY,
            return_ancestral_indices=True, return_latents=False)
        fs, infos = _run_online(obs, KEY, return_ancestors=True)
        anc = np.stack([np.asarray(i["ancestral_index"]) for i in infos])
        np.testing.assert_array_equal(
            anc, np.asarray(ref["ancestral_indices"]))


class TestServing:
    def test_jitted_step_no_retrace(self):
        """The serving pattern: jit once, dispatch per observation."""
        obs = _observations()
        init_fn, step_fn = online.make_online_filter(*_components(), K)
        traces = []

        @jax.jit
        def jstep(fs, o, k):
            traces.append(None)
            return step_fn(fs, o, k)

        step_keys = online.split_step_keys(KEY, T)
        fs = jax.jit(init_fn)(obs[0], step_keys[0])
        for t in range(1, T):
            fs, info = jstep(fs, obs[t], step_keys[t])
        assert len(traces) == 1
        ref = inference.infer(
            "smc", obs, *_components(), K, key=KEY,
            return_log_marginal_likelihood=True, return_latents=False)
        np.testing.assert_allclose(
            np.asarray(online.log_marginal_likelihood(fs)),
            np.asarray(ref["log_marginal_likelihood"]), rtol=1e-6)

    def test_donated_carry(self):
        """The carry donates (buffer reuse - serving memory stays flat)."""
        obs = _observations()
        init_fn, step_fn = online.make_online_filter(*_components(), K)
        jstep = jax.jit(step_fn, donate_argnums=0)
        step_keys = online.split_step_keys(KEY, T)
        fs = init_fn(obs[0], step_keys[0])
        for t in range(1, T):
            fs, _ = jstep(fs, obs[t], step_keys[t])
        assert np.isfinite(
            np.asarray(online.log_marginal_likelihood(fs))).all()

    def test_single_key_mode(self):
        """Plain per-step keys (no parity pairs) also work."""
        obs = _observations()
        init_fn, step_fn = online.make_online_filter(*_components(), K)
        keys = jax.random.split(jax.random.PRNGKey(5), T)
        fs = init_fn(obs[0], keys[0])
        preds = []
        for t in range(1, T):
            fs, info = step_fn(fs, obs[t], keys[t])
            preds.append(info["log_pred"])
        # Predictive increments telescope to the running log-Z minus the
        # initial contribution.
        init_lz = online.log_marginal_likelihood(init_fn(obs[0], keys[0]))
        total = np.asarray(init_lz) + np.sum(
            np.stack([np.asarray(p) for p in preds]), axis=0)
        np.testing.assert_allclose(
            total, np.asarray(online.log_marginal_likelihood(fs)),
            atol=1e-5)

    def test_info_fields(self):
        obs = _observations()
        fs, infos = _run_online(obs, KEY)
        for info in infos:
            assert info["ess"].shape == (B,)
            assert info["log_pred"].shape == (B,)
            assert bool(info["resampled"].all())
            assert np.all(np.asarray(info["ess"]) >= 1.0 - 1e-5)
            assert np.all(np.asarray(info["ess"]) <= K + 1e-3)


class TestDistributed:
    def test_sharded_step_matches_single_device(self):
        """Streaming with a shard_map distributed resampler + sharded
        carry reproduces the single-device filter (indices bit-exact)."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        from aesmc_tpu import parallel

        obs = _observations()
        mesh = parallel.make_mesh(data=1, particle=8)
        dist = parallel.make_distributed_resampler(mesh,
                                                   method="systematic")
        fs_ref, _ = _run_online(obs, KEY)

        init_fn, step_fn = online.make_online_filter(
            *_components(), K, resampling_implementation=dist,
            mesh=mesh, data_axis="data", particle_axis="particle")
        step_keys = online.split_step_keys(KEY, T)
        fs = init_fn(obs[0], step_keys[0])
        fs = jax.device_put(fs, jax.tree_util.tree_map(
            lambda x: NamedSharding(
                mesh, P(*(("data", "particle") + (None,) *
                          (x.ndim - 2))[:x.ndim])), fs))
        jstep = jax.jit(step_fn)
        for t in range(1, T):
            fs, _ = jstep(fs, obs[t], step_keys[t])
        np.testing.assert_allclose(
            np.asarray(online.log_marginal_likelihood(fs)),
            np.asarray(online.log_marginal_likelihood(fs_ref)),
            rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(fs.log_weight),
                                   np.asarray(fs_ref.log_weight),
                                   rtol=1e-5, atol=1e-4)

    def test_sharded_streaming_paris_matches_single_device(self):
        """PaRIS tau riding a particle-sharded carry reproduces the
        single-device smoothed functional (same keys)."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        from aesmc_tpu import parallel

        obs = _observations()
        mesh = parallel.make_mesh(data=1, particle=8)
        dist = parallel.make_distributed_resampler(mesh,
                                                   method="systematic")

        def build(**kw):
            return online.make_online_filter(
                *_components(), K, paris_h=lambda xp, xc, t: xp * xc,
                paris_h0=lambda x0: jnp.zeros_like(x0), **kw)

        step_keys = online.split_step_keys(KEY, T, num_streams=3)

        init_ref, step_ref = build()
        fs_ref = init_ref(obs[0], step_keys[0])
        for t in range(1, T):
            fs_ref, info_ref = step_ref(fs_ref, obs[t], step_keys[t])

        init_fn, step_fn = build(resampling_implementation=dist,
                                 mesh=mesh, data_axis="data",
                                 particle_axis="particle")
        fs = init_fn(obs[0], step_keys[0])
        fs = jax.device_put(fs, jax.tree_util.tree_map(
            lambda x: NamedSharding(
                mesh, P(*(("data", "particle") + (None,) *
                          (x.ndim - 2))[:x.ndim])), fs))
        jstep = jax.jit(step_fn)
        for t in range(1, T):
            fs, info = jstep(fs, obs[t], step_keys[t])
        np.testing.assert_allclose(np.asarray(fs.tau),
                                   np.asarray(fs_ref.tau),
                                   rtol=2e-5, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(info["paris_smoothed"]),
            np.asarray(info_ref["paris_smoothed"]),
            rtol=2e-5, atol=1e-4)


class TestGenealogy:
    def test_running_variance_matches_batch_estimator(self):
        """track_genealogy's final info['log_z_rel_var'] == the offline
        Lee-Whiteley estimate on the batch run's ancestors (indices are
        bit-identical under matched keys)."""
        from aesmc_tpu import variance

        obs = _observations()
        ref = inference.infer(
            "smc", obs, *_components(), K, key=KEY,
            return_ancestral_indices=True, return_latents=False)
        offline = variance.log_z_variance(ref["log_weight"],
                                          ref["ancestral_indices"])
        fs, infos = _run_online(obs, KEY, track_genealogy=True)
        np.testing.assert_allclose(
            np.asarray(infos[-1]["log_z_rel_var"]), np.asarray(offline),
            rtol=1e-5, atol=1e-6)
        # Carried eves == offline eve composition.
        np.testing.assert_array_equal(
            np.asarray(fs.eve),
            np.asarray(variance.eve_indices(ref["ancestral_indices"])))
        assert np.all(np.asarray(fs.num_events) == T - 1)

    def test_adaptive_event_counts(self):
        fs, infos = _run_online(_observations(), KEY,
                                resampling_criterion=0.2,
                                track_genealogy=True)
        resampled = np.stack([np.asarray(i["resampled"]) for i in infos])
        np.testing.assert_array_equal(np.asarray(fs.num_events),
                                      resampled.sum(0))
        assert np.all(np.asarray(infos[-1]["log_z_rel_var"]) >= 0)

    def test_untracked_state_has_none_fields(self):
        fs, infos = _run_online(_observations(), KEY)
        assert fs.eve is None and fs.num_events is None
        assert "log_z_rel_var" not in infos[-1]

    def test_ot_genealogy_rejected(self):
        with pytest.raises(ValueError, match="genealogy"):
            online.make_online_filter(*_components(), K,
                                      resampling_method="ot",
                                      track_genealogy=True)


class TestFixedLag:
    def test_lagged_beats_filtered_vs_rts(self):
        """Fixed-lag smoothed means are closer to the exact RTS smoother
        than the filtered means (conditioning on L future observations
        must help), and padding entries are flagged by lag_time < 0."""
        from aesmc_tpu import statistics
        from aesmc_tpu.models import kalman

        Tn, Bn, Kn, L = 30, 2, 512, 8
        A, Q, EM, R = 0.9, 1.0, 1.0, 0.25
        initial = lgssm.Initial(0.0, 1.0)
        transition = lgssm.Transition.create(A, 1.0)
        emission = lgssm.Emission.create(EM, 0.5)
        # Optimal proposal: with a poor proposal the filter's own MC
        # error swamps the filtered-vs-smoothed gap this test measures.
        prec_t = 1.0 / Q + EM ** 2 / R
        prec_0 = 1.0 + EM ** 2 / R
        proposal = lgssm.Proposal(
            lin_0_weight=jnp.asarray((EM / R) / prec_0),
            lin_0_bias=jnp.asarray(0.0),
            lin_t_weight=jnp.asarray([(A / Q) / prec_t,
                                      (EM / R) / prec_t]),
            lin_t_bias=jnp.asarray(0.0),
            scale_0=float(np.sqrt(1.0 / prec_0)),
            scale_t=float(np.sqrt(1.0 / prec_t)))
        comps = (initial, transition, emission, proposal)
        _, obs = statistics.sample_from_prior(
            initial, transition, emission, Tn, Bn,
            key=jax.random.PRNGKey(13))

        init_fn, step_fn = online.make_online_filter(*comps, Kn,
                                                     fixed_lag=L)
        step_keys = online.split_step_keys(jax.random.PRNGKey(5), Tn)
        fs = init_fn(obs[0], step_keys[0])
        jstep = jax.jit(step_fn)
        filtered, lagged = {}, {}
        for t in range(1, Tn):
            w_filt = jax.nn.softmax(fs.log_weight, axis=-1)
            filtered[t - 1] = np.asarray(
                jnp.sum(w_filt * fs.latent, axis=-1))
            fs, info = jstep(fs, obs[t], step_keys[t])
            lt = int(info["lag_time"])
            if lt >= 0:
                w = jax.nn.softmax(fs.log_weight, axis=-1)
                lagged[lt] = np.asarray(
                    jnp.sum(w * info["lagged_latent"], axis=-1))
        assert min(lagged) == 0 and max(lagged) == Tn - 1 - L

        params = kalman.KalmanParams(0.0, 1.0, 0.9, 0.0, 1.0,
                                     1.0, 0.0, 0.25)
        filt_err, lag_err = [], []
        for b in range(Bn):
            sm, _ = kalman.kalman_smoother(
                np.asarray(obs[:, b], np.float64), params)
            for t, v in lagged.items():
                lag_err.append(abs(v[b] - sm[t]))
                filt_err.append(abs(filtered[t][b] - sm[t]))
        # Measured ratio 0.23 at this config (lag 0.030 vs filt 0.130).
        assert np.mean(lag_err) < 0.5 * np.mean(filt_err), (
            np.mean(lag_err), np.mean(filt_err))

    def test_ot_fixed_lag_rejected(self):
        with pytest.raises(ValueError, match="fixed-lag"):
            online.make_online_filter(*_components(), K,
                                      resampling_method="ot",
                                      fixed_lag=4)

    def test_negative_lag_rejected(self):
        with pytest.raises(ValueError, match="fixed_lag"):
            online.make_online_filter(*_components(), K, fixed_lag=-1)


class TestExport:
    def test_roundtrip_matches_live_step(self):
        """Serialize -> deserialize -> call reproduces the live step (the
        no-model-code deployment path)."""
        obs = _observations()
        init_fn, step_fn = online.make_online_filter(*_components(), K)
        step_keys = online.split_step_keys(KEY, T)
        fs = init_fn(obs[0], step_keys[0])

        blob = online.export_step(step_fn, fs, obs[1], step_keys[1])
        assert isinstance(blob, bytes) and len(blob) > 0
        served = online.load_step(blob)

        fs_live, info_live = step_fn(fs, obs[1], step_keys[1])
        fs_exp, info_exp = served(fs, obs[1], step_keys[1])
        np.testing.assert_allclose(np.asarray(fs_exp.log_weight),
                                   np.asarray(fs_live.log_weight),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(info_exp["log_pred"]),
                                   np.asarray(info_live["log_pred"]),
                                   rtol=1e-6, atol=1e-6)

    def test_exported_step_iterates(self):
        """The deserialized step feeds its own output back (stateful
        serving loop with zero model code)."""
        obs = _observations()
        init_fn, step_fn = online.make_online_filter(*_components(), K)
        step_keys = online.split_step_keys(KEY, T)
        fs = init_fn(obs[0], step_keys[0])
        served = online.load_step(
            online.export_step(step_fn, fs, obs[1], step_keys[1]))
        for t in range(1, T):
            fs, info = served(fs, obs[t], step_keys[t])
        ref = inference.infer(
            "smc", obs, *_components(), K, key=KEY,
            return_log_marginal_likelihood=True, return_latents=False)
        np.testing.assert_allclose(
            np.asarray(online.log_marginal_likelihood(fs)),
            np.asarray(ref["log_marginal_likelihood"]), rtol=1e-5)


class TestValidation:
    def test_soft_adaptive_rejected(self):
        with pytest.raises(ValueError, match="soft"):
            online.make_online_filter(*_components(), K,
                                      resampling_method="soft",
                                      resampling_criterion=0.5)

    def test_ot_ancestors_rejected(self):
        with pytest.raises(ValueError, match="ancestors"):
            online.make_online_filter(*_components(), K,
                                      resampling_method="ot",
                                      return_ancestors=True)

    def test_lookahead_soft_rejected(self):
        with pytest.raises(ValueError, match="lookahead"):
            online.make_online_filter(*_components(), K,
                                      resampling_method="soft",
                                      lookahead=lambda **kw: 0.0)

    def test_len_raises(self):
        view = online._CausalObservations(jnp.zeros((3,)))
        with pytest.raises(TypeError, match="len"):
            len(view)


class TestStreamingParis:
    """paris_h: streaming PaRIS == offline smoothing.paris under the
    shared (resample, propose, backward) key layout."""

    def _run(self, obs, key, **kwargs):
        init_fn, step_fn = online.make_online_filter(
            *_components(), K, paris_h=lambda xp, xc, t: xc,
            paris_h0=lambda x0: x0, **kwargs)
        step_keys = online.split_step_keys(key, T, num_streams=3)
        fs = init_fn(obs[0], step_keys[0])
        infos = []
        for t in range(1, T):
            fs, info = step_fn(fs, obs[t], step_keys[t])
            infos.append(info)
        return fs, infos

    def test_matches_offline_paris(self):
        from aesmc_tpu import smoothing
        obs = _observations()
        ref = smoothing.paris(obs, *_components(), K,
                              h=lambda xp, xc, t: xc,
                              h0=lambda x0: x0, key=KEY)
        fs, infos = self._run(obs, KEY)
        np.testing.assert_allclose(np.asarray(fs.tau),
                                   np.asarray(ref["tau"]),
                                   rtol=2e-5, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(infos[-1]["paris_smoothed"]),
            np.asarray(ref["smoothed"]), rtol=2e-5, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(online.log_marginal_likelihood(fs)),
            np.asarray(ref["log_marginal_likelihood"]),
            rtol=2e-6, atol=1e-4)

    def test_matches_offline_paris_rejection(self):
        from aesmc_tpu import smoothing
        obs = _observations()
        ref = smoothing.paris(obs, *_components(), K,
                              h=lambda xp, xc, t: xc,
                              h0=lambda x0: x0, key=KEY,
                              backward="rejection")
        fs, infos = self._run(obs, KEY, paris_backward="rejection")
        np.testing.assert_allclose(np.asarray(fs.tau),
                                   np.asarray(ref["tau"]),
                                   rtol=2e-5, atol=1e-4)
        assert int(np.asarray(
            infos[-1]["paris_unconverged"]).sum()) == 0
        total_unconv = sum(int(np.asarray(i["paris_unconverged"]).sum())
                           for i in infos)
        assert total_unconv == int(np.asarray(
            ref["backward_unconverged"]).sum())

    def test_jitted_step_carries_tau(self):
        obs = _observations()
        init_fn, step_fn = online.make_online_filter(
            *_components(), K, paris_h=lambda xp, xc, t: xp * xc)
        jstep = jax.jit(step_fn)
        step_keys = online.split_step_keys(KEY, T, num_streams=3)
        fs = init_fn(obs[0], step_keys[0])
        assert fs.tau.shape == (B, K)   # zeros: no h0
        for t in range(1, 4):
            fs, info = jstep(fs, obs[t], step_keys[t])
        assert info["paris_smoothed"].shape == (B,)
        assert np.all(np.isfinite(np.asarray(info["paris_smoothed"])))

    def test_donated_carry_with_identity_h0(self):
        """h0 = identity must not alias tau onto the latent buffer
        (donated carries would donate one buffer twice)."""
        obs = _observations()
        init_fn, step_fn = online.make_online_filter(
            *_components(), K, paris_h=lambda xp, xc, t: xc,
            paris_h0=lambda x0: x0)
        jstep = jax.jit(step_fn, donate_argnums=0)
        step_keys = online.split_step_keys(KEY, T, num_streams=3)
        fs = init_fn(obs[0], step_keys[0])
        assert fs.tau.shape == (B, K)
        for t in range(1, 4):
            fs, info = jstep(fs, obs[t], step_keys[t])
        assert info["paris_smoothed"].shape == (B,)
        assert np.all(np.isfinite(np.asarray(info["paris_smoothed"])))

    def test_single_key_mode_works(self):
        obs = _observations()
        fs, infos = self._run(obs, KEY)  # 3-row keys
        init_fn, step_fn = online.make_online_filter(
            *_components(), K, paris_h=lambda xp, xc, t: xc,
            paris_h0=lambda x0: x0)
        fs1 = init_fn(obs[0], jax.random.PRNGKey(0))
        fs1, info = step_fn(fs1, obs[1], jax.random.PRNGKey(1))
        assert np.all(np.isfinite(np.asarray(info["paris_smoothed"])))

    def test_wrong_row_width_raises(self):
        obs = _observations()
        init_fn, step_fn = online.make_online_filter(
            *_components(), K, paris_h=lambda xp, xc, t: xc)
        two_row = online.split_step_keys(KEY, T)  # width 2
        with pytest.raises(ValueError, match="num_streams=3"):
            init_fn(obs[0], two_row[0])

    def test_validation(self):
        with pytest.raises(ValueError, match="paris_h0 requires"):
            online.make_online_filter(*_components(), K,
                                      paris_h0=lambda x0: x0)
        with pytest.raises(ValueError, match="paris_num_draws"):
            online.make_online_filter(*_components(), K,
                                      paris_h=lambda xp, xc, t: xc,
                                      paris_num_draws=0)
        with pytest.raises(ValueError, match="paris_backward"):
            online.make_online_filter(*_components(), K,
                                      paris_h=lambda xp, xc, t: xc,
                                      paris_backward="bogus")


class TestBatchedSteps:
    """Micro-batched serving dispatch (online.batched_steps): S steps in
    one lax.scan must reproduce S sequential step_fn calls."""

    def test_matches_sequential_steps(self):
        obs = _observations()
        init_fn, step_fn = online.make_online_filter(
            *_components(), K, return_ancestors=True)
        step_keys = online.split_step_keys(KEY, T)

        fs_seq = init_fn(obs[0], step_keys[0])
        seq_infos = []
        for t in range(1, T):
            fs_seq, info = step_fn(fs_seq, obs[t], step_keys[t])
            seq_infos.append(info)

        batched = jax.jit(online.batched_steps(step_fn))
        fs_b = init_fn(obs[0], step_keys[0])
        fs_b, infos = batched(fs_b, obs[1:], step_keys[1:])

        np.testing.assert_array_equal(
            np.asarray(infos["ancestral_index"]),
            np.stack([np.asarray(i["ancestral_index"])
                      for i in seq_infos]))
        np.testing.assert_allclose(
            np.asarray(infos["log_pred"]),
            np.stack([np.asarray(i["log_pred"]) for i in seq_infos]),
            rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(
            np.asarray(online.log_marginal_likelihood(fs_b)),
            np.asarray(online.log_marginal_likelihood(fs_seq)),
            rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(fs_b.latent),
                                   np.asarray(fs_seq.latent),
                                   rtol=2e-5, atol=2e-5)

    def test_chunked_stream(self):
        """Feeding the stream in S=4 micro-batches == one batch of 11."""
        obs = _observations()
        init_fn, step_fn = online.make_online_filter(*_components(), K)
        step_keys = online.split_step_keys(KEY, T)
        batched = online.batched_steps(step_fn)

        fs_a = init_fn(obs[0], step_keys[0])
        fs_a, _ = jax.jit(batched)(fs_a, obs[1:], step_keys[1:])

        fs_b = init_fn(obs[0], step_keys[0])
        for lo, hi in ((1, 5), (5, 9), (9, 12)):
            fs_b, _ = batched(fs_b, obs[lo:hi], step_keys[lo:hi])

        np.testing.assert_allclose(
            np.asarray(online.log_marginal_likelihood(fs_a)),
            np.asarray(online.log_marginal_likelihood(fs_b)),
            rtol=2e-5, atol=2e-5)
