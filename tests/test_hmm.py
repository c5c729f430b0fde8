"""Discrete-latent HMM family vs the exact forward-backward oracle.

Exercises engine paths no Gaussian model reaches: non-reparameterizable
proposal sampling, integer-particle resampling gather, Categorical
pairwise broadcasting in FFBS, and user-supplied rejection bounds.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from aesmc_tpu import inference, smoothing, statistics
from aesmc_tpu.models import hmm

KEY = jax.random.PRNGKey(0)
D, T, B, K = 3, 25, 2, 2048


@functools.lru_cache(maxsize=2)
def _setup(proposal="optimal"):
    comps = hmm.make_model(num_states=D, emission_scale=0.6,
                           stay_prob=0.85, proposal=proposal)
    initial, transition, emission, prop = comps
    _, obs = statistics.sample_from_prior(
        initial, transition, emission, T, B, key=jax.random.PRNGKey(7))
    return comps, obs


def _oracle_args(comps):
    initial, transition, emission, _ = comps
    return (initial.logits, transition.logits, emission.locs,
            emission.scale)


class TestFiltering:
    def test_latents_are_integer(self):
        comps, obs = _setup()
        out = inference.infer("smc", obs, *comps, 64,
                              key=jax.random.PRNGKey(1))
        assert jnp.issubdtype(out["latents"].dtype, jnp.integer)
        assert out["latents"].shape == (T, B, 64)

    def test_log_z_matches_exact_forward(self):
        """Fully-adapted proposal + multinomial resampling: log-Z within
        MC tolerance of the exact forward log-likelihood."""
        comps, obs = _setup()
        out = inference.infer("smc", obs, *comps, K,
                              key=jax.random.PRNGKey(2),
                              resampling_method="multinomial",
                              return_log_marginal_likelihood=True)
        lz = np.asarray(out["log_marginal_likelihood"])
        for b in range(B):
            _, exact = hmm.hmm_forward(np.asarray(obs[:, b]),
                                       *_oracle_args(comps))
            assert abs(lz[b] - exact) < 0.05, (b, lz[b], exact)

    def test_filtered_occupancy_matches_forward(self):
        """E[1{x_t = j} | y_{0:t}] from the particle cloud vs the exact
        forward recursion, every t and state."""
        comps, obs = _setup()
        out = inference.infer(
            "smc", obs, *comps, K, key=jax.random.PRNGKey(3),
            return_log_weights=True, return_original_latents=True)
        lat = np.asarray(out["original_latents"])        # [T, B, K]
        logw = np.asarray(out["log_weights"])            # [T, B, K]
        w = np.exp(logw - logw.max(axis=2, keepdims=True))
        w /= w.sum(axis=2, keepdims=True)
        occ = np.stack([(w * (lat == j)).sum(axis=2)
                        for j in range(D)], axis=-1)     # [T, B, D]
        for b in range(B):
            filt, _ = hmm.hmm_forward(np.asarray(obs[:, b]),
                                      *_oracle_args(comps))
            err = np.abs(occ[:, b] - filt).max()
            assert err < 0.05, (b, err)

    def test_bootstrap_agrees_but_noisier(self):
        comps, obs = _setup()
        boot, _ = _setup("bootstrap")
        lz_opt = np.asarray(inference.infer(
            "smc", obs, *comps, K, key=jax.random.PRNGKey(4),
            return_log_marginal_likelihood=True)
            ["log_marginal_likelihood"])
        lz_boot = np.asarray(inference.infer(
            "smc", obs, *boot[:3], boot[3], K,
            key=jax.random.PRNGKey(4),
            return_log_marginal_likelihood=True)
            ["log_marginal_likelihood"])
        for b in range(B):
            _, exact = hmm.hmm_forward(np.asarray(obs[:, b]),
                                       *_oracle_args(comps))
            assert abs(lz_opt[b] - exact) < 0.05
            assert abs(lz_boot[b] - exact) < 0.6


class TestSmoothing:
    def test_ffbs_matches_forward_backward(self):
        """FFBS occupancy vs exact smoothed marginals - Categorical
        pairwise broadcasting through the [B, K, M] tile."""
        comps, obs = _setup()
        _, transition, _, _ = comps
        out = inference.infer(
            "smc", obs, *comps, 1024, key=jax.random.PRNGKey(5),
            return_original_latents=True, return_log_weights=True)
        traj = smoothing.backward_simulation(
            out["original_latents"], out["log_weights"], transition,
            600, jax.random.PRNGKey(6), observations=obs)
        traj = np.asarray(traj)                          # [T, B, M]
        for b in range(B):
            gamma = hmm.hmm_smoother(np.asarray(obs[:, b]),
                                     *_oracle_args(comps))
            occ = np.stack([(traj[:, b] == j).mean(axis=1)
                            for j in range(D)], axis=-1)
            err = np.abs(occ - gamma).max()
            assert err < 0.08, (b, err)

    def test_rejection_ffbs_with_pmf_bound(self):
        """Rejection smoothing on a DISCRETE transition via the model's
        exact pmf bound (Transition.log_bound)."""
        comps, obs = _setup()
        _, transition, _, _ = comps
        out = inference.infer(
            "smc", obs, *comps, 1024, key=jax.random.PRNGKey(5),
            return_original_latents=True, return_log_weights=True)
        traj = smoothing.backward_simulation(
            out["original_latents"], out["log_weights"], transition,
            600, jax.random.PRNGKey(6), observations=obs,
            backward="rejection",
            transition_log_bound=transition.log_bound)
        traj = np.asarray(traj)
        for b in range(B):
            gamma = hmm.hmm_smoother(np.asarray(obs[:, b]),
                                     *_oracle_args(comps))
            occ = np.stack([(traj[:, b] == j).mean(axis=1)
                            for j in range(D)], axis=-1)
            err = np.abs(occ - gamma).max()
            assert err < 0.08, (b, err)

    def test_auto_bound_raises_helpfully_on_categorical(self):
        import pytest
        comps, obs = _setup()
        _, transition, _, _ = comps
        out = inference.infer(
            "smc", obs, *comps, 128, key=jax.random.PRNGKey(5),
            return_original_latents=True, return_log_weights=True)
        with pytest.raises(TypeError, match="transition_log_bound"):
            smoothing.backward_simulation(
                out["original_latents"], out["log_weights"], transition,
                16, jax.random.PRNGKey(6), observations=obs,
                backward="rejection")


class TestTraining:
    def test_emission_locs_learnable(self):
        """Gradient flows through the (continuous) emission density even
        though latents are discrete and stop-gradiented."""
        import optax
        from aesmc_tpu import losses

        comps, obs = _setup()
        initial, transition, true_emission, prop = comps
        emission = hmm.Emission(
            locs=true_emission.locs + jnp.asarray([0.8, -0.6, 0.7]),
            scale=true_emission.scale)

        def loss_fn(em):
            return losses.get_loss(obs, 256, "aesmc", initial,
                                   transition, em, prop, key=KEY)

        opt = optax.adam(5e-2)
        opt_state = opt.init(emission)

        @jax.jit
        def step(em, opt_state):
            loss, g = jax.value_and_grad(loss_fn)(em)
            updates, opt_state = opt.update(g, opt_state)
            return optax.apply_updates(em, updates), opt_state, loss

        first = None
        for _ in range(120):
            emission, opt_state, loss = step(emission, opt_state)
            if first is None:
                first = float(loss)
        assert float(loss) < first - 0.5, (first, float(loss))
        # The finite-data MLE is not the truth (T=25, B=2); require
        # clear movement toward it from the [0.8, -0.6, 0.7] offsets.
        err = np.abs(np.sort(np.asarray(emission.locs)) -
                     np.sort(np.asarray(true_emission.locs)))
        assert err.max() < 0.5, err
        assert err.mean() < 0.25, err


class TestTMC:
    def test_tmc_log_z_tighter_than_smc(self):
        """TMC on the DISCRETE transition (Categorical pairwise
        broadcasting): the all-K^T-path estimator matches the exact
        forward log-likelihood at least as tightly as SMC at equal K."""
        from aesmc_tpu import tmc

        comps, obs = _setup()
        out = tmc.tmc_log_marginal_likelihood(
            obs, *comps, 256, key=jax.random.PRNGKey(21))
        lz = np.asarray(out)
        for b in range(B):
            _, exact = hmm.hmm_forward(np.asarray(obs[:, b]),
                                       *_oracle_args(comps))
            assert abs(lz[b] - exact) < 0.1, (b, lz[b], exact)


class TestViterbi:
    def test_matches_brute_force_enumeration(self):
        """Exact check: Viterbi path == argmax over ALL D^T joint paths
        (D=3, T=8 -> 6561 paths enumerated in f64)."""
        import itertools

        comps, _ = _setup()
        t_short = 8
        _, obs = statistics.sample_from_prior(
            comps[0], comps[1], comps[2], t_short, 1,
            key=jax.random.PRNGKey(33))
        args = _oracle_args(comps)
        path, logp = hmm.hmm_viterbi(np.asarray(obs[:, 0]), *args)

        log_pi = np.asarray(jax.nn.log_softmax(jnp.asarray(args[0])),
                            dtype=np.float64)
        log_a = np.asarray(jax.nn.log_softmax(jnp.asarray(args[1]),
                                              axis=-1), dtype=np.float64)
        log_b = hmm._log_emission_matrix(np.asarray(obs[:, 0]), args[2],
                                         args[3])
        best_lp, best_path = -np.inf, None
        for cand in itertools.product(range(D), repeat=t_short):
            lp = log_pi[cand[0]] + log_b[0, cand[0]]
            for t in range(1, t_short):
                lp += log_a[cand[t - 1], cand[t]] + log_b[t, cand[t]]
            if lp > best_lp:
                best_lp, best_path = lp, cand
        assert tuple(path) == best_path, (tuple(path), best_path)
        assert abs(logp - best_lp) < 1e-9


class TestParisOnDiscrete:
    def test_smoothed_transition_counts_match_exact_xi(self):
        """PaRIS with one-hot pair increments (the Baum-Welch E-step /
        online-EM sufficient statistic) vs the exact pairwise marginals
        - validates the backward kernel on a DISCRETE transition, both
        backward modes."""
        comps, obs = _setup()
        _, transition, _, _ = comps
        xi_exact = np.stack([
            hmm.hmm_pairwise_marginals(np.asarray(obs[:, b]),
                                       *_oracle_args(comps)).sum(0)
            for b in range(B)])                          # [B, D, D]

        def h(xp, xc, t):
            pair = xp.astype(jnp.int32) * D + xc.astype(jnp.int32)
            return jax.nn.one_hot(pair, D * D)

        for backward, kw in (("pairwise", {}),
                             ("rejection",
                              {"transition_log_bound":
                               transition.log_bound})):
            out = smoothing.paris(
                obs, *comps, 1024, h=h,
                h0=lambda x0: jnp.zeros(x0.shape + (D * D,)),
                key=jax.random.PRNGKey(17), backward=backward, **kw)
            counts = np.asarray(out["smoothed"]).reshape(B, D, D)
            err = np.abs(counts - xi_exact).max()
            assert err < 0.35, (backward, err, xi_exact.max())
            # relative: total transitions = T-1 per row
            np.testing.assert_allclose(counts.sum(axis=(1, 2)), T - 1,
                                       rtol=1e-4)


class TestIndexGatherEscapeHatch:
    def test_one_hot_route_bit_matches_index_gather(self, monkeypatch):
        """AESMC_HMM_INDEX_GATHER=1 flips `hmm._row_lookup` and
        `Categorical.log_prob` back to plain int-indexed gathers; the
        default one-hot masked-sum route is bit-exact (exactly one
        nonzero term per output), so full filter outputs must agree
        EXACTLY, not to tolerance. Fresh jit wrappers per run so the
        env flip is observed at trace time (round-5 discrete-path fix,
        VERDICT r4 #1)."""
        comps, obs = _setup()

        def run():
            fn = jax.jit(lambda o, k: inference.infer(
                "smc", o, *comps, 256, key=k,
                return_log_marginal_likelihood=True,
                return_ancestral_indices=True))
            out = fn(obs, jax.random.PRNGKey(5))
            return jax.tree_util.tree_map(np.asarray, out)

        out_onehot = run()
        monkeypatch.setenv("AESMC_HMM_INDEX_GATHER", "1")
        out_gather = run()
        leaves_a = jax.tree_util.tree_leaves(out_onehot)
        leaves_b = jax.tree_util.tree_leaves(out_gather)
        assert len(leaves_a) == len(leaves_b) and len(leaves_a) >= 3
        for a, b in zip(leaves_a, leaves_b):
            np.testing.assert_array_equal(a, b)


class TestFusedKernelRoute:
    def test_pallas_route_bit_matches_xla(self):
        """Round-5 discrete-path fix: int32 HMM particles ride the fused
        resample+gather kernel (exact 16-bit-pair f32 transport in
        resampling._split_columns) instead of silently bypassing it.
        Same key, same method => identical ancestors, latents, and
        log-Z down to the bit vs the xla route (values pass through the
        kernel as masked sums with one nonzero term)."""
        from aesmc_tpu.ops import resample_pallas
        comps, obs = _setup()
        kwargs = dict(key=jax.random.PRNGKey(11),
                      resampling_method="systematic",
                      return_log_marginal_likelihood=True,
                      return_ancestral_indices=True)
        resample_pallas.FORCE_INTERPRET = True
        try:
            out_p = inference.infer("smc", obs, *comps, 512,
                                    resampling_implementation="pallas",
                                    **kwargs)
            out_p = jax.tree_util.tree_map(np.asarray, out_p)
        finally:
            resample_pallas.FORCE_INTERPRET = False
        out_x = inference.infer("smc", obs, *comps, 512,
                                resampling_implementation="xla", **kwargs)
        out_x = jax.tree_util.tree_map(np.asarray, out_x)
        assert out_p["latents"].dtype == out_x["latents"].dtype
        for k in ("ancestral_indices", "latents",
                  "log_marginal_likelihood"):
            np.testing.assert_array_equal(out_p[k], out_x[k], k)
