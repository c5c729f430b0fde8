"""Tensor Monte Carlo estimator (aesmc_tpu.tmc, beyond-parity):
exactness at K=1, bound tightness vs IWAE, Kalman-oracle closeness,
gradient flow, multi-dim (matrix-dynamics) broadcasting, training."""

import jax
import jax.numpy as jnp
import numpy as np

from aesmc_tpu import losses, statistics, tmc
from aesmc_tpu.models import kalman, lgssm

KEY = jax.random.PRNGKey(0)


def _problem(T=12, B=4, emission_scale=0.3):
    initial = lgssm.Initial(0.0, 1.0)
    transition = lgssm.Transition.create(0.9, 1.0)
    emission = lgssm.Emission.create(1.0, emission_scale)
    proposal = lgssm.Proposal.create(1.0, 1.0, KEY)
    _, obs = statistics.sample_from_prior(initial, transition, emission,
                                          T, B, KEY)
    obs_np = np.asarray(obs)
    exact = np.array([
        kalman.kalman_filter(
            obs_np[:, b],
            kalman.KalmanParams(0.0, 1.0, 0.9, 0.0, 1.0, 1.0, 0.0,
                                emission_scale ** 2))[4]
        for b in range(B)])
    return obs, initial, transition, emission, proposal, exact


def test_k1_equals_iwae_exactly():
    obs, initial, transition, emission, proposal, _ = _problem()
    k5 = jax.random.PRNGKey(5)
    t1 = tmc.tmc_log_marginal_likelihood(
        obs, initial, transition, emission, proposal, 1, key=k5)
    l_iwae = -losses.get_loss(obs, 1, "iwae", initial, transition,
                              emission, proposal, key=k5)
    np.testing.assert_allclose(float(jnp.mean(t1)), float(l_iwae),
                               rtol=1e-6)


def test_tighter_than_iwae_and_near_exact():
    obs, initial, transition, emission, proposal, exact = _problem()
    tm, iw = [], []
    for s in range(6):
        k = jax.random.PRNGKey(100 + s)
        tm.append(float(jnp.mean(tmc.tmc_log_marginal_likelihood(
            obs, initial, transition, emission, proposal, 64, key=k))))
        iw.append(float(-losses.get_loss(
            obs, 64, "iwae", initial, transition, emission, proposal,
            key=k)))
    # TMC marginalizes K^T paths vs IWAE's K: dramatically tighter
    # bound and lower variance at the same K.
    assert np.mean(tm) > np.mean(iw) + 5.0, (np.mean(tm), np.mean(iw))
    assert np.std(tm) < np.std(iw), (np.std(tm), np.std(iw))
    # and within a few nats of the exact Kalman log-ML
    assert abs(np.mean(tm) - exact.mean()) < 3.0, (np.mean(tm),
                                                   exact.mean())


def test_gradients_flow_everywhere():
    obs, initial, transition, emission, proposal, _ = _problem(T=6)

    def loss_fn(tr, em):
        return losses.get_loss(obs, 32, "tmc", initial, tr, em,
                               proposal, key=KEY)

    gt, ge = jax.grad(loss_fn, argnums=(0, 1))(transition, emission)
    for g in (gt.mult, ge.mult):
        assert np.isfinite(float(g)) and abs(float(g)) > 0


def test_matrix_dynamics_broadcasts():
    from aesmc_tpu.models import lgssm_nd
    d = 3
    initial, transition, emission, proposal = lgssm_nd.make_model(
        dim=d, key=jax.random.PRNGKey(1))
    _, obs = statistics.sample_from_prior(initial, transition, emission,
                                          5, 2, KEY)
    est = tmc.tmc_log_marginal_likelihood(
        obs, initial, transition, emission, proposal, 16, key=KEY)
    assert est.shape == (2,)
    assert bool(jnp.isfinite(est).all())


def test_training_moves_toward_truth():
    import optax
    obs, initial, transition, emission, proposal, _ = _problem(
        T=16, B=8)
    opt = optax.adam(5e-2)
    tr = lgssm.Transition.create(0.4, 1.0)
    comps = (initial, tr, emission, proposal)
    opt_state = opt.init(comps)

    def loss_fn(cs, key):
        return losses.get_loss(obs, 32, "tmc", *cs, key=key)

    @jax.jit
    def step(cs, st, key):
        loss, g = jax.value_and_grad(loss_fn)(cs, key)
        updates, st = opt.update(g, st, cs)
        return optax.apply_updates(cs, updates), st, loss

    key = KEY
    first = None
    for i in range(40):
        key, sub = jax.random.split(key)
        comps, opt_state, loss = step(comps, opt_state, sub)
        if first is None:
            first = float(loss)
    assert float(loss) < first
    # moved from 0.4 toward the true 0.9
    assert float(comps[1].mult) > 0.55, float(comps[1].mult)


def test_stochastic_volatility_smoke():
    """TMC on a NONLINEAR model: the SV transition is arithmetic in the
    latent, so the pairwise broadcast works unchanged."""
    from aesmc_tpu.models import stochastic_volatility as sv
    initial, transition, emission, proposal = sv.make_model(
        key=jax.random.PRNGKey(2))
    _, obs = statistics.sample_from_prior(initial, transition, emission,
                                          8, 2, KEY)
    est = tmc.tmc_log_marginal_likelihood(
        obs, initial, transition, emission, proposal, 64, key=KEY)
    assert est.shape == (2,) and bool(jnp.isfinite(est).all())
    g = jax.grad(lambda tr: float(0) + losses.get_loss(
        obs, 32, "tmc", initial, tr, emission, proposal, key=KEY))(
            transition)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_blocked_matches_full_bitwise():
    obs, initial, transition, emission, proposal, _ = _problem(T=8)
    k5 = jax.random.PRNGKey(5)
    full = tmc.tmc_log_marginal_likelihood(
        obs, initial, transition, emission, proposal, 128, key=k5)
    blk = tmc.tmc_log_marginal_likelihood(
        obs, initial, transition, emission, proposal, 128, key=k5,
        block_size=32)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(blk))
    g = jax.grad(lambda tr: float(0) + jnp.mean(
        tmc.tmc_log_marginal_likelihood(
            obs, initial, tr, emission, proposal, 128, key=k5,
            block_size=32)))(transition)
    assert np.isfinite(float(g.mult))
    import pytest as _pytest
    with _pytest.raises(ValueError, match="must divide"):
        tmc.tmc_log_marginal_likelihood(
            obs, initial, transition, emission, proposal, 100, key=k5,
            block_size=33)


def test_pairwise_vmap_matches_broadcast():
    # The general (vmapped-over-parents) tile must reproduce the
    # broadcast fast path exactly on a model where both apply.
    obs, initial, transition, emission, proposal, _ = _problem(T=6, B=2)
    want = tmc.tmc_log_marginal_likelihood(
        obs, initial, transition, emission, proposal, 16, key=KEY,
        pairwise="broadcast")
    got = tmc.tmc_log_marginal_likelihood(
        obs, initial, transition, emission, proposal, 16, key=KEY,
        pairwise="vmap")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5)


class _RankBoundNeuralTransition:
    """An MLP transition that ASSUMES rank-3 [B, K, D] latents (explicit
    reshape through the net) - the shape contract that excludes the
    broadcast tile and forces TMC's vmap fallback."""

    def __init__(self, dim, key):
        from aesmc_tpu.utils.mlp import MLP
        self.net = MLP.create((dim, 8, dim), key)
        self.dim = dim

    def __call__(self, previous_latents=None, time=None,
                 previous_observations=None):
        from aesmc_tpu import distributions as dists
        from aesmc_tpu.state import BatchShapeMode
        prev = previous_latents[-1]
        b, k, d = prev.shape              # rank-3 contract
        loc = self.net(prev.reshape(b * k, d)).reshape(b, k, d)
        return dists.MultivariateNormalDiag(
            loc, 0.8 * jnp.ones_like(loc),
            batch_shape_mode=BatchShapeMode.FULLY_EXPANDED)


def _neural_problem(T=5, B=2, dim=2):
    from aesmc_tpu.models import lgssm_nd
    initial = lgssm_nd.Initial.create(dim)
    transition = _RankBoundNeuralTransition(dim, jax.random.PRNGKey(9))
    emission = lgssm_nd.Emission.create(np.eye(dim), 0.3)
    proposal = lgssm_nd.Proposal.create(dim, dim, jax.random.PRNGKey(10))
    _, obs = statistics.sample_from_prior(
        initial, transition, emission, T, B, KEY)
    return obs, initial, transition, emission, proposal


def test_neural_transition_requires_vmap_and_auto_finds_it():
    obs, initial, transition, emission, proposal = _neural_problem()
    # The broadcast tile cannot form ([B, K, 1, D] breaks the rank-3
    # contract)...
    with np.testing.assert_raises(Exception):
        tmc.tmc_log_marginal_likelihood(
            obs, initial, transition, emission, proposal, 8, key=KEY,
            pairwise="broadcast")
    # ...the explicit vmap mode runs, and 'auto' silently routes to it.
    v = tmc.tmc_log_marginal_likelihood(
        obs, initial, transition, emission, proposal, 8, key=KEY,
        pairwise="vmap")
    a = tmc.tmc_log_marginal_likelihood(
        obs, initial, transition, emission, proposal, 8, key=KEY,
        pairwise="auto")
    assert np.isfinite(np.asarray(v)).all()
    np.testing.assert_allclose(np.asarray(a), np.asarray(v), rtol=1e-6)


def test_neural_transition_gradients_flow():
    obs, initial, transition, emission, proposal = _neural_problem()

    def loss(weights):
        transition.net = transition.net.replace(weights=weights)
        return float(0) + jnp.mean(-tmc.tmc_log_marginal_likelihood(
            obs, initial, transition, emission, proposal, 8, key=KEY,
            pairwise="vmap"))

    grads = jax.grad(loss)(transition.net.weights)
    norms = [float(jnp.linalg.norm(g)) for g in grads]
    assert all(np.isfinite(n) for n in norms)
    assert all(n > 0 for n in norms), norms


def test_bad_pairwise_raises():
    obs, initial, transition, emission, proposal, _ = _problem(T=3, B=2)
    with np.testing.assert_raises(ValueError):
        tmc.tmc_log_marginal_likelihood(
            obs, initial, transition, emission, proposal, 4, key=KEY,
            pairwise="bogus")
