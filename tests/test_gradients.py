"""Score-function (unbiased) AESMC gradient: exact validation.

The flagship test enumerates EVERY ancestor assignment of a tiny LGSSM
run through the real engine (a forced-index resampling callable keyed
off the engine's own per-step resampling keys), computes the exact
expected objective

    F(theta) = sum_A p(A; theta) * logZ(A; theta)

with autodiff THROUGH the ancestor probabilities, and checks that the
expectation of the score-surrogate gradient (aesmc_tpu.gradients)
equals grad F to f64 precision - an algebraic unbiasedness proof, no
Monte Carlo tolerance. The same harness shows the default pathwise
gradient (reference semantics: detached ancestors,
/root/reference/aesmc/inference.py:254) is measurably biased.

Proposal noise is common across assignments (same engine keys), so
logZ(A; theta) is a deterministic reparameterized function - exactly
the setting of the estimator's derivation.
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aesmc_tpu import gradients, inference, losses
from aesmc_tpu.models import lgssm

T, K = 3, 2
KEY = jax.random.PRNGKey(11)


def _key_raw(k):
    if jnp.issubdtype(jnp.asarray(k).dtype, jax.dtypes.prng_key):
        return jax.random.key_data(k)
    return jnp.asarray(k)


def _resampling_keys(key, num_timesteps):
    """The engine's per-step resampling keys (inference.py: step_keys =
    split(key, (T, 2)); keys_t[0] at t = 1..T-1)."""
    step_keys = jax.random.split(key, (num_timesteps, 2))
    return step_keys[1:, 0]


def _make_components():
    initial = lgssm.Initial(loc=0.0, scale=1.0)
    transition = lgssm.Transition.create(0.8, 1.0)
    emission = lgssm.Emission.create(1.2, 0.5)
    proposal = lgssm.Proposal.create(1.0, 1.0, key=jax.random.PRNGKey(3))
    return initial, (transition, emission, proposal)


def _enumeration_case(batch_size, baseline, x64=True):
    """Returns (grad_exact, grad_estimator, grad_pathwise) pytrees."""
    initial, theta = _make_components()
    if x64:
        theta = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x, jnp.float64), theta)
    obs_np = np.linspace(-0.7, 0.9, T * batch_size).reshape(T, batch_size)
    observations = jnp.asarray(obs_np,
                               jnp.float64 if x64 else jnp.float32)

    rkeys_raw = jnp.stack(
        [_key_raw(k).reshape(-1) for k in _resampling_keys(KEY, T)])

    def make_forced_impl(combo):
        # combo: [T-1, B, K] int32 (may be traced).
        def impl(log_weight, key):
            kd = _key_raw(key).reshape(-1)
            match = jnp.all(rkeys_raw == kd[None, :], axis=1)   # [T-1]
            t = jnp.argmax(match)
            return combo[t].astype(jnp.int32)
        return impl

    def run(theta, combo):
        transition, emission, proposal = theta
        return inference.infer(
            inference_algorithm="smc",
            observations=observations,
            initial=initial, transition=transition, emission=emission,
            proposal=proposal, num_particles=K, key=KEY,
            resampling_method="multinomial",
            resampling_implementation=make_forced_impl(combo),
            return_log_marginal_likelihood=True,
            return_latents=False, return_log_weight=False,
            return_log_weights=True, return_ancestral_indices=True)

    def log_p_of(result):
        log_weights = result["log_weights"]
        lognorm = log_weights - jax.nn.logsumexp(log_weights, axis=2,
                                                 keepdims=True)
        gathered = jnp.take_along_axis(lognorm[:-1],
                                       result["ancestral_indices"], axis=2)
        return jnp.sum(gathered)          # joint over steps, rows, slots

    # All ordered ancestor assignments: per step, per row, each of the K
    # slots picks a parent in [0, K).
    per_step_row = list(itertools.product(range(K), repeat=K))
    flat = list(itertools.product(per_step_row, repeat=(T - 1) * batch_size))
    combos = jnp.asarray(flat, jnp.int32).reshape(
        len(flat), T - 1, batch_size, K)

    def exact_objective(theta):
        def one(combo):
            result = run(theta, combo)
            log_z = jnp.mean(result["log_marginal_likelihood"])
            return jnp.exp(log_p_of(result)) * log_z
        vals = jax.vmap(one)(combos)
        return -jnp.sum(vals)             # = E[-mean_b logZ]

    def estimator_loss(theta, combo):
        result = run(theta, combo)
        return gradients.score_surrogate_from_result(result,
                                                     baseline=baseline)

    def pathwise_loss(theta, combo):
        result = run(theta, combo)
        return -jnp.mean(result["log_marginal_likelihood"])

    def combo_prob(combo):
        return jnp.exp(log_p_of(run(theta, combo)))

    probs = jax.vmap(combo_prob)(combos)
    np.testing.assert_allclose(np.asarray(jnp.sum(probs)), 1.0,
                               rtol=1e-8 if x64 else 1e-5)

    def expected_grad(loss_fn):
        grads = jax.vmap(lambda c: jax.grad(loss_fn)(theta, c))(combos)
        return jax.tree_util.tree_map(
            lambda g: jnp.tensordot(probs, g, axes=1), grads)

    grad_exact = jax.grad(exact_objective)(theta)
    grad_estimator = expected_grad(estimator_loss)
    grad_pathwise = expected_grad(pathwise_loss)
    return grad_exact, grad_estimator, grad_pathwise


@pytest.mark.parametrize("batch_size,baseline", [(1, "none"),
                                                 (2, "batch")])
def test_score_gradient_exact_enumeration(batch_size, baseline):
    with jax.enable_x64(True):
        grad_exact, grad_estimator, grad_pathwise = _enumeration_case(
            batch_size, baseline)

        exact = np.concatenate([np.ravel(g) for g in
                                jax.tree_util.tree_leaves(grad_exact)])
        est = np.concatenate([np.ravel(g) for g in
                              jax.tree_util.tree_leaves(grad_estimator)])
        path = np.concatenate([np.ravel(g) for g in
                               jax.tree_util.tree_leaves(grad_pathwise)])

        # Unbiasedness: estimator expectation == exact gradient (f64).
        np.testing.assert_allclose(est, exact, rtol=1e-7, atol=1e-9)
        # Power: the pathwise (detached-ancestors) gradient is biased on
        # this model - the score term is doing real work.
        assert np.max(np.abs(path - exact)) > 1e-4


def test_score_loss_value_matches_pathwise_loss():
    """The surrogate's VALUE is the plain multinomial AESMC loss (the
    score term is value-cancelled); only gradients differ."""
    initial, (transition, emission, proposal) = _make_components()
    obs = jnp.asarray(
        np.random.default_rng(0).normal(size=(6, 4)), jnp.float32)
    key = jax.random.PRNGKey(5)
    v_score = gradients.score_gradient_loss(
        obs, 8, initial, transition, emission, proposal, key=key)
    v_plain = losses.get_loss(
        obs, 8, "aesmc", initial, transition, emission, proposal, key=key,
        resampling_method="multinomial")
    np.testing.assert_allclose(np.asarray(v_score), np.asarray(v_plain),
                               rtol=1e-6)


def test_get_loss_routing_and_validation():
    initial, (transition, emission, proposal) = _make_components()
    obs = jnp.asarray(
        np.random.default_rng(1).normal(size=(4, 3)), jnp.float32)
    key = jax.random.PRNGKey(9)

    args = (obs, 4, "aesmc", initial, transition, emission, proposal)
    direct = jax.grad(
        lambda th: gradients.score_gradient_loss(
            obs, 4, initial, *th, key=key))((transition, emission,
                                             proposal))
    routed = jax.grad(
        lambda th: losses.get_loss(
            obs, 4, "aesmc", initial, *th, key=key,
            resampling_method="multinomial",
            gradient_estimator="score"))((transition, emission, proposal))
    for a, b in zip(jax.tree_util.tree_leaves(direct),
                    jax.tree_util.tree_leaves(routed)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)

    with pytest.raises(ValueError, match="multinomial"):
        losses.get_loss(*args, key=key, gradient_estimator="score")
    with pytest.raises(ValueError, match="aesmc"):
        losses.get_loss(obs, 4, "iwae", initial, transition, emission,
                        proposal, key=key, gradient_estimator="score")
    with pytest.raises(ValueError, match="multinomial"):
        gradients.score_gradient_loss(
            obs, 4, initial, transition, emission, proposal, key=key,
            resampling_method="systematic")
    with pytest.raises(ValueError, match="always"):
        gradients.score_gradient_loss(
            obs, 4, initial, transition, emission, proposal, key=key,
            resampling_criterion=0.5)
    with pytest.raises(ValueError, match="baseline"):
        gradients.score_surrogate_from_result(
            {"log_weights": jnp.zeros((2, 1, 2)),
             "ancestral_indices": jnp.zeros((1, 1, 2), jnp.int32)},
            baseline="bogus")


def test_loss_and_metrics_score_path():
    """get_loss_and_metrics(gradient_estimator='score'): loss value and
    metrics match the pathwise call; gradient matches the direct score
    surrogate."""
    initial, (transition, emission, proposal) = _make_components()
    obs = jnp.asarray(
        np.random.default_rng(3).normal(size=(5, 4)), jnp.float32)
    key = jax.random.PRNGKey(4)
    theta = (transition, emission, proposal)

    loss_s, metrics_s = losses.get_loss_and_metrics(
        obs, 8, "aesmc", initial, *theta, key=key,
        resampling_method="multinomial", gradient_estimator="score")
    loss_p, metrics_p = losses.get_loss_and_metrics(
        obs, 8, "aesmc", initial, *theta, key=key,
        resampling_method="multinomial")
    np.testing.assert_allclose(np.asarray(loss_s), np.asarray(loss_p),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(metrics_s["ess"]),
                               np.asarray(metrics_p["ess"]), rtol=1e-6)

    g_metrics = jax.grad(lambda th: losses.get_loss_and_metrics(
        obs, 8, "aesmc", initial, *th, key=key,
        resampling_method="multinomial",
        gradient_estimator="score")[0])(theta)
    g_direct = jax.grad(lambda th: gradients.score_gradient_loss(
        obs, 8, initial, *th, key=key))(theta)
    for a, b in zip(jax.tree_util.tree_leaves(g_metrics),
                    jax.tree_util.tree_leaves(g_direct)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)

    with pytest.raises(ValueError, match="multinomial"):
        losses.get_loss_and_metrics(
            obs, 8, "aesmc", initial, *theta, key=key,
            gradient_estimator="score")


def test_score_gradient_trains():
    """A few Adam steps with the unbiased estimator reduce the loss on
    the small LGSSM config (smoke: jit + grad + optimizer compose)."""
    import optax

    initial, theta = _make_components()
    rng = np.random.default_rng(2)
    obs = jnp.asarray(rng.normal(size=(8, 6)), jnp.float32)

    opt = optax.adam(5e-2)

    @jax.jit
    def step(theta, opt_state, key):
        def loss_fn(th):
            return gradients.score_gradient_loss(
                obs, 16, initial, *th, key=key)
        loss, grads = jax.value_and_grad(loss_fn)(theta)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(theta, updates), opt_state, loss

    opt_state = opt.init(theta)
    key = jax.random.PRNGKey(0)
    losses_seen = []
    for i in range(40):
        key, sub = jax.random.split(key)
        theta, opt_state, loss = step(theta, opt_state, sub)
        losses_seen.append(float(loss))
    assert np.mean(losses_seen[-10:]) < np.mean(losses_seen[:10])
    assert np.isfinite(losses_seen[-1])
