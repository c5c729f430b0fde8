"""Under-jit NaN detection (checkify): parity with the reference's
FloatingPointError guard (/root/reference/aesmc/inference.py:244-245),
which the engine otherwise reproduces only eagerly - inside jit a NaN
training step used to fail silently."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from aesmc_tpu import distributions as dists
from aesmc_tpu import inference, losses, statistics, train
from aesmc_tpu.models import lgssm
from aesmc_tpu.state import BatchShapeMode

KEY = jax.random.PRNGKey(0)


def _components(emission_scale=0.2):
    initial = lgssm.Initial(0.0, 1.0)
    transition = lgssm.Transition.create(0.9, 1.0)
    emission = lgssm.Emission.create(1.0, emission_scale)
    proposal = lgssm.Proposal.create(1.0, 1.0, KEY)
    return initial, transition, emission, proposal


from flax import struct


@struct.dataclass
class NanEmission:
    """Produces NaN log-probs from time step 2 on (an empty-field pytree
    so optax can traverse it as a component)."""

    def __call__(self, latents=None, time=None, previous_observations=None):
        scale = jnp.where(jnp.asarray(time) >= 2, jnp.nan, 0.2)
        return dists.Normal(latents[-1], scale,
                            batch_shape_mode=BatchShapeMode.FULLY_EXPANDED)


class TestCheckedLoss:
    def test_clean_run_no_error(self):
        comps = _components()
        _, obs = statistics.sample_from_prior(comps[0], comps[1], comps[2],
                                              8, 3, KEY)
        err, loss = jax.jit(lambda: losses.checked_loss(
            obs, 16, "aesmc", *comps, key=KEY))()
        assert err.get() is None
        assert np.isfinite(float(loss))

    def test_nan_weights_recorded_under_jit(self):
        initial, transition, emission, proposal = _components()
        _, obs = statistics.sample_from_prior(initial, transition, emission,
                                              8, 3, KEY)
        err, loss = jax.jit(lambda: losses.checked_loss(
            obs, 16, "aesmc", initial, transition, NanEmission(), proposal,
            key=KEY))()
        msg = err.get()
        assert msg is not None and "nan" in msg
        with pytest.raises(Exception, match="nan"):
            err.throw()


class TestCheckedTrainStep:
    def test_jitted_step_raises_floating_point_error(self):
        initial, transition, emission, proposal = _components()
        _, obs = statistics.sample_from_prior(initial, transition, emission,
                                              8, 3, KEY)
        optimizer = optax.adam(1e-2)
        comps = (initial, transition, NanEmission(), proposal)
        step = train.make_train_step(16, "aesmc", optimizer,
                                     nan_check=True)
        opt_state = optimizer.init(comps)
        with pytest.raises(FloatingPointError, match="nan"):
            step(comps, opt_state, obs, KEY)

    def test_clean_step_passes_and_matches_unchecked(self):
        comps = _components()
        _, obs = statistics.sample_from_prior(comps[0], comps[1], comps[2],
                                              8, 3, KEY)
        optimizer = optax.adam(1e-2)
        opt_state = optimizer.init(comps)
        checked = train.make_train_step(16, "aesmc", optimizer,
                                        nan_check=True)
        plain = train.make_train_step(16, "aesmc", optimizer)
        c1, _, loss1 = checked(comps, opt_state, obs, KEY)
        c2, _, loss2 = plain(comps, opt_state, obs, KEY)
        np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(c1),
                        jax.tree_util.tree_leaves(c2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6)


class TestEagerParity:
    def test_eager_infer_raises_immediately(self):
        initial, transition, emission, proposal = _components()
        _, obs = statistics.sample_from_prior(initial, transition, emission,
                                              8, 3, KEY)
        with pytest.raises(Exception, match="nan"):
            inference.infer("smc", obs, initial, transition, NanEmission(),
                            proposal, 16, key=KEY, nan_check=True,
                            return_log_marginal_likelihood=True)
