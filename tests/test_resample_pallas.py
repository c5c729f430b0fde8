"""Pallas fused-resampler tests (interpret mode on CPU: semantics only;
the real-TPU compile/perf path is exercised by bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aesmc_tpu import resampling
from aesmc_tpu.ops import resample_pallas

KEY = jax.random.PRNGKey(0)


@pytest.mark.parametrize("method", resampling.METHODS)
@pytest.mark.parametrize("shape", [(1, 3), (3, 100), (2, 1000)])
def test_exact_match_small(method, shape):
    """At small K the blocked cumsum accumulates in the same order, so
    indices are bit-identical to the XLA implementation (same PRNG)."""
    lw = jnp.asarray(
        np.random.RandomState(0).randn(*shape).astype(np.float32) * 2)
    ref = np.asarray(resampling._VARIANTS[method](lw, KEY))
    got = np.asarray(resample_pallas.sample_ancestral_index_pallas(
        lw, KEY, method=method, interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_near_exact_large():
    """At K=10k float accumulation order differs; indices may shift by a
    slot or two at CDF bin edges, on a <0.5% fraction of entries."""
    lw = jnp.asarray(
        np.random.RandomState(0).randn(4, 10000).astype(np.float32) * 2)
    ref = np.asarray(resampling.systematic_indices(lw, KEY))
    got = np.asarray(resample_pallas.sample_ancestral_index_pallas(
        lw, KEY, interpret=True))
    mismatch = (ref != got).mean()
    assert mismatch < 0.005, mismatch
    assert np.abs(ref - got).max() <= 3


def test_degenerate_weights():
    """All mass on one particle: every index points at it."""
    lw = jnp.full((2, 256), -1e9).at[:, 17].set(0.0)
    got = np.asarray(resample_pallas.sample_ancestral_index_pallas(
        lw, KEY, interpret=True))
    np.testing.assert_array_equal(got, np.full((2, 256), 17))


def test_marginals():
    weight = np.array([0.2, 0.3, 0.5])
    num_trials = 4000
    lw = jnp.broadcast_to(jnp.log(jnp.asarray(weight)), (num_trials, 3))
    idx = np.asarray(resample_pallas.sample_ancestral_index_pallas(
        lw, KEY, interpret=True))
    emp = np.array([(idx == i).mean() for i in range(3)])
    np.testing.assert_allclose(emp, weight, atol=2e-2)


def test_too_many_particles_raises():
    lw = jnp.zeros((1, resample_pallas.MAX_KERNEL_PARTICLES + 128))
    with pytest.raises(ValueError, match="shard the particle axis"):
        resample_pallas.sample_ancestral_index_pallas(lw, KEY)
