"""Randomized property sweep over the pallas kernel family (interpret
mode): for random shapes, weight scales (incl. heavy degeneracy driving
the v5 window-extension while), zero-weight runs and all position
methods, every kernel path must agree with the XLA formulation -
indices exactly, gathers exactly, backward segment assignment exactly
(integer cotangents)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aesmc_tpu import resampling as R
from aesmc_tpu.ops import resample_pallas as rp

CASES = [
    # (seed, batch, k, scale, method)
    (0, 3, 1024, 1.0, "systematic"),
    (1, 2, 2048, 8.0, "systematic"),
    (2, 1, 640, 25.0, "systematic"),      # ragged K, heavy degeneracy
    (3, 2, 1536, 3.0, "stratified"),
    (4, 1, 4096, 15.0, "stratified"),
    (5, 2, 1024, 2.0, "multinomial"),
    (6, 1, 2048, 40.0, "multinomial"),    # near point-mass weights
]


@pytest.fixture(autouse=True)
def _interpret():
    rp.FORCE_INTERPRET = True
    yield
    rp.FORCE_INTERPRET = False


def _problem(seed, batch, k, scale):
    rng = np.random.default_rng(seed)
    logw = jnp.asarray(rng.normal(size=(batch, k)) * scale, jnp.float32)
    # zero-weight runs -> duplicate CDF entries, empty segments
    logw = logw.at[:, :: (seed % 5) + 3].set(-jnp.inf)
    value = jnp.asarray(rng.normal(size=(batch, k)), jnp.float32)
    return logw, value


@pytest.mark.parametrize("seed,batch,k,scale,method", CASES)
def test_fused_resample_matches_xla(seed, batch, k, scale, method):
    logw, value = _problem(seed, batch, k, scale)
    key = jax.random.PRNGKey(seed + 100)

    idx_x = R.sample_ancestral_index(logw, key, method=method,
                                     implementation="xla")
    idx_p, out = R.sample_ancestral_index_and_resample(
        logw, key, value, method=method, implementation="pallas")
    np.testing.assert_array_equal(np.asarray(idx_p), np.asarray(idx_x))
    ref = jnp.take_along_axis(value, idx_x, axis=1)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    # idx-only kernel route
    idx_o = rp.sample_ancestral_index_pallas(logw, key, method,
                                             interpret=True)
    np.testing.assert_array_equal(np.asarray(idx_o), np.asarray(idx_x))


@pytest.mark.parametrize("seed,batch,k,scale,method", CASES)
def test_backward_segment_assignment_exact(seed, batch, k, scale,
                                           method):
    logw, _ = _problem(seed, batch, k, scale)
    pos = R.resampling_positions(logw, jax.random.PRNGKey(seed), method)
    cdf = R._normalized_cumsum(logw)
    idx = jnp.clip(jax.vmap(lambda c, p: jnp.searchsorted(
        c, p, side="right"))(cdf, pos), 0, k - 1)
    rng = np.random.default_rng(seed)
    g = jnp.asarray(rng.integers(-5, 6, size=(batch, k)), jnp.float32)
    ref = jax.vmap(lambda gr, ir: jax.ops.segment_sum(
        gr, ir, num_segments=k))(g, idx)
    (got,) = rp.gather_backward_pallas(cdf, pos, [g])
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("kc,kp", [(2048, 512), (512, 2048), (1024, 1024)])
def test_sorted_mode_uneven_lengths(kc, kp):
    """The distributed resampler searches a GLOBAL CDF (length kc) with
    a shard-local position grid (length kp != kc): the v5 sorted kernel
    must match XLA for any length pair."""
    rng = np.random.default_rng(kc + kp)
    logw = jnp.asarray(rng.normal(size=(2, kc)) * 2.0, jnp.float32)
    cdf = R._normalized_cumsum(logw)
    v = jnp.asarray(rng.normal(size=(2, kc)), jnp.float32)
    u = jnp.asarray(rng.uniform(size=(2, 1)), jnp.float32)
    pos = jnp.minimum((u + jnp.arange(kp, dtype=jnp.float32)) / kp,
                      jnp.nextafter(jnp.float32(1.0), jnp.float32(0.0)))
    idx_ref = jnp.clip(jax.vmap(lambda c, p: jnp.searchsorted(
        c, p, side="right"))(cdf, pos), 0, kc - 1)
    g_ref = jnp.take_along_axis(v, idx_ref, axis=1)
    idx, (g,) = rp.sorted_search_gather_pallas(cdf, pos, (v,),
                                               interpret=True)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_ref))
    np.testing.assert_array_equal(np.asarray(g), np.asarray(g_ref))
