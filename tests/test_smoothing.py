"""FFBS backward-simulation smoothing vs the exact RTS smoother
(beyond-parity; the reference has no smoother)."""

import jax
import jax.numpy as jnp
import numpy as np

from aesmc_tpu import inference, smoothing, statistics
from aesmc_tpu.models import kalman, lgssm

KEY = jax.random.PRNGKey(0)


def _filter_run(T=20, B=2, K=1500, emission_scale=0.3):
    initial = lgssm.Initial(0.0, 1.0)
    transition = lgssm.Transition.create(0.9, 1.0)
    emission = lgssm.Emission.create(1.0, emission_scale)
    proposal = lgssm.Proposal.create(1.0, 1.0, KEY)
    _, obs = statistics.sample_from_prior(initial, transition, emission,
                                          T, B, KEY)
    out = inference.infer(
        "smc", obs, initial, transition, emission, proposal, K,
        key=jax.random.PRNGKey(1), return_original_latents=True,
        return_log_weights=True, return_latents=False,
        return_log_weight=False)
    params = kalman.KalmanParams(0.0, 1.0, 0.9, 0.0, 1.0, 1.0, 0.0,
                                 emission_scale ** 2)
    obs_np = np.asarray(obs)
    ms = np.stack([kalman.kalman_smoother(obs_np[:, b], params)[0]
                   for b in range(B)], axis=1)
    ps = np.stack([kalman.kalman_smoother(obs_np[:, b], params)[1]
                   for b in range(B)], axis=1)
    return obs, transition, out, ms, ps


def test_matches_rts_smoother_moments():
    obs, transition, out, ms, ps = _filter_run()
    traj = smoothing.backward_simulation(
        out["original_latents"], out["log_weights"], transition, 400,
        jax.random.PRNGKey(2), observations=obs)
    assert traj.shape == (20, 2, 400)
    means = np.asarray(jnp.mean(traj, axis=2))
    vars_ = np.asarray(jnp.var(traj, axis=2))
    rmse = float(np.sqrt(np.mean((means - ms) ** 2)))
    assert rmse < 0.06, rmse
    # smoothing (not filtering) marginals: variances track the RTS ones
    vdev = float(np.mean(np.abs(vars_ - ps) / ps))
    assert vdev < 0.25, vdev


def test_no_early_time_degeneracy():
    """Lineage tracing collapses onto few surviving forward lineages;
    FFBS must keep near-posterior spread at t=0."""
    obs, transition, out, ms, ps = _filter_run(T=30)
    traj = smoothing.backward_simulation(
        out["original_latents"], out["log_weights"], transition, 400,
        jax.random.PRNGKey(3), observations=obs)
    ffbs_var_t0 = float(jnp.mean(jnp.var(traj[0], axis=-1)))
    exact_t0 = float(np.mean(ps[0]))
    assert 0.4 * exact_t0 < ffbs_var_t0 < 2.5 * exact_t0, (
        ffbs_var_t0, exact_t0)


def test_rejection_backward_matches_rts():
    """FFBS with O(K + M) rejection backward draws targets the exact
    same backward categorical: same RTS-moment oracle, same tolerance
    as the pairwise-tile test above."""
    obs, transition, out, ms, ps = _filter_run()
    traj = smoothing.backward_simulation(
        out["original_latents"], out["log_weights"], transition, 400,
        jax.random.PRNGKey(2), observations=obs, backward="rejection")
    assert traj.shape == (20, 2, 400)
    means = np.asarray(jnp.mean(traj, axis=2))
    vars_ = np.asarray(jnp.var(traj, axis=2))
    rmse = float(np.sqrt(np.mean((means - ms) ** 2)))
    assert rmse < 0.06, rmse
    vdev = float(np.mean(np.abs(vars_ - ps) / ps))
    assert vdev < 0.25, vdev


def test_rejection_backward_validation():
    import pytest
    obs, transition, out, _, _ = _filter_run(T=4, K=64)
    with pytest.raises(ValueError, match="backward"):
        smoothing.backward_simulation(
            out["original_latents"], out["log_weights"], transition, 8,
            jax.random.PRNGKey(2), observations=obs, backward="bogus")


def test_jittable():
    obs, transition, out, _, _ = _filter_run(T=6, K=128)

    @jax.jit
    def run(latents, logw, key):
        return smoothing.backward_simulation(latents, logw, transition,
                                             32, key, observations=obs)

    traj = run(out["original_latents"], out["log_weights"],
               jax.random.PRNGKey(4))
    assert traj.shape == (6, 2, 32)
    assert bool(jnp.isfinite(traj).all())
