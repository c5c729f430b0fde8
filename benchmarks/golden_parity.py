"""Golden matched-noise parity: aesmc_tpu vs the reference PyTorch aesmc.

Runs BOTH implementations on identical observations with IDENTICAL noise
draws and asserts they agree to ~1e-6 in float64:

- per-step log-weights (every t),
- ancestor indices (exactly, every resampling step),
- log marginal likelihood for BOTH estimators (iwae/'is' and aesmc/'smc'
  - the two differ exactly in where the logsumexp over particles sits
  relative to the time-sum, /root/reference/aesmc/inference.py:130-132
  vs 156-159; this harness is the designated defense for that numerics,
  SURVEY.md section 7 hard-part 2).

Noise matching strategy:
1. aesmc_tpu's `infer` runs first (float64, fixed PRNG key). Its noise is
   then EXTRACTED: proposal samples are reparameterized (x = loc +
   scale*eps), so eps = (x - loc)/scale recomputes exactly from the
   returned original latents + ancestor indices; the systematic-resampler
   uniforms are replayed from the key schedule (split(key, (T, 2)),
   stream 0 of step t - identical to the engine's internal draw).
2. The reference then consumes that noise verbatim: its proposal returns
   a Normal subclass whose rsample pops the pre-drawn samples, and
   `np.random.uniform` (the reference's GLOBAL-RNG uniform at
   /root/reference/aesmc/inference.py:250) is monkeypatched to pop the
   replayed uniforms.

Components are a scalar LGSSM at the reference training configuration
(T=200, B=10, K=100, /root/reference/test/test_losses.py:93-100) with
fixed (untrained) proposal parameters shared by construction.

REFERENCE DEFECT discovered by this harness (documented, not replicated;
see DESIGN.md deviations): in 'is' mode the reference aliases
`previous_latents_bar = latents_bar` (/root/reference/aesmc/inference.py
:105-106) and then mutates the list in place (`latents_bar += [latent]`,
line 112) BEFORE evaluating the transition log-prob (line 114-116) - so
the reference's IWAE transition term is p(x_t | x_t) instead of
p(x_t | x_{t-1}) for any model reading `previous_latents[-1]`. SMC is
unaffected (the resample comprehension builds a fresh list). This
harness verifies against the INTENDED estimator by having the torch-side
transition read `previous_latents[-2]` in 'is' mode (at transition time
the aliased list is [x_0..x_t], so [-2] is the true x_{t-1}).

Run: PYTHONPATH=/root/repo python benchmarks/golden_parity.py
Prints one JSON line with the max deviations; exit code 0 iff all pass.
"""

import json
import sys

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

REFERENCE = "/root/reference"

# LGSSM + proposal constants (shared by both sides).
INIT_LOC, INIT_SCALE = 0.0, 1.0
TRANS_MULT, TRANS_SCALE = 0.9, 1.0
EMIT_MULT, EMIT_SCALE = 1.0, 0.2
# proposal: q(x_0|y_0) = N(a0*y_0 + b0, s0); q(x_t|x_{t-1}, y_t) =
# N(ap*x_{t-1} + ao*y_t + b, st)
A0, B0, S0 = 0.5, 0.1, 1.0
AP, AO, BT, ST = 0.8, 0.3, -0.05, 0.9

T, B, K = 200, 10, 100
SEED = 0


# ---------------------------------------------------------------- JAX side
def jax_components():
    from aesmc_tpu import distributions as dists
    from aesmc_tpu.state import BatchShapeMode

    class Initial:
        def __call__(self):
            return dists.Normal(INIT_LOC, INIT_SCALE)

    class Transition:
        def __call__(self, previous_latents=None, time=None,
                     previous_observations=None):
            return dists.Normal(
                TRANS_MULT * previous_latents[-1], TRANS_SCALE,
                batch_shape_mode=BatchShapeMode.FULLY_EXPANDED)

    class Emission:
        def __call__(self, latents=None, time=None,
                     previous_observations=None):
            return dists.Normal(
                EMIT_MULT * latents[-1], EMIT_SCALE,
                batch_shape_mode=BatchShapeMode.FULLY_EXPANDED)

    class Proposal:
        def __call__(self, previous_latents=None, time=None,
                     observations=None):
            if time == 0:
                return dists.Normal(
                    A0 * observations[0] + B0, S0,
                    batch_shape_mode=BatchShapeMode.BATCH_EXPANDED)
            prev = previous_latents[-1]
            obs_t = observations[time]
            return dists.Normal(
                AP * prev + AO * obs_t[:, None] + BT, ST,
                batch_shape_mode=BatchShapeMode.FULLY_EXPANDED)

    return Initial(), Transition(), Emission(), Proposal()


def run_jax(algorithm, obs, key):
    from aesmc_tpu import inference

    initial, transition, emission, proposal = jax_components()
    smc = algorithm == "smc"
    out = inference.infer(
        algorithm, jnp.asarray(obs), initial, transition, emission,
        proposal, K, key=key,
        return_log_marginal_likelihood=True, return_latents=False,
        return_log_weight=False, return_log_weights=True,
        return_original_latents=smc, return_ancestral_indices=smc)
    lml = np.asarray(out["log_marginal_likelihood"])
    log_weights = np.asarray(out["log_weights"])           # [T, B, K]
    if smc:
        orig = np.asarray(out["original_latents"])          # [T, B, K]
        anc = np.asarray(out["ancestral_indices"])          # [T-1, B, K]
    else:
        orig = np.asarray(out["latents"]) if out["latents"] is not None \
            else None
        # 'is' keeps all latents via log_weights path; rerun for latents
        out2 = inference.infer(
            algorithm, jnp.asarray(obs), initial, transition, emission,
            proposal, K, key=key, return_latents=True,
            return_log_weight=False)
        orig = np.asarray(out2["latents"])
        anc = None
    return lml, log_weights, orig, anc


def extract_noise(algorithm, obs, key, orig, anc):
    """Recovers (eps [T, B, K], uniforms [T-1, B, 1]) from a JAX run."""
    eps = np.empty((T, B, K))
    loc0 = A0 * obs[0] + B0                                  # [B]
    eps[0] = (orig[0] - loc0[:, None]) / S0
    for t in range(1, T):
        if algorithm == "smc":
            prev = np.take_along_axis(orig[t - 1], anc[t - 1], axis=1)
        else:
            prev = orig[t - 1]
        loc = AP * prev + AO * obs[t][:, None] + BT
        eps[t] = (orig[t] - loc) / ST

    # Replay the resampling uniform stream (engine: split(key, (T, 2)),
    # stream 0 at step t; systematic_indices draws uniform([B, 1])).
    step_keys = jax.random.split(key, (T, 2))
    uniforms = np.stack([
        np.asarray(jax.random.uniform(step_keys[t][0], (B, 1),
                                      dtype=jnp.float64))
        for t in range(1, T)])                               # [T-1, B, 1]
    return eps, uniforms


# -------------------------------------------------------------- torch side
def run_reference(algorithm, obs, eps, uniforms):  # noqa: C901
    sys.path.insert(0, REFERENCE)
    import torch

    import aesmc.inference as ref_inference
    import aesmc.state as ref_state

    torch.set_default_dtype(torch.float64)
    eps_queue = [torch.from_numpy(eps[t]) for t in range(T)]
    u_queue = [uniforms[t] for t in range(T - 1)]

    class InjectedNormal(torch.distributions.Normal):
        """Normal whose rsample consumes the pre-drawn eps queue."""

        def rsample(self, sample_shape=torch.Size()):
            assert sample_shape == torch.Size(()), sample_shape
            return self.loc + self.scale * eps_queue.pop(0)

    class Initial:
        def __call__(self):
            return torch.distributions.Normal(
                torch.tensor(INIT_LOC), torch.tensor(INIT_SCALE))

    # In 'is' mode the reference's list aliasing means previous_latents
    # is [x_0..x_t] at transition-call time (see module docstring); index
    # -2 recovers the intended x_{t-1}. In 'smc' the list is the fresh
    # resampled history of length t, so -1 is correct.
    prev_index = -2 if algorithm == "is" else -1

    class Transition:
        def __call__(self, previous_latents=None, time=None,
                     previous_observations=None):
            return ref_state.set_batch_shape_mode(
                torch.distributions.Normal(
                    TRANS_MULT * previous_latents[prev_index],
                    torch.tensor(TRANS_SCALE)),
                ref_state.BatchShapeMode.FULLY_EXPANDED)

    class Emission:
        def __call__(self, latents=None, time=None,
                     previous_observations=None):
            return ref_state.set_batch_shape_mode(
                torch.distributions.Normal(
                    EMIT_MULT * latents[-1], torch.tensor(EMIT_SCALE)),
                ref_state.BatchShapeMode.FULLY_EXPANDED)

    class Proposal:
        def __call__(self, previous_latents=None, time=None,
                     observations=None):
            if time == 0:
                # Expanded to [B, K] so rsample(()) consumes eps directly
                # (equivalent distribution to the BATCH_EXPANDED form).
                loc = (A0 * observations[0] + B0).unsqueeze(-1).expand(B, K)
                return ref_state.set_batch_shape_mode(
                    InjectedNormal(loc, torch.tensor(S0)),
                    ref_state.BatchShapeMode.FULLY_EXPANDED)
            prev = previous_latents[-1]
            obs_t = observations[time].unsqueeze(-1)
            return ref_state.set_batch_shape_mode(
                InjectedNormal(AP * prev + AO * obs_t + BT,
                               torch.tensor(ST)),
                ref_state.BatchShapeMode.FULLY_EXPANDED)

    # Monkeypatch the reference's global-numpy-RNG uniform
    # (/root/reference/aesmc/inference.py:250) to replay our stream.
    real_uniform = np.random.uniform

    def patched_uniform(*args, **kwargs):
        if kwargs.get("size") == [B, 1] and not args:
            return u_queue.pop(0)
        return real_uniform(*args, **kwargs)

    np.random.uniform = patched_uniform
    try:
        observations = [torch.from_numpy(obs[t]) for t in range(T)]
        smc = algorithm == "smc"
        with torch.no_grad():
            out = ref_inference.infer(
                algorithm, observations, Initial(), Transition(),
                Emission(), Proposal(), K,
                return_log_marginal_likelihood=True, return_latents=False,
                return_log_weight=False, return_log_weights=True,
                return_original_latents=False,
                return_ancestral_indices=smc)
    finally:
        np.random.uniform = real_uniform
    assert not eps_queue and not u_queue if smc else not eps_queue, \
        "not all injected noise was consumed"

    lml = out["log_marginal_likelihood"].numpy()
    log_weights = np.stack([w.numpy() for w in out["log_weights"]])
    anc = (np.stack([a.numpy() for a in out["ancestral_indices"]])
           if smc else None)
    return lml, log_weights, anc


def run_t1_gaussian():
    """Second matched-noise config: the conjugate Gaussian at T=1 (the
    reference's test/models/gaussian.py setting), guarding the hoisted
    t=0 path end to end. At T=1 there is no resampling and the IWAE and
    AESMC estimators coincide EXACTLY (both reduce to
    logsumexp_k(log w_0) - log K); the harness asserts that identity on
    both sides as well as cross-implementation agreement."""
    b, k = 17, 64
    mu0, sig0 = 0.3, 1.2          # prior N(mu0, sig0)
    sige = 0.7                    # emission N(x, sige)
    a0, b0, s0 = 0.45, -0.2, 0.8  # proposal N(a0*y + b0, s0)
    rng = np.random.RandomState(SEED + 1)
    obs = rng.randn(1, b)
    key = jax.random.PRNGKey(11)

    from aesmc_tpu import distributions as dists
    from aesmc_tpu import inference
    from aesmc_tpu.state import BatchShapeMode

    class Initial:
        def __call__(self):
            return dists.Normal(mu0, sig0)

    class Emission:
        def __call__(self, latents=None, time=None,
                     previous_observations=None):
            return dists.Normal(
                latents[-1], sige,
                batch_shape_mode=BatchShapeMode.FULLY_EXPANDED)

    class Proposal:
        def __call__(self, previous_latents=None, time=None,
                     observations=None):
            return dists.Normal(
                a0 * observations[0] + b0, s0,
                batch_shape_mode=BatchShapeMode.BATCH_EXPANDED)

    lml_jax = {}
    orig = None
    for algorithm in ("is", "smc"):
        out = inference.infer(
            algorithm, jnp.asarray(obs), Initial(), None, Emission(),
            Proposal(), k, key=key,
            return_log_marginal_likelihood=True, return_latents=True,
            return_log_weight=False)
        lml_jax[algorithm] = np.asarray(out["log_marginal_likelihood"])
        orig = np.asarray(out["latents"])[0]                 # [B, K]

    # Noise extraction (one reparameterized step) + torch replay.
    loc0 = a0 * obs[0] + b0                                  # [B]
    eps = (orig - loc0[:, None]) / s0                        # [B, K]

    sys.path.insert(0, REFERENCE)
    import torch

    import aesmc.inference as ref_inference
    import aesmc.state as ref_state

    torch.set_default_dtype(torch.float64)

    class RInitial:
        def __call__(self):
            return torch.distributions.Normal(
                torch.tensor(mu0), torch.tensor(sig0))

    class REmission:
        def __call__(self, latents=None, time=None,
                     previous_observations=None):
            return ref_state.set_batch_shape_mode(
                torch.distributions.Normal(
                    latents[-1], torch.tensor(sige)),
                ref_state.BatchShapeMode.FULLY_EXPANDED)

    lml_ref = {}
    for algorithm in ("is", "smc"):
        eps_queue = [torch.from_numpy(eps.copy())]

        class InjectedNormal(torch.distributions.Normal):
            def rsample(self, sample_shape=torch.Size()):
                assert sample_shape == torch.Size(()), sample_shape
                return self.loc + self.scale * eps_queue.pop(0)

        class RProposal:
            def __call__(self, previous_latents=None, time=None,
                         observations=None):
                loc = (a0 * observations[0] + b0).unsqueeze(-1) \
                    .expand(b, k)
                return ref_state.set_batch_shape_mode(
                    InjectedNormal(loc, torch.tensor(s0)),
                    ref_state.BatchShapeMode.FULLY_EXPANDED)

        with torch.no_grad():
            out = ref_inference.infer(
                algorithm, [torch.from_numpy(obs[0])], RInitial(), None,
                REmission(), RProposal(), k,
                return_log_marginal_likelihood=True,
                return_latents=False, return_log_weight=False)
        assert not eps_queue, "injected noise not consumed"
        lml_ref[algorithm] = out["log_marginal_likelihood"].numpy()

    dev = max(float(np.max(np.abs(lml_jax[a] - lml_ref[a])))
              for a in ("is", "smc"))
    est_gap_jax = float(np.max(np.abs(lml_jax["is"] - lml_jax["smc"])))
    est_gap_ref = float(np.max(np.abs(lml_ref["is"] - lml_ref["smc"])))
    entry = {"log_ml_max_abs_dev": dev,
             "iwae_aesmc_gap_jax": est_gap_jax,
             "iwae_aesmc_gap_ref": est_gap_ref,
             "ok": dev < 1e-6 and est_gap_jax < 1e-12
                   and est_gap_ref < 1e-12}
    print(f"t1_gaussian: {entry}", file=sys.stderr)
    return entry


def main():
    rng = np.random.RandomState(SEED)
    obs = rng.randn(T, B)
    key = jax.random.PRNGKey(7)

    report = {"config": {"T": T, "B": B, "K": K}, "ok": True}
    for algorithm in ("is", "smc"):
        lml_j, lw_j, orig, anc = run_jax(algorithm, obs, key)
        eps, uniforms = extract_noise(algorithm, obs, key, orig, anc)
        lml_r, lw_r, anc_r = run_reference(algorithm, obs, eps, uniforms)

        lml_dev = float(np.max(np.abs(lml_j - lml_r)))
        lw_dev = float(np.max(np.abs(lw_j - lw_r)))
        entry = {"log_ml_max_abs_dev": lml_dev,
                 "log_weights_max_abs_dev": lw_dev}
        ok = lml_dev < 1e-6 and lw_dev < 1e-6
        if algorithm == "smc":
            anc_mismatch = int(np.sum(anc != anc_r))
            entry["ancestor_index_mismatches"] = anc_mismatch
            ok = ok and anc_mismatch == 0
        entry["ok"] = ok
        report[algorithm] = entry
        report["ok"] = report["ok"] and ok
        print(f"{algorithm}: {entry}", file=sys.stderr)

    report["t1_gaussian"] = run_t1_gaussian()
    report["ok"] = report["ok"] and report["t1_gaussian"]["ok"]

    print(json.dumps(report))
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
