"""SMC samplers for STATIC targets (beyond parity).

Annealed SMC / resample-move (Del Moral, Doucet, Jasra, "Sequential
Monte Carlo samplers", JRSS-B 2006; Neal 2001 AIS): a particle cloud is
transported from a tractable prior p0 to a target
pi(x) ∝ p0(x) exp(L(x)) through the geometric path
pi_b(x) ∝ p0(x) exp(b L(x)), b: 0 -> 1. Each rung reweights by
(b' - b) L(x), resamples, and rejuvenates with MCMC moves targeting
pi_b' — and the product of rung normalizers is an UNBIASED estimate of
Z = ∫ p0(x) exp(L(x)) dx (the model evidence when L is a
log-likelihood). The temperature ladder is chosen ON THE FLY by
bisecting each increment so the incremental ESS hits a target fraction
(Jasra et al. 2011) — no hand-tuned schedule. The reference package
(/root/reference/aesmc) only treats sequential state-space targets;
it has no static-target sampler.

TPU shape: ONE `jax.lax.while_loop` over temperature rungs (static
shapes, bounded by `max_steps`; XLA compiles the rung body once). The
ESS bisection is a `lax.fori_loop` of ~40 scalar iterations on the
VPU; the K-particle Metropolis rejuvenation sweeps are fully
vectorized (no per-particle loop) and the user's log-densities are
`jax.vmap`-ed over the cloud, so likelihood evaluations batch onto
the MXU for neural targets.

`waste_free_chains=M` switches each rung to WASTE-FREE SMC
(Dau & Chopin, JRSS-B 2022): resample M chain roots, run each for
K/M - 1 Metropolis steps, and keep EVERY chain state as a particle -
no MCMC evaluation is discarded, same unbiased evidence estimator.
"""

from __future__ import annotations

import math as _stdmath

import jax
import jax.numpy as jnp

from . import resampling

__all__ = ["smc_sampler"]


def _ess_from_logw(log_w):
    return jnp.exp(2.0 * jax.nn.logsumexp(log_w) -
                   jax.nn.logsumexp(2.0 * log_w))


def _first_leaf(tree):
    return jax.tree_util.tree_leaves(tree)[0]


def smc_sampler(log_prior, log_likelihood, initial_particles, key=None,
                num_moves: int = 3, step_size=0.5,
                ess_target: float = 0.5, max_steps: int = 64,
                betas=None, resampling_method: str = "systematic",
                resampling_implementation="auto",
                waste_free_chains=None,
                return_history: bool = False):
    """Adaptive annealed SMC from `p0` to `p0 * exp(log_likelihood)`.

    Args:
        log_prior: `one_particle_pytree -> scalar` log p0 density (up
            to a constant; the constant cancels in the MCMC ratio but
            NOT in log_Z — supply the normalized density when the
            evidence estimate matters).
        log_likelihood: `one_particle_pytree -> scalar` tempered term
            L(x). For Bayesian inference: the log-likelihood of the
            data. Both callables are vmapped over the cloud here.
        initial_particles: pytree with leading axis `[K, ...]` of iid
            draws from p0 (the user samples; any pytree structure).
        key: PRNG key.
        num_moves: Metropolis random-walk sweeps per rung.
        step_size: RWM proposal scale — scalar, or a pytree matching
            one particle for per-leaf scales.
        ess_target: each temperature increment is bisected so the
            incremental ESS is `ess_target * K` (0 < target < 1).
            Larger = smaller steps = more rungs.
        max_steps: static bound on the number of rungs. If the ladder
            has not reached b=1 by then, the final increment jumps to 1
            (`reached_final` reports whether the schedule completed
            adaptively).
        betas: optional explicit `[S]` increasing ladder ending at 1.0
            (overrides the adaptive schedule; b=0 start implicit).
        resampling_method: 'systematic' | 'stratified' | 'multinomial'.
        resampling_implementation: 'auto' | 'xla' | 'pallas' — 'auto'
            routes the ancestor search through the fused Pallas kernel
            at kernel-worthy K on a real TPU. (Resample-move mode only;
            waste-free root draws are M-sized and stay in XLA.)
        waste_free_chains: M, or None (default: classic resample-move).
            WASTE-FREE SMC (Dau & Chopin, JRSS-B 2022): each rung
            resamples only M << K chain ROOTS (M must divide K), runs
            each root through P - 1 = K/M - 1 Metropolis steps, and the
            next cloud is ALL M * P chain states — every MCMC
            evaluation becomes a particle instead of being discarded,
            and the evidence estimator stays unbiased (their Thm 1;
            proven for multinomial root draws — pass
            resampling_method='multinomial' when unbiasedness matters,
            the grid methods are the usual lower-variance practical
            choice). `num_moves` becomes the THINNING factor: each of
            the P - 1 collected states is separated by `num_moves`
            RWM sweeps (must be >= 1).
        return_history: also return the per-rung beta/ESS/acceptance
            paths (padded to `max_steps` in adaptive mode).

    Returns:
        dict:
          particles: pytree `[K, ...]` — the final (equally-weighted,
              post-move) cloud targeting pi.
          log_normalizer: scalar log Z_hat, unbiased in Z.
          num_steps: rungs taken (int32).
          acceptance_rate: mean RWM acceptance over all moves.
          reached_final: bool — the adaptive ladder reached b=1 on its
              own (False when the max_steps jump-to-1 had to fire).
          (return_history) beta_history `[max_steps]` (NaN-padded),
          ess_history, acceptance_history.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    if not 0.0 < float(ess_target) < 1.0:
        raise ValueError(
            f"ess_target must be in (0, 1). currently = {ess_target}")
    if num_moves < 0:
        raise ValueError(
            f"num_moves must be >= 0. currently = {num_moves}")
    particles = jax.tree_util.tree_map(jnp.asarray, initial_particles)
    num_particles = int(_first_leaf(particles).shape[0])
    log_k = _stdmath.log(num_particles)
    if waste_free_chains is not None:
        m = int(waste_free_chains)
        if not 1 <= m < num_particles:
            raise ValueError(
                "waste_free_chains must satisfy 1 <= M < K. "
                f"currently = {m} (K = {num_particles})")
        if num_particles % m != 0:
            raise ValueError(
                "waste_free_chains must divide the particle count: "
                f"K = {num_particles}, M = {m}")
        if num_moves < 1:
            raise ValueError(
                "waste-free mode needs num_moves >= 1 (the thinning "
                f"between collected chain states). currently = "
                f"{num_moves}")
        chain_len = num_particles // m
    v_log_prior = jax.vmap(log_prior)
    v_log_lik = jax.vmap(log_likelihood)
    if isinstance(step_size, (int, float)):
        one = jax.tree_util.tree_map(lambda x: x[0], particles)
        step_tree = jax.tree_util.tree_map(
            lambda x: jnp.full_like(
                jnp.asarray(x, jnp.result_type(float)), step_size), one)
    else:
        step_tree = jax.tree_util.tree_map(jnp.asarray, step_size)

    def next_beta(beta, loglik):
        """Largest b in (beta, 1] with ESS((b - beta) loglik) >=
        ess_target * K, by bisection (ESS is nonincreasing in b)."""
        target = ess_target * num_particles

        def ess_at(b):
            return _ess_from_logw((b - beta) * loglik)

        def body(_, bounds):
            lo, hi = bounds
            mid = 0.5 * (lo + hi)
            ok = ess_at(mid) >= target
            return jnp.where(ok, mid, lo), jnp.where(ok, hi, mid)

        lo, hi = jax.lax.fori_loop(
            0, 40, body, (beta, jnp.asarray(1.0, beta.dtype)))
        return jnp.where(ess_at(jnp.asarray(1.0, beta.dtype)) >= target,
                         jnp.asarray(1.0, beta.dtype), lo)

    def make_sweep(target_logp):
        """One vectorized RWM Metropolis sweep over a cloud of any
        leading size (K in resample-move, M chains in waste-free)."""
        def one_sweep(carry, kk):
            particles, logp, accepted = carry
            leaves, treedef = jax.tree_util.tree_flatten(particles)
            keys = jax.random.split(kk, len(leaves) + 1)
            steps = jax.tree_util.tree_leaves(step_tree)
            prop_leaves = [
                x + s * jax.random.normal(nk, x.shape, x.dtype)
                for x, s, nk in zip(leaves, steps, keys[1:])]
            prop = jax.tree_util.tree_unflatten(treedef, prop_leaves)
            prop_logp = target_logp(prop)
            u = jax.random.uniform(keys[0], logp.shape)
            acc = jnp.log(u) < prop_logp - logp
            particles = jax.tree_util.tree_map(
                lambda a, b: jnp.where(
                    acc.reshape(acc.shape + (1,) * (a.ndim - 1)), a, b),
                prop, particles)
            logp = jnp.where(acc, prop_logp, logp)
            accepted = accepted + jnp.mean(acc.astype(jnp.float32))
            return (particles, logp, accepted), None

        return one_sweep

    def move(particles, beta, k):
        """num_moves vectorized RWM sweeps targeting
        p0 * exp(beta * L)."""
        def target_logp(p):
            return v_log_prior(p) + beta * v_log_lik(p)

        one_sweep = make_sweep(target_logp)
        logp0 = target_logp(particles)
        (particles, _, accepted), _ = jax.lax.scan(
            one_sweep, (particles, logp0, jnp.zeros((), jnp.float32)),
            jax.random.split(k, num_moves), length=num_moves)
        return particles, accepted / max(num_moves, 1)

    def waste_free_positions(log_w, k_res):
        """M inverse-CDF query positions over the K-weight CDF."""
        if resampling_method == "systematic":
            u = jax.random.uniform(k_res, (), log_w.dtype)
            return (u + jnp.arange(m, dtype=log_w.dtype)) / m
        if resampling_method == "stratified":
            u = jax.random.uniform(k_res, (m,), log_w.dtype)
            return (u + jnp.arange(m, dtype=log_w.dtype)) / m
        return jax.random.uniform(k_res, (m,), log_w.dtype)

    def waste_free_move(roots, beta, k):
        """Chains of length P from M roots, all states collected
        (Dau & Chopin 2022): num_moves RWM sweeps between consecutive
        collected states, roots included in the output cloud."""
        def target_logp(p):
            return v_log_prior(p) + beta * v_log_lik(p)

        one_sweep = make_sweep(target_logp)

        def one_state(carry, kk):
            carry, _ = jax.lax.scan(one_sweep, carry,
                                    jax.random.split(kk, num_moves),
                                    length=num_moves)
            return carry, carry[0]

        logp0 = target_logp(roots)
        (_, _, accepted), states = jax.lax.scan(
            one_state, (roots, logp0, jnp.zeros((), jnp.float32)),
            jax.random.split(k, chain_len - 1), length=chain_len - 1)
        cloud = jax.tree_util.tree_map(
            lambda r, s: jnp.concatenate([r[None], s], axis=0).reshape(
                (num_particles,) + r.shape[1:]),
            roots, states)
        return cloud, accepted / ((chain_len - 1) * num_moves)

    def rung(particles, beta, new_beta, log_z, k, loglik):
        k_res, k_move = jax.random.split(k)
        log_w = (new_beta - beta) * loglik
        log_z = log_z + jax.nn.logsumexp(log_w) - log_k
        ess = _ess_from_logw(log_w)
        if waste_free_chains is None:
            idx = resampling.sample_ancestral_index(
                log_w[None], k_res, method=resampling_method,
                implementation=resampling_implementation)[0]
            particles = jax.tree_util.tree_map(
                lambda x: jnp.take(x, idx, axis=0), particles)
            particles, acc = move(particles, new_beta, k_move)
        else:
            pos = waste_free_positions(log_w, k_res)
            cum = resampling._normalized_cumsum(log_w[None])[0]
            idx = jnp.clip(
                jnp.searchsorted(cum, pos.astype(cum.dtype),
                                 side="right"),
                0, num_particles - 1)
            roots = jax.tree_util.tree_map(
                lambda x: jnp.take(x, idx, axis=0), particles)
            particles, acc = waste_free_move(roots, new_beta, k_move)
        return particles, log_z, ess, acc

    if betas is not None:
        betas = jnp.asarray(betas, jnp.result_type(float))

        def scan_step(carry, new_beta):
            particles, beta, log_z, key = carry
            key, k = jax.random.split(key)
            loglik = v_log_lik(particles)
            particles, log_z, ess, acc = rung(
                particles, beta, new_beta, log_z, k, loglik)
            return (particles, new_beta, log_z, key), (ess, acc)

        (particles, _, log_z, _), (ess_h, acc_h) = jax.lax.scan(
            scan_step, (particles, jnp.zeros((), betas.dtype),
                        jnp.zeros(()), key), betas)
        out = {
            "particles": particles,
            "log_normalizer": log_z,
            "num_steps": jnp.asarray(betas.shape[0], jnp.int32),
            "acceptance_rate": jnp.mean(acc_h),
            "reached_final": jnp.asarray(True),
        }
        if return_history:
            out["beta_history"] = betas
            out["ess_history"] = ess_h
            out["acceptance_history"] = acc_h
        return out

    # ---- adaptive ladder under lax.while_loop.
    ftype = jnp.result_type(float)
    init = (particles, jnp.zeros((), ftype), jnp.zeros(()), key,
            jnp.zeros((), jnp.int32), jnp.asarray(False),
            jnp.full((max_steps,), jnp.nan, ftype),
            jnp.full((max_steps,), jnp.nan, ftype),
            jnp.full((max_steps,), jnp.nan, jnp.float32))

    def cond(state):
        _, beta, _, _, step, _, _, _, _ = state
        return (beta < 1.0) & (step < max_steps)

    def body(state):
        particles, beta, log_z, key, step, forced, b_h, e_h, a_h = state
        key, k = jax.random.split(key)
        loglik = v_log_lik(particles)
        adaptive_beta = next_beta(beta, loglik)
        # Guarantee b reaches 1 within the static bound: the last
        # permitted rung jumps straight to 1 (log_z stays unbiased —
        # just a higher-variance final increment).
        force = (step == max_steps - 1) & (adaptive_beta < 1.0)
        new_beta = jnp.where(force, jnp.asarray(1.0, beta.dtype),
                             adaptive_beta)
        particles, log_z, ess, acc = rung(
            particles, beta, new_beta, log_z, k, loglik)
        b_h = b_h.at[step].set(new_beta)
        e_h = e_h.at[step].set(ess)
        a_h = a_h.at[step].set(acc)
        return (particles, new_beta, log_z, key, step + 1,
                forced | force, b_h, e_h, a_h)

    (particles, beta, log_z, _, step, forced, b_h, e_h, a_h) = \
        jax.lax.while_loop(cond, body, init)
    taken = jnp.isfinite(a_h)
    out = {
        "particles": particles,
        "log_normalizer": log_z,
        "num_steps": step,
        "acceptance_rate": (jnp.nansum(a_h) /
                            jnp.maximum(jnp.sum(taken), 1)),
        "reached_final": ~forced,
    }
    if return_history:
        out["beta_history"] = b_h
        out["ess_history"] = e_h
        out["acceptance_history"] = a_h
    return out
