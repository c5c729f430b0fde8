"""Twisted (controlled) SMC: zero-variance evidence and learned twists.

Three demonstrations of `aesmc_tpu.twisted` (Guarniero et al. 2017
psi-APF / Heng et al. 2020 controlled SMC):

1. ZERO VARIANCE AT THE OPTIMUM (LGSSM): with the exact twist
   psi_t(x) = p(y_{t:T-1} | x_t) from the closed-form backward
   information filter, the evidence estimate equals the exact Kalman
   log-likelihood at K=4 particles - every particle carries the same
   weight, so there is nothing left to average over.

2. LEARNED TWISTS (stochastic volatility): one iterated-ADP pass
   (`learn_twist`) fits log-quadratic twists by backward regression;
   across replicate keys the twisted evidence estimator's standard
   deviation drops several-fold vs the bootstrap filter at the same K.

3. DISCRETE TWISTS (HMM): `exact_hmm_twist` renormalizes the
   Categorical kernels exactly - the evidence equals the forward
   algorithm at ANY particle count, including K=1.

CPU-pinned and cache-free (CLAUDE.md: CPU-pinned examples must not
read the shared AOT cache).

  PYTHONPATH=/root/repo python examples/twisted_smc_demo.py
"""

import pathlib
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from aesmc_tpu import statistics, twisted  # noqa: E402
from aesmc_tpu import inference  # noqa: E402
from aesmc_tpu.models import hmm, kalman, lgssm  # noqa: E402
from aesmc_tpu.models import stochastic_volatility as sv  # noqa: E402


def demo_zero_variance():
    print("=== 1. LGSSM: exact twist => zero-variance evidence ===")
    key = jax.random.PRNGKey(0)
    T, B = 25, 2
    initial = lgssm.Initial(0.0, 1.0)
    transition = lgssm.Transition.create(0.9, 1.0)
    emission = lgssm.Emission.create(1.0, 0.2)
    _, obs = statistics.sample_from_prior(initial, transition, emission,
                                          T, B, key)
    spec = twisted.GaussianSSMSpec(
        initial_loc=0.0, initial_scale=1.0, transition_scale=1.0,
        mean_fn=lambda prev, t: 0.9 * prev)
    twist = twisted.exact_lgssm_twist(obs, 0.0, 1.0, 0.9, 1.0, 1.0, 0.2)
    out = twisted.twisted_smc(obs, spec, emission, twist,
                              num_particles=4, key=key)
    for b in range(B):
        exact = kalman.kalman_filter(
            np.asarray(obs[:, b]),
            kalman.KalmanParams(0.0, 1.0, 0.9, 0.0, 1.0, 1.0, 0.0,
                                0.04))[4]
        exact = float(np.sum(exact))
        got = float(out["log_marginal_likelihood"][b])
        print(f"  row {b}: twisted log-Z at K=4 = {got:+.6f}   "
              f"exact Kalman = {exact:+.6f}   |dev| = "
              f"{abs(got - exact):.2e}")


def demo_learned_twist():
    print("=== 2. Stochastic volatility: learn_twist variance cut ===")
    key = jax.random.PRNGKey(1)
    T, B, K = 50, 1, 128
    initial, transition, emission, _ = sv.make_model()
    _, obs = statistics.sample_from_prior(initial, transition, emission,
                                          T, B, key)
    mu = transition.mu
    phi = jnp.tanh(transition.raw_phi)
    sigma = jnp.exp(transition.log_sigma)
    spec = twisted.GaussianSSMSpec(
        initial_loc=mu, initial_scale=sigma / jnp.sqrt(1 - phi ** 2),
        transition_scale=sigma,
        mean_fn=lambda prev, t: mu + phi * (prev - mu))
    twist, _ = twisted.learn_twist(obs, spec, emission,
                                   num_particles=512, key=key,
                                   num_iterations=1)
    zero = twisted.QuadraticTwist.zeros(T, B)

    def replicate(tw, seeds=12):
        lzs = [float(twisted.twisted_smc(
            obs, spec, emission, tw, num_particles=K,
            key=jax.random.PRNGKey(100 + s))["log_marginal_likelihood"][0])
            for s in range(seeds)]
        return np.mean(lzs), np.std(lzs)

    m0, s0 = replicate(zero)
    m1, s1 = replicate(twist)
    print(f"  bootstrap (zero twist): log-Z {m0:+.3f} +- {s0:.3f}")
    print(f"  learned twist:          log-Z {m1:+.3f} +- {s1:.3f}  "
          f"({s0 / max(s1, 1e-12):.1f}x sd reduction)")


def demo_discrete():
    print("=== 3. HMM: exact tabular twist == forward algorithm ===")
    key = jax.random.PRNGKey(2)
    T, B = 30, 2
    initial, transition, emission, _ = hmm.make_model(num_states=5)
    _, obs = statistics.sample_from_prior(initial, transition, emission,
                                          T, B, key)
    twist = twisted.exact_hmm_twist(obs, initial.logits,
                                    transition.logits, emission.locs,
                                    emission.scale)
    spec = twisted.DiscreteSSMSpec(initial_logits=initial.logits,
                                   transition_logits=transition.logits)
    out = twisted.twisted_smc(obs, spec, emission, twist,
                              num_particles=1, key=key)
    for b in range(B):
        _, exact = hmm.hmm_forward(
            np.asarray(obs[:, b]), np.asarray(initial.logits),
            np.asarray(transition.logits), np.asarray(emission.locs),
            float(emission.scale))
        got = float(out["log_marginal_likelihood"][b])
        print(f"  row {b}: twisted log-Z at K=1 = {got:+.4f}   "
              f"forward = {exact:+.4f}   |dev| = "
              f"{abs(got - exact):.2e}")


if __name__ == "__main__":
    demo_zero_variance()
    demo_learned_twist()
    demo_discrete()
