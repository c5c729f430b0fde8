"""Round-4 TPU probe: twisted SMC on a DEEP model (bouncing-ball).

VERDICT r3 next #5: "ship one working twisted run on a nonlinear/deep
model ... Done = measured evidence-sd reduction on a deep model".

The bouncing-ball renderer emission makes the optimal twist
non-log-quadratic, so this exercises the misspecification knobs
(fit_jitter design points, keep='best' deploy-K scoring). Measures, at
T=32 B=4:
  1. bootstrap (zero twist) at the deploy K: evidence mean/sd across
     seeds (the collapse regime);
  2. one jittered ADP pass learned at K_LEARN: same eval;
  3. throughput overhead of the twisted engine path vs bootstrap at
     the deploy K.

Run: PYTHONPATH=/root/repo:/root/.axon_site \
       python benchmarks/twisted_probe_r4.py
"""

import pathlib
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  str(pathlib.Path(__file__).resolve().parent.parent /
                      ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from aesmc_tpu import statistics, twisted  # noqa: E402
from aesmc_tpu.models import bouncing_ball as bb  # noqa: E402

T, B = 32, 4
K_LEARN, K_EVAL = 2048, 128
NSEEDS = 16
CHAIN = 20


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed_chained(fn, key, repeats=3):
    def chained(k):
        def body(carry, _):
            k_, acc = carry
            k_, sub = jax.random.split(k_)
            return (k_, acc + jnp.sum(fn(sub))), None

        (_, acc), _ = jax.lax.scan(body, (k, 0.0), None, length=CHAIN)
        return acc

    jc = jax.jit(chained)
    float(jc(key))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(jc(key))
        times.append(time.perf_counter() - t0)
    return min(times) / CHAIN


def main():
    key = jax.random.PRNGKey(0)
    initial, transition, emission, _ = bb.make_model(key)
    _, obs = statistics.sample_from_prior(
        initial, transition, emission, T, B, key=key)
    spec = bb.gaussian_spec(transition)
    zero = twisted.QuadraticTwist.zeros(T, B, dim=2)

    def run(tw, k_eval=K_EVAL):
        return lambda k: twisted.twisted_smc(
            obs, spec, emission, tw, num_particles=k_eval, key=k,
            return_latents=False, return_log_weight=False,
        )["log_marginal_likelihood"]

    log(f"learning twist (1 jittered ADP pass at K={K_LEARN})...")
    t0 = time.perf_counter()
    learned, info = twisted.learn_twist(
        obs, spec, emission, num_particles=K_LEARN,
        key=jax.random.PRNGKey(2), num_iterations=1, fit_jitter=3.0,
        keep="best", keep_num_particles=K_EVAL)
    learned = jax.tree_util.tree_map(jax.block_until_ready, learned)
    log(f"  learn_twist wall: {time.perf_counter()-t0:.1f} s  "
        f"selected={np.asarray(info['selected'])}")

    keys = jax.random.split(jax.random.PRNGKey(9), NSEEDS)
    z0 = np.asarray(jax.jit(jax.vmap(run(zero)))(keys))
    z1 = np.asarray(jax.jit(jax.vmap(run(learned)))(keys))
    log(f"bootstrap K={K_EVAL}: logZ mean {z0.mean():10.1f}  "
        f"sd {z0.std(0).mean():10.2f}")
    log(f"twisted   K={K_EVAL}: logZ mean {z1.mean():10.1f}  "
        f"sd {z1.std(0).mean():10.2f}  "
        f"(mean +{z1.mean()-z0.mean():.0f} nats, "
        f"sd ratio {z0.std(0).mean()/z1.std(0).mean():.0f}x)")

    tb = timed_chained(run(zero), jax.random.PRNGKey(1))
    tt = timed_chained(run(learned), jax.random.PRNGKey(1))
    log(f"throughput K={K_EVAL}: bootstrap {tb*1e3:6.2f} ms/call "
        f"({T*B*K_EVAL/tb/1e6:6.1f} M ps/s)  twisted {tt*1e3:6.2f} "
        f"ms/call ({T*B*K_EVAL/tt/1e6:6.1f} M ps/s, "
        f"overhead {100*(tt/tb-1):.0f}%)")


if __name__ == "__main__":
    main()
