"""Coverage for the small utility modules."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from aesmc_tpu import profiling
from aesmc_tpu.utils import MLP, unstack

KEY = jax.random.PRNGKey(0)


class TestUnstack:
    def test_array(self):
        x = jnp.arange(12.0).reshape(3, 4)
        parts = unstack(x)
        assert len(parts) == 3
        np.testing.assert_array_equal(np.asarray(parts[1]),
                                      np.asarray(x[1]))

    def test_pytree(self):
        tree = {"a": jnp.zeros((2, 3)), "b": jnp.ones((2, 5))}
        parts = unstack(tree)
        assert len(parts) == 2
        assert parts[0]["a"].shape == (3,)
        assert parts[1]["b"].shape == (5,)


class TestMLP:
    def test_shapes_and_batching(self):
        mlp = MLP.create((4, 8, 2), KEY)
        out = mlp(jnp.zeros((5, 7, 4)))
        assert out.shape == (5, 7, 2)

    def test_trainable_leaves(self):
        mlp = MLP.create((4, 8, 2), KEY)
        leaves = jax.tree_util.tree_leaves(mlp)
        assert len(leaves) == 4  # 2 weights + 2 biases

    def test_linear_when_no_activation(self):
        mlp = MLP.create((3, 2), KEY, activation=None)
        x = jnp.asarray(np.random.randn(6, 3).astype(np.float32))
        expected = x @ mlp.weights[0] + mlp.biases[0]
        np.testing.assert_allclose(np.asarray(mlp(x)),
                                   np.asarray(expected), atol=1e-6)


class TestStepTimer:
    def test_counts_and_rates(self):
        timer = profiling.StepTimer(num_timesteps=10, batch_size=2,
                                    num_particles=100)
        for _ in range(5):
            timer.tick()
        time.sleep(0.2)  # let elapsed dwarf the inter-read drift
        assert timer.steps_per_sec > 0
        np.testing.assert_allclose(
            timer.particle_steps_per_sec,
            timer.steps_per_sec * 10 * 2 * 100, rtol=0.05)
        assert "5 steps" in timer.summary()

    def test_no_workload_dims(self):
        timer = profiling.StepTimer()
        timer.tick(3)
        assert timer.particle_steps_per_sec is None
        assert "3 steps" in timer.summary()


class TestTraceAnnotate:
    def test_annotate_runs(self):
        with profiling.annotate("test-region"):
            _ = jnp.sum(jnp.ones((8,)))

    def test_trace_writes(self, tmp_path):
        with profiling.trace(str(tmp_path)):
            float(jnp.sum(jnp.ones((8,))))
        assert any(tmp_path.rglob("*")), "trace produced no files"
