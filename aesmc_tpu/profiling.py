"""Profiling / tracing hooks (SURVEY.md S5.1: the reference has none).

Thin wrappers over jax.profiler plus a wall-clock step meter that reports
the benchmark currency (particle-steps/sec)."""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Captures a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region for the profiler timeline (usable as a context
    manager or decorator)."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall-clock meter for training/inference loops.

    Example:
        timer = StepTimer(num_timesteps=T, batch_size=B, num_particles=K)
        for batch in data:
            step(...)
            timer.tick()
        print(timer.summary())
    """

    def __init__(self, num_timesteps: Optional[int] = None,
                 batch_size: Optional[int] = None,
                 num_particles: Optional[int] = None):
        self.num_timesteps = num_timesteps
        self.batch_size = batch_size
        self.num_particles = num_particles
        self.reset()

    def reset(self):
        self._start = time.perf_counter()
        self._ticks = 0

    def tick(self, n: int = 1):
        self._ticks += n

    @property
    def elapsed(self) -> float:
        return time.perf_counter() - self._start

    @property
    def steps_per_sec(self) -> float:
        return self._ticks / max(self.elapsed, 1e-12)

    @property
    def particle_steps_per_sec(self) -> Optional[float]:
        if None in (self.num_timesteps, self.batch_size,
                    self.num_particles):
            return None
        return (self.steps_per_sec * self.num_timesteps *
                self.batch_size * self.num_particles)

    def summary(self) -> str:
        parts = [f"{self._ticks} steps in {self.elapsed:.2f}s "
                 f"({self.steps_per_sec:.2f} steps/s)"]
        pps = self.particle_steps_per_sec
        if pps is not None:
            parts.append(f"{pps/1e6:.2f}M particle-steps/s")
        return ", ".join(parts)
