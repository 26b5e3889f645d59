"""Profiling/tracing hooks (SURVEY.md §5: the reference has no tracing
subsystem; the TPU build wraps steps in jax.profiler traces and exposes
steps/s counters through the bench harness)."""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/grt_trace", enabled: bool = True):
    """Capture a device trace viewable in TensorBoard/XProf.

    with profiling.trace("/tmp/trace"):
        env.step(actions)
    """
    if not enabled:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Running env-steps/s counter for training loops."""

    def __init__(self, num_envs: int):
        self.num_envs = num_envs
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()
        self._steps = 0

    def tick(self, n: int = 1):
        self._steps += n

    @property
    def steps_per_sec(self) -> float:
        dt = time.perf_counter() - self._t0
        return self.num_envs * self._steps / max(dt, 1e-9)
