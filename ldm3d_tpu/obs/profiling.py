"""Profiling hooks: jax.profiler traces replacing torch.profiler.

The reference gates a torch profiler behind ``--profile``
(``train_autoencoder.py:313-329``: wait 1 / warmup 1 / active 3, TB trace).
Here the same flag wraps a windowed ``jax.profiler`` trace whose output feeds
the TensorBoard profile plugin / Perfetto. Steps outside the active window
cost nothing.
"""

from __future__ import annotations

import contextlib
import time

import jax

__all__ = ["StepProfiler", "Stopwatch"]


class StepProfiler:
    """Trace steps [wait, wait+active) to ``logdir`` when enabled."""

    def __init__(self, logdir: str, enabled: bool = False, wait: int = 2, active: int = 3):
        self.logdir = logdir
        self.enabled = enabled
        self.wait = wait
        self.active = active
        self._step = 0
        self._tracing = False

    def step(self) -> None:
        if not self.enabled:
            return
        if self._step == self.wait and not self._tracing:
            jax.profiler.start_trace(self.logdir)
            self._tracing = True
        if self._step == self.wait + self.active and self._tracing:
            jax.profiler.stop_trace()
            self._tracing = False
        self._step += 1

    def stop(self) -> None:
        if self._tracing:
            jax.profiler.stop_trace()
            self._tracing = False


class Stopwatch:
    """Wall-time measurement that respects JAX async dispatch: callers must
    block on outputs (e.g. ``jax.block_until_ready``) before ``lap``."""

    def __init__(self):
        self._t0 = time.perf_counter()

    def lap(self) -> float:
        now = time.perf_counter()
        dt = now - self._t0
        self._t0 = now
        return dt
