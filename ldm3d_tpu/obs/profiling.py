"""Profiling hooks: jax.profiler traces replacing torch.profiler.

The reference gates a torch profiler behind ``--profile``
(``train_autoencoder.py:313-329``: wait 1 / warmup 1 / active 3, TB trace).
Here the same flag wraps a windowed ``jax.profiler`` trace whose output feeds
the TensorBoard profile plugin / Perfetto. Steps outside the active window
cost nothing.
"""

from __future__ import annotations

import logging
import time

import jax

__all__ = ["StepProfiler", "Stopwatch"]

log = logging.getLogger("profiling")


class StepProfiler:
    """Trace steps [wait, wait+active) to ``logdir`` when enabled.

    ``wait`` skips the first steps (compile + warm-up); the trace covers the
    next ``active`` steps. If the run ends before the window opens (fewer
    than ``wait+1`` steps), ``stop()`` says so instead of silently writing
    nothing.
    """

    def __init__(self, logdir: str, enabled: bool = False, wait: int = 1, active: int = 3):
        self.logdir = logdir
        self.enabled = enabled
        self.wait = wait
        self.active = active
        self._step = 0
        self._tracing = False
        self._traced = False

    def step(self) -> None:
        if not self.enabled:
            return
        if self._step == self.wait and not self._tracing:
            jax.profiler.start_trace(self.logdir)
            self._tracing = True
            self._traced = True
        if self._step == self.wait + self.active and self._tracing:
            jax.profiler.stop_trace()
            self._tracing = False
            log.info("profiler trace written to %s", self.logdir)
        self._step += 1

    def stop(self) -> None:
        if self._tracing:
            jax.profiler.stop_trace()
            self._tracing = False
            log.info("profiler trace written to %s", self.logdir)
        elif self.enabled and not self._traced:
            log.warning(
                "--profile produced no trace: only %d step(s) ran, the window "
                "opens at step %d — run more steps or lower `wait`",
                self._step, self.wait + 1)


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
