"""Graceful-shutdown handling for preemptible TPU capacity.

GKE/GCE send SIGTERM ahead of reclaiming a preemptible/spot TPU VM (and to
every pod of a Job on eviction). The reference has no in-train handling at
all — its only recovery is restart-from-last-checkpoint via K8s
``backoffLimit`` (reference ``mlops/kubernetes/jobs.yaml:13``; SURVEY.md 5.3),
losing everything since the last validation save. Here the trainers poll
:class:`GracefulShutdown` each step and, on a pending SIGTERM, save a full
resumable ``last`` checkpoint and exit 0 — the restarted Job continues the
epoch schedule instead of redoing hours of work.

Multi-host note: signal DELIVERY is per-process and not simultaneous, so the
per-step check must be :attr:`GracefulShutdown.requested_global` — a
cross-host agreement (allgather of the local flag). Checking the local flag
alone lets host A break out of the loop at step N while host B has already
dispatched step N's compiled program; B's devices then block in the step's
psum waiting for A, A blocks in the collective orbax save waiting for B, and
the pod deadlocks until the kill deadline without ever writing the
checkpoint this mechanism exists for (found in review).
"""

from __future__ import annotations

import logging
import signal
import threading

__all__ = ["GracefulShutdown"]

log = logging.getLogger("preemption")


class GracefulShutdown:
    """Latches SIGTERM (and optionally others) into a pollable flag.

    Usage::

        stop = GracefulShutdown()          # installs handler
        for epoch ...:
            for step, batch ...:
                ...
                if stop.requested: break
            if stop.requested:
                ckpt.save(..., role="last"); break
    """

    def __init__(self, signals=(signal.SIGTERM,)):
        self._flag = threading.Event()
        self._prev = {}
        for sig in signals:
            try:
                self._prev[sig] = signal.signal(sig, self._handle)
            except ValueError:  # non-main thread (tests, embedded use)
                log.warning("cannot install handler for %s off the main thread", sig)

    def _handle(self, signum, frame):
        log.warning("received %s: finishing current step, then saving 'last' "
                    "checkpoint and exiting", signal.Signals(signum).name)
        self._flag.set()

    @property
    def requested(self) -> bool:
        """Local-process flag (single-host loops, tests)."""
        return self._flag.is_set()

    @property
    def requested_global(self) -> bool:
        """Cross-host agreement on the flag: True everywhere once ANY host
        latched the signal. Every host must evaluate this at the same points
        (the trainers check once per step boundary), keeping the underlying
        allgather collective aligned; single-process runs short-circuit to
        the local flag with no collective."""
        import jax

        if jax.process_count() == 1:
            return self.requested
        import numpy as np
        from jax.experimental import multihost_utils

        flags = multihost_utils.process_allgather(np.asarray(self._flag.is_set()))
        return bool(np.any(flags))

    def trigger(self) -> None:
        """Set the flag programmatically (tests, cooperative shutdown)."""
        self._flag.set()

    def restore(self) -> None:
        """Re-install the previous signal handlers."""
        for sig, prev in self._prev.items():
            signal.signal(sig, prev)
        self._prev.clear()
