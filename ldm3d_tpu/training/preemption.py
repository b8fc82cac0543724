"""Graceful-shutdown handling for preemptible TPU capacity.

GKE/GCE send SIGTERM ahead of reclaiming a preemptible/spot TPU VM (and to
every pod of a Job on eviction). The reference has no in-train handling at
all — its only recovery is restart-from-last-checkpoint via K8s
``backoffLimit`` (reference ``mlops/kubernetes/jobs.yaml:13``; SURVEY.md 5.3),
losing everything since the last validation save. Here the trainers poll
:class:`GracefulShutdown` each step and, on a pending SIGTERM, save a full
resumable ``last`` checkpoint and exit 0 — the restarted Job continues the
epoch schedule instead of redoing hours of work.

Multi-host note: the flag is per-process; cluster schedulers deliver SIGTERM
to every pod of the Job on preemption, so all hosts reach the collective
orbax save together.
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
        return self._flag.is_set()

    def trigger(self) -> None:
        """Set the flag programmatically (tests, cooperative shutdown)."""
        self._flag.set()

    def restore(self) -> None:
        """Re-install the previous signal handlers."""
        for sig, prev in self._prev.items():
            signal.signal(sig, prev)
        self._prev.clear()
