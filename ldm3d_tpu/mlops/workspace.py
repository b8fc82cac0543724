"""Programmatic workspace setup: create + verify the TPU training estate.

Capability parity with the reference's ``mlops/azure/setup_workspace.py``
(creates an Azure ML workspace, a GPU training cluster, and a CPU inference
cluster, ``setup_workspace.py:1-138``), re-homed for Google Cloud: drives
``gcloud`` to create a GKE cluster, a TPU podslice node pool for training, a
CPU node pool for serving, and verifies everything is provisioned — the
programmatic analog the round-1 build only shipped as shell/YAML manifests
(``scripts/setup_gke.sh``, ``deploy/gcp/infrastructure.yaml``).

The gcloud binary is injectable so tests drive the full create/verify flow
against a fake executable; ``--dry-run`` prints the exact commands.
"""

from __future__ import annotations

import json
import logging
import os
import shutil
import subprocess
from dataclasses import dataclass, field

log = logging.getLogger("workspace")

__all__ = ["WorkspaceConfig", "WorkspaceSetup", "WorkspaceError", "main"]


class WorkspaceError(RuntimeError):
    """gcloud is unavailable or a provisioning command failed."""


@dataclass
class WorkspaceConfig:
    project: str
    cluster: str = "ldm3d-cluster"
    region: str = "us-central1"
    zone: str = "us-central1-a"
    # TPU training pool: v5e podslice, topology matches deploy/kubernetes
    tpu_pool: str = "tpu-train-pool"
    tpu_machine_type: str = "ct5lp-hightpu-8t"
    tpu_topology: str = "2x4"
    tpu_nodes: int = 1
    # CPU serving pool (reference parity: separate inference cluster)
    cpu_pool: str = "cpu-serve-pool"
    cpu_machine_type: str = "n2-standard-16"
    cpu_min_nodes: int = 1
    cpu_max_nodes: int = 4
    labels: dict = field(default_factory=lambda: {"app": "ldm3d-tpu"})


class WorkspaceSetup:
    def __init__(self, config: WorkspaceConfig, gcloud: str = "gcloud",
                 dry_run: bool = False):
        self.cfg = config
        self.gcloud = gcloud
        self.dry_run = dry_run
        self.commands_run: list[list[str]] = []

    # -- plumbing -------------------------------------------------------------

    def _run(self, *argv: str, timeout: float = 1800.0) -> str:
        cmd = [self.gcloud, *argv, "--project", self.cfg.project]
        self.commands_run.append(cmd)
        if self.dry_run:
            print(" ".join(cmd))
            return ""
        try:
            out = subprocess.run(cmd, check=True, capture_output=True, text=True,
                                 timeout=timeout)
        except FileNotFoundError as e:
            raise WorkspaceError(f"gcloud not found ({self.gcloud!r})") from e
        except subprocess.CalledProcessError as e:
            raise WorkspaceError(f"{' '.join(cmd)} failed: {e.stderr or e.stdout}") from e
        except subprocess.TimeoutExpired as e:
            raise WorkspaceError(f"{' '.join(cmd)} timed out") from e
        return out.stdout

    def _exists(self, *argv: str) -> bool:
        try:
            self._run(*argv)
            return True
        except WorkspaceError:
            return False

    # -- create ---------------------------------------------------------------

    def create_cluster(self) -> None:
        """GKE cluster (idempotent: describe first, like the reference's
        get-or-create workspace flow)."""
        if not self.dry_run and self._exists(
                "container", "clusters", "describe", self.cfg.cluster,
                "--region", self.cfg.region):
            log.info("cluster %s already exists", self.cfg.cluster)
            return
        log.info("creating cluster %s", self.cfg.cluster)
        self._run("container", "clusters", "create", self.cfg.cluster,
                  "--region", self.cfg.region,
                  "--num-nodes", "1",
                  "--labels", ",".join(f"{k}={v}" for k, v in self.cfg.labels.items()))

    def create_tpu_nodepool(self) -> None:
        """TPU v5e podslice pool — the training analog of the reference's
        A100 gpu-cluster (``workspace_config.yml:11``)."""
        if not self.dry_run and self._exists(
                "container", "node-pools", "describe", self.cfg.tpu_pool,
                "--cluster", self.cfg.cluster, "--region", self.cfg.region):
            log.info("TPU pool %s already exists", self.cfg.tpu_pool)
            return
        log.info("creating TPU node pool %s (%s, topology %s)",
                 self.cfg.tpu_pool, self.cfg.tpu_machine_type, self.cfg.tpu_topology)
        self._run("container", "node-pools", "create", self.cfg.tpu_pool,
                  "--cluster", self.cfg.cluster, "--region", self.cfg.region,
                  "--machine-type", self.cfg.tpu_machine_type,
                  "--tpu-topology", self.cfg.tpu_topology,
                  "--num-nodes", str(self.cfg.tpu_nodes),
                  "--spot")  # trainers resume from preemption (training/preemption.py)

    def create_cpu_nodepool(self) -> None:
        if not self.dry_run and self._exists(
                "container", "node-pools", "describe", self.cfg.cpu_pool,
                "--cluster", self.cfg.cluster, "--region", self.cfg.region):
            log.info("CPU pool %s already exists", self.cfg.cpu_pool)
            return
        log.info("creating CPU node pool %s", self.cfg.cpu_pool)
        self._run("container", "node-pools", "create", self.cfg.cpu_pool,
                  "--cluster", self.cfg.cluster, "--region", self.cfg.region,
                  "--machine-type", self.cfg.cpu_machine_type,
                  "--enable-autoscaling",
                  "--min-nodes", str(self.cfg.cpu_min_nodes),
                  "--max-nodes", str(self.cfg.cpu_max_nodes))

    # -- verify ---------------------------------------------------------------

    def verify(self) -> dict:
        """Check every component is provisioned; returns a status report
        (the reference's setup ends by printing workspace details)."""
        report = {}
        for name, argv in (
            ("cluster", ("container", "clusters", "describe", self.cfg.cluster,
                         "--region", self.cfg.region)),
            ("tpu_pool", ("container", "node-pools", "describe", self.cfg.tpu_pool,
                          "--cluster", self.cfg.cluster, "--region", self.cfg.region)),
            ("cpu_pool", ("container", "node-pools", "describe", self.cfg.cpu_pool,
                          "--cluster", self.cfg.cluster, "--region", self.cfg.region)),
        ):
            report[name] = "ok" if (self.dry_run or self._exists(*argv)) else "missing"
        report["ready"] = all(v == "ok" for k, v in report.items() if k != "ready")
        return report

    def setup(self) -> dict:
        if not self.dry_run and not (os.path.sep in self.gcloud or shutil.which(self.gcloud)):
            raise WorkspaceError(f"{self.gcloud!r} is not on PATH")
        self.create_cluster()
        self.create_tpu_nodepool()
        self.create_cpu_nodepool()
        return self.verify()


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description="create + verify the GKE/TPU training workspace")
    p.add_argument("--project", required=True)
    p.add_argument("--cluster", default="ldm3d-cluster")
    p.add_argument("--region", default="us-central1")
    p.add_argument("--tpu-topology", default="2x4")
    p.add_argument("--dry-run", action="store_true", help="print gcloud commands only")
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO, force=True)

    cfg = WorkspaceConfig(project=args.project, cluster=args.cluster,
                          region=args.region, tpu_topology=args.tpu_topology)
    ws = WorkspaceSetup(cfg, dry_run=args.dry_run)
    report = ws.setup()
    print(json.dumps(report))
    return report


if __name__ == "__main__":
    main()
