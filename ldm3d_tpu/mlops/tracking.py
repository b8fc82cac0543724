"""Experiment tracking + model registry (MLflow-compatible, local fallback).

Capability parity with ``mlops/mlflow_integration.py`` (``MLflowTracker``
:18-214, ``ModelRegistry`` :216-262, ``log_training_run`` :283): start/end
runs, log params/metrics/artifacts/figures, register models, and promote them
through stages. When the ``mlflow`` package is installed it is used directly;
otherwise runs are recorded to a local JSON tree (``<root>/<experiment>/
<run_id>/``) with the same call surface — unlike the reference, where the
tracker exists but is never invoked by the trainers, this one is wired into
the CLIs via ``--track`` (and is importable without any cloud SDK).
"""

from __future__ import annotations

import contextlib
import json
import os
import shutil
import time
import uuid
from typing import Optional

__all__ = ["ExperimentTracker", "ModelRegistry", "log_training_run"]


def _mlflow():
    try:
        import mlflow

        return mlflow
    except ImportError:
        return None


class ExperimentTracker:
    """MLflow when available; JSON-file tracking otherwise."""

    def __init__(self, experiment_name: str = "ldm3d-tpu", tracking_root: str = "./mlruns_local",
                 tracking_uri: Optional[str] = None):
        self.experiment_name = experiment_name
        self.tracking_root = tracking_root
        self._mlflow = _mlflow()
        self._run_dir: Optional[str] = None
        self._active = False
        # initialized here, not in start_run: the mlflow backend tolerates
        # log_* before start_run (it auto-starts a run), so the fallback
        # must not AttributeError on the same call sequence
        self._metrics: list[dict] = []
        self._params: dict = {}
        if self._mlflow:
            if tracking_uri:
                self._mlflow.set_tracking_uri(tracking_uri)
            self._mlflow.set_experiment(experiment_name)

    # -- run lifecycle ---------------------------------------------------------

    def start_run(self, run_name: Optional[str] = None, tags: Optional[dict] = None) -> str:
        if self._mlflow:
            run = self._mlflow.start_run(run_name=run_name, tags=tags)
            self._active = True
            return run.info.run_id
        run_id = uuid.uuid4().hex[:12]
        self._run_dir = os.path.join(self.tracking_root, self.experiment_name, run_id)
        os.makedirs(os.path.join(self._run_dir, "artifacts"), exist_ok=True)
        self._write("meta.json", {"run_id": run_id, "run_name": run_name,
                                  "tags": tags or {}, "start_time": time.time()})
        self._metrics: list[dict] = []
        self._params: dict = {}
        self._active = True
        return run_id

    def end_run(self, status: str = "FINISHED") -> None:
        if not self._active:
            return
        if self._mlflow:
            self._mlflow.end_run(status=status)
        else:
            self._write("params.json", self._params)
            self._write("metrics.jsonl", None, lines=self._metrics)
            meta = self._read("meta.json")
            meta.update({"end_time": time.time(), "status": status})
            self._write("meta.json", meta)
        self._active = False

    # -- logging ---------------------------------------------------------------

    def log_params(self, params: dict) -> None:
        if self._mlflow:
            self._mlflow.log_params({k: str(v) for k, v in params.items()})
        else:
            self._params.update({k: repr(v) for k, v in params.items()})

    def log_metrics(self, metrics: dict, step: Optional[int] = None) -> None:
        if self._mlflow:
            self._mlflow.log_metrics({k: float(v) for k, v in metrics.items()}, step=step)
        else:
            self._metrics.append({"step": step, "time": time.time(),
                                  **{k: float(v) for k, v in metrics.items()}})

    def log_artifact(self, path: str, artifact_path: Optional[str] = None) -> None:
        """``artifact_path``: optional subdirectory — distinguishes artifacts
        that share a basename (e.g. each stage's ``best_meta.json``)."""
        if self._mlflow:
            self._mlflow.log_artifact(path, artifact_path=artifact_path)
        elif self._run_dir:
            dest = os.path.join(self._run_dir, "artifacts", artifact_path or "")
            os.makedirs(dest, exist_ok=True)
            shutil.copy(path, os.path.join(dest, os.path.basename(path)))

    # -- helpers -----------------------------------------------------------------

    def _write(self, name: str, obj, lines: Optional[list] = None) -> None:
        p = os.path.join(self._run_dir, name)
        with open(p, "w") as f:
            if lines is not None:
                for rec in lines:
                    f.write(json.dumps(rec) + "\n")
            else:
                json.dump(obj, f, indent=2)

    def _read(self, name: str) -> dict:
        with open(os.path.join(self._run_dir, name)) as f:
            return json.load(f)


class ModelRegistry:
    """Register / promote / resolve model versions in a local JSON index over
    checkpoint directories (stages: None -> Staging -> Production, the stage
    contract of the reference's ``mlflow_integration.py:216-262``).

    Deliberately file-based rather than the MLflow model registry: the
    artifacts are orbax checkpoint DIRECTORIES on shared storage, which the
    MLflow registry cannot serve; the index records where they live. Writes
    are serialized with an advisory file lock and committed atomically
    (tmp + rename), so concurrent CI jobs cannot lose a version record.
    """

    STAGES = ("None", "Staging", "Production", "Archived")

    def __init__(self, registry_root: str = "./model_registry"):
        self.registry_root = registry_root
        os.makedirs(registry_root, exist_ok=True)
        self._index_path = os.path.join(registry_root, "index.json")
        self._lock_path = os.path.join(registry_root, ".index.lock")

    @contextlib.contextmanager
    def _locked(self):
        """Advisory lock around read-modify-write of the index."""
        import fcntl

        with open(self._lock_path, "w") as lock_f:
            fcntl.flock(lock_f, fcntl.LOCK_EX)
            try:
                yield
            finally:
                fcntl.flock(lock_f, fcntl.LOCK_UN)

    def _index(self) -> dict:
        if os.path.exists(self._index_path):
            with open(self._index_path) as f:
                return json.load(f)
        return {}

    def _save_index(self, idx: dict) -> None:
        tmp = self._index_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(idx, f, indent=2)
        os.replace(tmp, self._index_path)  # atomic: readers never see a torn file

    def register(self, name: str, checkpoint_dir: str, metrics: Optional[dict] = None) -> int:
        with self._locked():
            idx = self._index()
            versions = idx.setdefault(name, [])
            version = len(versions) + 1
            versions.append({
                "version": version,
                "checkpoint_dir": os.path.abspath(checkpoint_dir),
                "metrics": metrics or {},
                "stage": "None",
                "registered_at": time.time(),
            })
            self._save_index(idx)
        return version

    def promote(self, name: str, version: int, stage: str) -> None:
        if stage not in self.STAGES:
            raise ValueError(f"stage must be one of {self.STAGES}")
        with self._locked():
            idx = self._index()
            for entry in idx.get(name, []):
                if entry["version"] == version:
                    entry["stage"] = stage
                    self._save_index(idx)
                    return
        raise KeyError(f"{name} v{version} not found")

    def get(self, name: str, stage: str = "Production") -> Optional[dict]:
        candidates = [e for e in self._index().get(name, []) if e["stage"] == stage]
        return max(candidates, key=lambda e: e["version"]) if candidates else None


def log_training_run(tracker: ExperimentTracker, config: dict, final_metrics: dict,
                     checkpoint_dir: Optional[str] = None, run_name: Optional[str] = None) -> str:
    """One-call convenience mirroring ``mlflow_integration.py:283``."""
    run_id = tracker.start_run(run_name=run_name)
    try:
        tracker.log_params(config)
        tracker.log_metrics(final_metrics)
        if checkpoint_dir and os.path.isdir(checkpoint_dir):
            # CheckpointManager writes the sidecar at
            # <model_dir>/<artifact>/best_meta.json (manager.py), one per
            # stage artifact — log whichever exist (plus a flat one, for
            # callers passing an artifact dir directly)
            for sub in ("", "autoencoder", "discriminator", "diffusion_unet"):
                meta = os.path.join(checkpoint_dir, sub, "best_meta.json")
                if os.path.exists(meta):
                    # per-stage subdir: they all share the basename, and both
                    # backends store artifacts by basename (last write wins)
                    tracker.log_artifact(meta, artifact_path=sub or None)
        tracker.end_run("FINISHED")
    except Exception:
        tracker.end_run("FAILED")
        raise
    return run_id
