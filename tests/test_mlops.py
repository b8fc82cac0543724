"""MLOps tests: tracking/registry, drift detection, deployment rendering."""

import json
import os

import numpy as np
import pytest

from ldm3d_tpu.mlops.deployment import ModelDeployment
from ldm3d_tpu.mlops.monitoring import DriftDetector, ModelMonitoring
from ldm3d_tpu.mlops.tracking import ExperimentTracker, ModelRegistry, log_training_run


def test_tracker_local_fallback(tmp_path):
    tracker = ExperimentTracker("exp", tracking_root=str(tmp_path))
    run_id = tracker.start_run(run_name="r1", tags={"stage": "1"})
    tracker.log_params({"lr": 1e-4, "patch": [64, 64, 64]})
    tracker.log_metrics({"recon_loss": 0.5}, step=1)
    tracker.log_metrics({"recon_loss": 0.4}, step=2)
    tracker.end_run()
    run_dir = tmp_path / "exp" / run_id
    assert json.loads((run_dir / "meta.json").read_text())["status"] == "FINISHED"
    lines = (run_dir / "metrics.jsonl").read_text().strip().splitlines()
    assert len(lines) == 2
    assert json.loads(lines[1])["recon_loss"] == 0.4


def test_registry_promote_and_get(tmp_path):
    reg = ModelRegistry(str(tmp_path))
    v1 = reg.register("ldm", str(tmp_path), {"loss": 0.5})
    v2 = reg.register("ldm", str(tmp_path), {"loss": 0.4})
    assert (v1, v2) == (1, 2)
    reg.promote("ldm", 2, "Production")
    prod = reg.get("ldm", "Production")
    assert prod["version"] == 2
    assert reg.get("ldm", "Staging") is None
    with pytest.raises(KeyError):
        reg.promote("ldm", 99, "Staging")
    with pytest.raises(ValueError):
        reg.promote("ldm", 1, "NotAStage")


def test_log_training_run(tmp_path):
    tracker = ExperimentTracker("exp", tracking_root=str(tmp_path))
    run_id = log_training_run(tracker, {"lr": 1}, {"val": 0.1})
    assert (tmp_path / "exp" / run_id / "params.json").exists()


def test_drift_detector_detects_shift():
    rng = np.random.default_rng(0)
    ref = rng.normal(0, 1, 5000)
    same = rng.normal(0, 1, 5000)
    shifted = rng.normal(1.5, 1, 5000)
    d = DriftDetector()
    r_same = d.check_feature("x", ref, same)
    r_shift = d.check_feature("x", ref, shifted)
    assert not r_same["ks_drift"]
    assert r_same["psi_severity"] == "none"
    assert r_shift["ks_drift"]
    assert r_shift["psi_severity"] == "severe"


def test_monitoring_reports_and_alerts(tmp_path):
    alerts = []
    mon = ModelMonitoring(report_dir=str(tmp_path), alert_fn=lambda k, p: alerts.append(k))
    rng = np.random.default_rng(1)
    drift = mon.check_data_drift({"f": rng.normal(0, 1, 1000)}, {"f": rng.normal(3, 1, 1000)})
    assert drift["drift_detected"]
    perf = mon.check_performance({"latency_ms": 20000, "error_rate": 0.01})
    assert not perf["healthy"]
    assert "data_drift" in alerts and "performance" in alerts
    path = mon.generate_report(drift, perf)
    assert os.path.exists(path)
    ok = mon.check_performance({"latency_ms": 100, "error_rate": 0.0})
    assert ok["healthy"]


def test_deployment_render(tmp_path):
    reg = ModelRegistry(str(tmp_path / "reg"))
    reg.register("ldm3d", str(tmp_path / "ckpt"), {"loss": 0.2})
    reg.promote("ldm3d", 1, "Production")
    dep = ModelDeployment(registry=reg, out_dir=str(tmp_path / "out"))
    result = dep.deploy("ldm3d", image="ldm3d-tpu:v1", apply=False)
    assert result["version"] == 1 and not result["applied"]
    import yaml

    manifest = yaml.safe_load(open(result["manifests"][0]))
    assert manifest["kind"] == "Deployment"
    container = manifest["spec"]["template"]["spec"]["containers"][0]
    assert container["image"] == "ldm3d-tpu:v1"
    assert container["resources"]["limits"]["google.com/tpu"] == "1"
    assert any(e["name"] == "MODEL_DIR" for e in container["env"])


def test_pipeline_spec_emission(tmp_path):
    from ldm3d_tpu.mlops.pipelines import TrainingPipeline

    pipe = TrainingPipeline("cfg.json", "env.json", str(tmp_path))
    spec = pipe.emit_cloud_spec(image="img:1")
    names = [s["name"] for s in spec["steps"]]
    assert names == ["data-prep", "train-autoencoder", "train-diffusion", "evaluate-register"]
    assert spec["steps"][2]["depends_on"] == ["train-autoencoder"]


def test_batch_inference_pipeline_spec():
    from ldm3d_tpu.mlops.pipelines import BatchInferencePipeline

    bpipe = BatchInferencePipeline("cfg.json", "env.json", num_samples=16,
                                   sampler="dpm", steps=20, batch=4)
    spec = bpipe.emit_cloud_spec(image="img:1")
    assert spec["steps"][0]["name"] == "batch-inference"
    cmd = spec["steps"][0]["command"]
    # 16 samples at batch 4 -> 4 compiled calls of 4 volumes each
    assert "--num 4" in cmd and "--batch 4" in cmd
    assert "--sampler dpm" in cmd and "--steps 20" in cmd

    # auto batch aligns to the device count (8 virtual CPU devices)
    auto = BatchInferencePipeline("cfg.json", "env.json", num_samples=16)
    assert auto._batch() % 8 == 0


def _fake_kubectl(tmp_path, fail_on=None):
    """A fake kubectl that records its argv lines and optionally fails on a
    given subcommand — drives the live apply/rollout path offline."""
    log = tmp_path / "kubectl_calls.log"
    script = tmp_path / "kubectl"
    fail = fail_on or ""
    script.write_text(
        "#!/bin/sh\n"
        f'echo "$@" >> "{log}"\n'
        f'[ -n "{fail}" ] && [ "$1" = "{fail}" ] && {{ echo boom >&2; exit 1; }}\n'
        "exit 0\n")
    script.chmod(0o755)
    return str(script), log


def test_deployment_apply_and_rollout(tmp_path):
    """--apply drives kubectl apply for every manifest then blocks on rollout
    status (reference deploy_model.py:191-247 waits for provisioning)."""
    kubectl, calls = _fake_kubectl(tmp_path)
    dep = ModelDeployment(out_dir=str(tmp_path / "out"), kubectl=kubectl)
    result = dep.deploy("ldm3d", image="ldm3d-tpu:v1", apply=True)
    assert result["applied"] is True
    lines = calls.read_text().splitlines()
    applies = [l for l in lines if l.startswith("apply -f ")]
    assert len(applies) == len(result["manifests"])
    assert any(l.startswith("rollout status deployment/ldm3d-v1 -n ldm3d") for l in lines)


def test_deployment_apply_failure_raises(tmp_path):
    from ldm3d_tpu.mlops.deployment.deploy_model import DeployError

    kubectl, _ = _fake_kubectl(tmp_path, fail_on="rollout")
    dep = ModelDeployment(out_dir=str(tmp_path / "out"), kubectl=kubectl)
    with pytest.raises(DeployError, match="rollout"):
        dep.deploy("ldm3d", image="ldm3d-tpu:v1", apply=True)


def test_deployment_apply_requires_kubectl(tmp_path):
    from ldm3d_tpu.mlops.deployment.deploy_model import DeployError

    dep = ModelDeployment(out_dir=str(tmp_path / "out"),
                          kubectl="definitely-not-a-real-kubectl-binary")
    with pytest.raises(DeployError, match="not on PATH"):
        dep.deploy("ldm3d", image="ldm3d-tpu:v1", apply=True)


def test_deployment_cli_renders(tmp_path):
    from ldm3d_tpu.mlops.deployment.deploy_model import main as deploy_main

    result = deploy_main(["--image", "ldm3d-tpu:v2", "--out-dir", str(tmp_path / "o")])
    assert result["applied"] is False
    assert all(os.path.exists(p) for p in result["manifests"])


# -- workspace setup (reference mlops/azure/setup_workspace.py analog) --------

def _fake_gcloud(tmp_path, missing=()):
    """Fake gcloud: records argv; 'describe' of anything in `missing` fails
    (drives the get-or-create and verify paths)."""
    log = tmp_path / "gcloud_calls.log"
    script = tmp_path / "gcloud"
    checks = " || ".join(f'echo "$@" | grep -q "describe {m}"' for m in missing) or "false"
    script.write_text(
        "#!/bin/sh\n"
        f'echo "$@" >> "{log}"\n'
        f'if {checks}; then exit 1; fi\n'
        "exit 0\n")
    script.chmod(0o755)
    return str(script), log


def test_workspace_setup_creates_missing(tmp_path):
    from ldm3d_tpu.mlops.workspace import WorkspaceConfig, WorkspaceSetup

    gcloud, calls = _fake_gcloud(
        tmp_path, missing=("ldm3d-cluster", "tpu-train-pool", "cpu-serve-pool"))
    # everything "missing" on first describe -> all three creates run; the
    # fake still fails describes during verify, so the report flags them
    ws = WorkspaceSetup(WorkspaceConfig(project="p"), gcloud=gcloud)
    report = ws.setup()
    lines = calls.read_text()
    assert "clusters create ldm3d-cluster" in lines
    assert "node-pools create tpu-train-pool" in lines
    assert "--tpu-topology 2x4" in lines
    assert "node-pools create cpu-serve-pool" in lines
    assert report["ready"] is False  # fake describes still fail


def test_workspace_setup_idempotent(tmp_path):
    from ldm3d_tpu.mlops.workspace import WorkspaceConfig, WorkspaceSetup

    gcloud, calls = _fake_gcloud(tmp_path)  # everything already exists
    ws = WorkspaceSetup(WorkspaceConfig(project="p"), gcloud=gcloud)
    report = ws.setup()
    lines = calls.read_text()
    assert "clusters create" not in lines and "node-pools create" not in lines
    assert report == {"cluster": "ok", "tpu_pool": "ok", "cpu_pool": "ok", "ready": True}


def test_workspace_dry_run(capsys):
    from ldm3d_tpu.mlops.workspace import main as ws_main

    report = ws_main(["--project", "demo", "--dry-run"])
    out = capsys.readouterr().out
    assert "clusters create ldm3d-cluster" in out
    assert report["ready"] is True


def test_workspace_requires_gcloud():
    from ldm3d_tpu.mlops.workspace import WorkspaceConfig, WorkspaceError, WorkspaceSetup

    ws = WorkspaceSetup(WorkspaceConfig(project="p"), gcloud="no-such-gcloud-binary")
    with pytest.raises(WorkspaceError, match="not on PATH"):
        ws.setup()
