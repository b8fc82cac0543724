"""Model deployment: render + apply serving manifests with traffic splits.

Capability parity with ``mlops/deployment/deploy_model.py`` (register model,
create endpoint/deployment with probes and traffic split, :191-247), re-homed
for Kubernetes: renders Deployment/Service manifests for a model version from
the registry, supports blue/green traffic percentages, and (when ``kubectl``
exists) applies them. Without a cluster it is a pure manifest generator, so
the deploy path is testable offline.
"""

from __future__ import annotations

import json
import logging
import os
import shutil
import subprocess
from typing import Optional

log = logging.getLogger("deploy_model")

__all__ = ["ModelDeployment"]

_DEPLOYMENT_TMPL = {
    "apiVersion": "apps/v1",
    "kind": "Deployment",
    "metadata": {"name": "", "namespace": "ldm3d", "labels": {}},
    "spec": {
        "replicas": 2,
        "selector": {"matchLabels": {}},
        "template": {
            "metadata": {"labels": {}, "annotations": {
                "prometheus.io/scrape": "true", "prometheus.io/port": "8000",
                "prometheus.io/path": "/metrics"}},
            "spec": {
                "containers": [{
                    "name": "model-server",
                    "image": "",
                    "args": ["python", "-m", "ldm3d_tpu.serving.api_server", "--port", "8000"],
                    "ports": [{"containerPort": 8000}],
                    "env": [],
                    "readinessProbe": {"httpGet": {"path": "/health", "port": 8000},
                                       "initialDelaySeconds": 30, "periodSeconds": 10},
                    "livenessProbe": {"httpGet": {"path": "/health", "port": 8000},
                                      "initialDelaySeconds": 60, "periodSeconds": 30},
                    "startupProbe": {"httpGet": {"path": "/health", "port": 8000},
                                     "failureThreshold": 30, "periodSeconds": 10},
                    "resources": {"limits": {"google.com/tpu": "1"},
                                  "requests": {"cpu": "4", "memory": "16Gi"}},
                }],
                "nodeSelector": {"cloud.google.com/gke-tpu-accelerator": "tpu-v5-lite-podslice"},
            },
        },
    },
}


class ModelDeployment:
    def __init__(self, registry=None, namespace: str = "ldm3d", out_dir: str = "./deploy_out"):
        self.registry = registry
        self.namespace = namespace
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)

    def render(self, name: str, version: int, image: str, traffic_percent: int = 100,
               model_dir: Optional[str] = None, replicas: int = 2) -> dict:
        import copy

        manifest = copy.deepcopy(_DEPLOYMENT_TMPL)
        dep_name = f"{name}-v{version}"
        labels = {"app": name, "version": str(version)}
        manifest["metadata"].update({"name": dep_name, "namespace": self.namespace, "labels": labels})
        manifest["spec"]["replicas"] = replicas
        manifest["spec"]["selector"]["matchLabels"] = labels
        tmpl = manifest["spec"]["template"]
        tmpl["metadata"]["labels"] = labels
        container = tmpl["spec"]["containers"][0]
        container["image"] = image
        if model_dir:
            container["env"].append({"name": "MODEL_DIR", "value": model_dir})
        service = {
            "apiVersion": "v1",
            "kind": "Service",
            "metadata": {"name": name, "namespace": self.namespace,
                         "annotations": {"traffic-split": json.dumps({dep_name: traffic_percent})}},
            "spec": {"selector": {"app": name}, "ports": [{"port": 80, "targetPort": 8000}]},
        }
        return {"deployment": manifest, "service": service}

    def write_manifests(self, rendered: dict, stem: str) -> list[str]:
        import yaml

        paths = []
        for kind, manifest in rendered.items():
            p = os.path.join(self.out_dir, f"{stem}_{kind}.yaml")
            with open(p, "w") as f:
                yaml.safe_dump(manifest, f, sort_keys=False)
            paths.append(p)
        return paths

    def deploy(self, name: str, image: str, stage: str = "Production",
               traffic_percent: int = 100, apply: bool = False) -> dict:
        entry = self.registry.get(name, stage) if self.registry else None
        version = entry["version"] if entry else 1
        model_dir = entry["checkpoint_dir"] if entry else None
        rendered = self.render(name, version, image, traffic_percent, model_dir)
        paths = self.write_manifests(rendered, f"{name}_v{version}")
        applied = False
        if apply and shutil.which("kubectl"):
            for p in paths:
                subprocess.run(["kubectl", "apply", "-f", p], check=True)
            applied = True
        return {"version": version, "manifests": paths, "applied": applied}
