"""Container health check CLI with the reference's exit-code contract.

Parity with ``mlops/docker/health_check.py:53-96``: checks accelerator
availability, model files, disk space, memory, and (optionally) the API
endpoint; exit 0 = healthy, 1 = unhealthy. Used as the Docker HEALTHCHECK and
K8s probe command.

Usage: python -m ldm3d_tpu.serving.health_check [--model-dir D] [--api-url U]
       [--min-disk-gb G] [--max-mem-pct P] [--skip-device]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

import psutil


def check_device() -> dict:
    try:
        import jax

        devs = jax.devices()
        return {"ok": True, "platform": devs[0].platform, "count": len(devs)}
    except Exception as e:
        return {"ok": False, "error": str(e)}


def check_model_files(model_dir: str | None) -> dict:
    if not model_dir:
        return {"ok": True, "skipped": True}
    required = [os.path.join(model_dir, "autoencoder", "best"),
                os.path.join(model_dir, "diffusion_unet", "best")]
    missing = [p for p in required if not os.path.isdir(p)]
    return {"ok": not missing, "missing": missing}


def check_disk(min_free_gb: float) -> dict:
    free_gb = shutil.disk_usage(os.getcwd()).free / 2**30
    return {"ok": free_gb >= min_free_gb, "free_gb": round(free_gb, 1)}


def check_memory(max_used_pct: float) -> dict:
    pct = psutil.virtual_memory().percent
    return {"ok": pct <= max_used_pct, "used_pct": pct}


def check_api(url: str | None) -> dict:
    if not url:
        return {"ok": True, "skipped": True}
    import urllib.request

    try:
        with urllib.request.urlopen(url.rstrip("/") + "/health", timeout=5) as r:
            payload = json.loads(r.read())
        return {"ok": r.status == 200 and payload.get("status") in ("healthy", "degraded"),
                "status": payload.get("status")}
    except Exception as e:
        return {"ok": False, "error": str(e)}


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="container health check")
    p.add_argument("--model-dir", default=os.environ.get("MODEL_DIR"))
    p.add_argument("--api-url", default=os.environ.get("API_URL"))
    p.add_argument("--min-disk-gb", type=float, default=1.0)
    p.add_argument("--max-mem-pct", type=float, default=95.0)
    p.add_argument("--skip-device", action="store_true")
    args = p.parse_args(argv)

    checks = {
        "device": {"ok": True, "skipped": True} if args.skip_device else check_device(),
        "model_files": check_model_files(args.model_dir),
        "disk": check_disk(args.min_disk_gb),
        "memory": check_memory(args.max_mem_pct),
        "api": check_api(args.api_url),
    }
    healthy = all(c["ok"] for c in checks.values())
    print(json.dumps({"healthy": healthy, "checks": checks}))
    return 0 if healthy else 1


if __name__ == "__main__":
    sys.exit(main())
