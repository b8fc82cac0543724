"""Batch-scoring entry points with the Azure-ML ``init()``/``run()`` contract.

Parity with ``mlops/deployment/score.py:23,78``: ``init()`` loads the model
once per worker; ``run(raw_data)`` takes a JSON string
``{"num_samples": N, "seed": S}`` and returns a JSON string with base64
float32 volumes. ``test_local()`` smoke-runs both (:238-261). Cloud-specific
wiring (mlflow model URIs) is gated on the packages being installed.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Optional

from ldm3d_tpu.serving.model_server import ModelServer

log = logging.getLogger("score")

_server: Optional[ModelServer] = None


def init() -> None:
    """Load the model once (Azure ML calls this at worker start)."""
    global _server
    config = os.environ.get("LDM_CONFIG_FILE")
    env = os.environ.get("LDM_ENVIRONMENT_FILE")
    sampler = os.environ.get("LDM_SAMPLER", "ddim")
    steps = int(os.environ.get("LDM_STEPS", "50"))
    _server = ModelServer(config, env, sampler, steps)
    _server.load_model()
    log.info("score init complete (dummy=%s)", _server.is_dummy)


def run(raw_data: str) -> str:
    """Score one request; returns JSON (contract: ``score.py:78-192``)."""
    if _server is None:
        return json.dumps({"error": "init() was not called"})
    try:
        payload = json.loads(raw_data) if raw_data else {}
    except json.JSONDecodeError as e:
        return json.dumps({"error": f"invalid JSON: {e}"})
    try:
        num = int(payload.get("num_samples", 1))
        seed = payload.get("seed")
        result = _server.generate(num_samples=num, seed=seed)
        return json.dumps(result)
    except Exception as e:  # scoring must not crash the worker
        log.exception("generation failed")
        return json.dumps({"error": str(e)})


def test_local() -> dict:
    """Local smoke test of the init/run contract."""
    init()
    out = json.loads(run(json.dumps({"num_samples": 1, "seed": 0})))
    assert "samples" in out or "error" in out
    return out


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO, force=True)
    print(json.dumps({k: v for k, v in test_local().items() if k != "samples"}))
