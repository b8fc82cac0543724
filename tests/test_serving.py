"""Serving tests: REST contract, metrics format, scoring entry points."""

import base64
import json

import numpy as np
import pytest

from ldm3d_tpu.serving.api_server import Api
from ldm3d_tpu.serving.metrics import Counter, Gauge, Histogram, Registry
from ldm3d_tpu.serving.model_server import ModelServer


@pytest.fixture(scope="module")
def api():
    server = ModelServer(None, None)  # no config -> dummy fallback, like the reference
    server.load_model()
    assert server.is_dummy
    return Api(server)


def test_health(api):
    code, payload = api.health()
    assert code == 200
    assert payload["status"] == "healthy"
    assert payload["model_loaded"] is True
    assert payload["dummy_model"] is True


def test_generate_contract(api):
    code, payload, ctype = api.dispatch("POST", "/generate", {"num_samples": 2, "seed": 1})
    assert code == 200 and ctype == "application/json"
    assert payload["num_samples"] == 2
    s = payload["samples"][0]
    arr = np.frombuffer(base64.b64decode(s["data"]), dtype=np.float32)
    assert arr.size == np.prod(s["shape"])
    assert np.isfinite(arr).all()
    assert 0.0 <= arr.min() and arr.max() <= 1.0  # min-max normalized


def test_generate_validation(api):
    code, payload, _ = api.dispatch("POST", "/generate", {"num_samples": 99})
    assert code == 422
    assert "num_samples" in payload["error"]


def test_unknown_endpoint(api):
    code, payload, _ = api.dispatch("GET", "/nope", {})
    assert code == 404


def test_metrics_exposition(api):
    api.dispatch("GET", "/health", {})
    text = api.metrics_text()
    assert "# TYPE api_requests_total counter" in text
    assert "api_request_duration_seconds_bucket" in text
    assert 'method="GET"' in text


def test_model_info(api):
    code, info = api.model_info()
    assert code == 200
    assert info["dummy"] is True
    assert "devices" in info


def test_metrics_primitives():
    reg = Registry()
    c = reg.register(Counter("c_total", "c", labels=("x",)))
    c.labels("a").inc()
    c.labels("a").inc(2)
    g = reg.register(Gauge("g", "g"))
    g.set(5)
    g.dec()
    h = reg.register(Histogram("h_seconds", "h", buckets=(0.1, 1.0, float("inf"))))
    h.observe(0.05)
    h.observe(0.5)
    text = reg.expose()
    assert 'c_total{x="a"} 3.0' in text
    assert "g 4.0" in text
    assert 'h_seconds_bucket{le="0.1"} 1' in text
    assert "h_seconds_count 2" in text


def test_score_contract(monkeypatch):
    from ldm3d_tpu.serving import score

    score.init()
    out = json.loads(score.run(json.dumps({"num_samples": 1, "seed": 0})))
    assert "samples" in out
    bad = json.loads(score.run("{not json"))
    assert "error" in bad
