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


def test_request_count_labels_actual_status(api):
    """Per-status counters must label the code actually returned (reference
    middleware parity, api_server.py:273-294) — a 422 is not a 200."""
    from ldm3d_tpu.serving.api_server import REQUEST_COUNT

    api.dispatch("POST", "/generate", {"num_samples": 99})  # 422
    api.dispatch("GET", "/nope", {})                         # 404
    api.dispatch("GET", "/health", {})                       # 200
    counts = {labels: v for labels, v in REQUEST_COUNT.collect()}
    assert counts.get(("POST", "/generate", "422"), 0) >= 1
    # unknown paths collapse to one label (bounded metric cardinality)
    assert counts.get(("GET", "<other>", "404"), 0) >= 1
    assert counts.get(("GET", "/health", "200"), 0) >= 1
    assert not any(lbl[1] == "/nope" for lbl in counts)


def test_query_string_and_bad_types(api):
    """Probes append query params (?probe=1) — must still route; non-numeric
    request fields are the client's fault: 422, never 500."""
    code, payload, _ = api.dispatch("GET", "/health?probe=1", {})
    assert code == 200
    code, payload, _ = api.dispatch("POST", "/generate", {"num_samples": "abc"})
    assert code == 422 and "invalid request field" in payload["error"]
    code, payload, _ = api.dispatch("POST", "/generate", {"guidance_scale": "x"})
    assert code == 422
    code, payload, _ = api.dispatch("POST", "/generate", [1, 2])  # non-object body
    assert code == 422


def test_dispatch_internal_error_returns_500(api, monkeypatch):
    """A handler exception must produce a 500 response (and count as one),
    never leave the HTTP client with a closed socket."""
    from ldm3d_tpu.serving.api_server import REQUEST_COUNT

    def boom(body):
        raise KeyError("boom")

    monkeypatch.setattr(api, "generate", boom)
    code, payload, ctype = api.dispatch("POST", "/generate", {})
    assert code == 500 and "error" in payload
    counts = {labels: v for labels, v in REQUEST_COUNT.collect()}
    assert counts.get(("POST", "/generate", "500"), 0) >= 1


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


def test_score_contract():
    from ldm3d_tpu.serving import score

    score.init()
    out = json.loads(score.run(json.dumps({"num_samples": 1, "seed": 0})))
    assert "samples" in out
    bad = json.loads(score.run("{not json"))
    assert "error" in bad


@pytest.fixture(scope="module")
def real_api(tmp_path_factory):
    """Real two-stage pipeline from init-params checkpoints (no training):
    exercises the non-dummy load path the reference never implemented."""
    from scaffolds import make_two_stage_checkpoints, write_env_json

    root = tmp_path_factory.mktemp("serving_real")
    cfg_path, model_dir = make_two_stage_checkpoints(root, conditional=True)
    env = write_env_json(root / "env.json", model_dir, root)
    server = ModelServer(cfg_path, str(env), sampler="ddim", steps=2)
    server.load_model()
    assert not server.is_dummy, "real pipeline failed to load"
    return Api(server)


def test_real_conditional_generate(real_api):
    patch = real_api.server.patch_size
    vol = np.random.default_rng(0).random(patch, dtype=np.float32)

    out = real_api.server.generate(1, seed=0, condition_volume=vol)
    assert out["conditioning"] == "provided"
    arr = np.frombuffer(base64.b64decode(out["samples"][0]["data"]), np.float32)
    assert np.isfinite(arr).all() and arr.size == np.prod(patch)

    # same seed + same condition -> deterministic
    out2 = real_api.server.generate(1, seed=0, condition_volume=vol)
    arr2 = np.frombuffer(base64.b64decode(out2["samples"][0]["data"]), np.float32)
    np.testing.assert_array_equal(arr, arr2)

    # no condition on a conditional model -> random conditioning, flagged
    out3 = real_api.server.generate(1, seed=0)
    assert out3["conditioning"] == "random"

    with pytest.raises(ValueError, match="does not match"):
        real_api.server.generate(1, condition_volume=np.zeros((8, 8, 8), np.float32))


def test_real_conditional_generate_rest(real_api):
    patch = real_api.server.patch_size
    vol = np.random.default_rng(1).random(patch, dtype=np.float32)
    body = {
        "num_samples": 1, "seed": 3,
        "condition": {"data": base64.b64encode(vol.tobytes()).decode("ascii"),
                      "shape": list(patch)},
    }
    code, payload, _ = real_api.dispatch("POST", "/generate", body)
    assert code == 200
    assert payload["conditioning"] == "provided"

    code, payload, _ = real_api.dispatch(
        "POST", "/generate",
        {"num_samples": 1, "condition": {"data": "!!notbase64", "shape": [1]}})
    assert code == 422


def test_batched_sampler_chunks(real_api):
    """batch > 1: requests chunk into compiled batch-N calls and trim."""
    srv = ModelServer(real_api.server.config_file, real_api.server.environment_file,
                      sampler="ddim", steps=2, batch=2)
    srv.load_model()
    assert not srv.is_dummy
    out = srv.generate(3, seed=0)  # ceil(3/2) = 2 chunks, trimmed to 3
    assert out["num_samples"] == 3 and len(out["samples"]) == 3
    for s in out["samples"]:
        arr = np.frombuffer(base64.b64decode(s["data"]), np.float32)
        assert np.isfinite(arr).all()


def test_decode_chunk_matches_whole_batch(real_api):
    """--decode-chunk 1: the chunked VAE decode returns exactly the same
    volumes as the whole-batch decode (same compiled scan, same seed)."""
    srv_whole = ModelServer(real_api.server.config_file, real_api.server.environment_file,
                            sampler="ddim", steps=2, batch=2, decode_chunk=0)
    srv_whole.load_model()
    srv_chunk = ModelServer(real_api.server.config_file, real_api.server.environment_file,
                            sampler="ddim", steps=2, batch=2, decode_chunk=1)
    srv_chunk.load_model()
    assert not srv_whole.is_dummy and not srv_chunk.is_dummy

    out_w = srv_whole.generate(2, seed=7)
    out_c = srv_chunk.generate(2, seed=7)
    for sw, sc in zip(out_w["samples"], out_c["samples"]):
        aw = np.frombuffer(base64.b64decode(sw["data"]), np.float32)
        ac = np.frombuffer(base64.b64decode(sc["data"]), np.float32)
        np.testing.assert_array_equal(aw, ac)


def test_ddpm_server_skips_micro_batcher(real_api):
    """The micro-batcher is exact only for deterministic samplers: ddpm draws
    ancestral noise from the BATCH's rng, so a merged request's output would
    depend on its batch-mates' seeds. load_model must not build a batcher for
    ddpm even at batch > 1 (model_server gate) — this pins the gate."""
    srv = ModelServer(real_api.server.config_file, real_api.server.environment_file,
                      sampler="ddpm", steps=2, batch=2)
    srv.load_model()
    assert not srv.is_dummy
    assert srv._batcher is None, "ddpm server must not micro-batch requests"


def test_spatial_serving(real_api):
    """--spatial 2: each volume's depth sharded over two devices."""
    srv = ModelServer(real_api.server.config_file, real_api.server.environment_file,
                      sampler="ddim", steps=2, batch=1, spatial=2)
    srv.load_model()
    assert not srv.is_dummy, "spatial pipeline fell back to dummy"
    vol = np.random.default_rng(2).random(srv.patch_size, dtype=np.float32)
    out = srv.generate(1, seed=0, condition_volume=vol)
    assert out["conditioning"] == "provided"
    arr = np.frombuffer(base64.b64decode(out["samples"][0]["data"]), np.float32)
    assert np.isfinite(arr).all() and arr.size == np.prod(srv.patch_size)


def test_micro_batcher_single_requests(real_api):
    """batch > 1 + single-volume requests: concurrent requests share one
    compiled call through the micro-batcher, and results stay deterministic
    per seed (ddim)."""
    import threading

    srv = ModelServer(real_api.server.config_file, real_api.server.environment_file,
                      sampler="ddim", steps=2, batch=2)
    srv.load_model()
    assert not srv.is_dummy and srv._batcher is not None

    solo = srv.generate(1, seed=11)
    arr_solo = np.frombuffer(base64.b64decode(solo["samples"][0]["data"]), np.float32)

    outs = {}

    def client(i, seed):
        outs[i] = srv.generate(1, seed=seed)

    threads = [threading.Thread(target=client, args=(0, 11)),
               threading.Thread(target=client, args=(1, 22))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    arr0 = np.frombuffer(base64.b64decode(outs[0]["samples"][0]["data"]), np.float32)
    assert np.isfinite(arr0).all()
    # seed 11 gives the same volume whether batched with seed 22 or solo
    np.testing.assert_array_equal(arr0, arr_solo)
    assert srv._batcher.samples_run >= 3


def test_dpm_sampler_serving(real_api):
    """--sampler dpm (DPM-Solver++ 2M) works through the serving pipeline."""
    srv = ModelServer(real_api.server.config_file, real_api.server.environment_file,
                      sampler="dpm", steps=4, batch=1)
    srv.load_model()
    assert not srv.is_dummy
    out = srv.generate(1, seed=0)
    arr = np.frombuffer(base64.b64decode(out["samples"][0]["data"]), np.float32)
    assert np.isfinite(arr).all()


def test_per_request_options_reference_schema(real_api):
    """The reference's full GenerationRequest schema round-trips
    (mlops/docker/api_server.py:51-56): inference_steps, guidance_scale,
    output_format — with compiled-sampler caching for repeats."""
    patch = real_api.server.patch_size
    body = {"num_samples": 1, "seed": 5, "inference_steps": 10,
            "guidance_scale": 2.0, "output_format": "base64"}
    code, payload, _ = real_api.dispatch("POST", "/generate", body)
    assert code == 200
    assert payload["inference_steps"] == 10
    assert payload["guidance_scale"] == 2.0
    assert payload["output_format"] == "base64"
    arr = np.frombuffer(base64.b64decode(payload["samples"][0]["data"]), np.float32)
    assert np.isfinite(arr).all() and arr.size == np.prod(patch)

    # repeat hits the compiled-sampler cache (no new compile entry)
    n_variants = len(real_api.server._sampler_cache)
    code, payload2, _ = real_api.dispatch("POST", "/generate", body)
    assert code == 200
    assert len(real_api.server._sampler_cache) == n_variants

    # deterministic per seed even through the custom-variant path
    assert payload2["samples"][0]["data"] == payload["samples"][0]["data"]


def test_per_request_nii_output(real_api, tmp_path):
    """output_format='nii' returns a complete NIfTI-1 file (base64) that
    round-trips through the framework's reader."""
    from ldm3d_tpu.utils.nifti import read_nifti

    code, payload, _ = real_api.dispatch(
        "POST", "/generate", {"num_samples": 1, "seed": 1, "output_format": "nii"})
    assert code == 200
    sample = payload["samples"][0]
    assert sample["format"] == "nii"
    raw = base64.b64decode(sample["data"])
    p = tmp_path / "out.nii"
    p.write_bytes(raw)
    vol, zooms = read_nifti(str(p))
    assert list(vol.shape) == sample["shape"]
    assert np.isfinite(vol).all()
    assert 0.0 <= float(vol.min()) and float(vol.max()) <= 1.0


def test_per_request_validation(real_api):
    code, payload, _ = real_api.dispatch(
        "POST", "/generate", {"num_samples": 1, "inference_steps": 5})
    assert code == 422
    code, payload, _ = real_api.dispatch(
        "POST", "/generate", {"num_samples": 1, "guidance_scale": 50.0})
    assert code == 422
    code, payload, _ = real_api.dispatch(
        "POST", "/generate", {"num_samples": 1, "output_format": "tiff"})
    assert code == 422


def test_per_request_sampler_override(real_api):
    """'sampler' in POST /generate switches the solver per request (beyond
    the reference schema): the variant compiles/caches under its own name,
    the response echoes it, and — when inference_steps is omitted — the
    OVERRIDING sampler's default step count applies, not the server
    sampler's."""
    srv = real_api.server
    code, payload, _ = real_api.dispatch(
        "POST", "/generate", {"num_samples": 1, "seed": 3, "sampler": "dpm"})
    assert code == 200
    assert payload["sampler"] == "dpm"
    # dpm's own default on the tiny 16-timestep schedule = min(50, 16)
    assert payload["inference_steps"] == 16
    assert ("dpm", 16, 1.0, None) in srv._sampler_cache
    arr = np.frombuffer(base64.b64decode(payload["samples"][0]["data"]), np.float32)
    assert np.isfinite(arr).all()

    # unknown sampler is the client's error
    code, payload, _ = real_api.dispatch(
        "POST", "/generate", {"num_samples": 1, "sampler": "plms"})
    assert code == 422
    assert "sampler" in payload["error"]


def test_stdlib_http_roundtrip(api):
    """Real HTTP round-trips through the stdlib frontend (the path minimal
    images run): health, generate, metrics exposition, 404, bad JSON."""
    import http.client
    import threading

    from ldm3d_tpu.serving.api_server import make_stdlib_server

    httpd = make_stdlib_server(api, "127.0.0.1", 0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        def request(method, path, body=None):
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
            headers = {"Content-Type": "application/json"} if body else {}
            conn.request(method, path, body=body, headers=headers)
            resp = conn.getresponse()
            data = resp.read()
            ctype = resp.getheader("Content-Type") or ""
            conn.close()
            return resp.status, ctype, data

        code, ctype, data = request("GET", "/health")
        assert code == 200 and "json" in ctype
        assert json.loads(data)["model_loaded"] is True

        code, ctype, data = request("POST", "/generate",
                                    json.dumps({"num_samples": 1, "seed": 3}))
        assert code == 200
        payload = json.loads(data)
        assert len(payload["samples"]) == 1
        arr = np.frombuffer(base64.b64decode(payload["samples"][0]["data"]), np.float32)
        assert arr.size == np.prod(payload["samples"][0]["shape"])

        code, ctype, data = request("GET", "/metrics")
        assert code == 200 and ctype.startswith("text/plain")
        assert b"api_requests_total" in data

        code, _, _ = request("GET", "/nonexistent")
        assert code == 404

        code, _, data = request("POST", "/generate", "{not json")
        assert code == 400
        assert b"invalid JSON" in data
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_decode_chunk_auto(monkeypatch):
    """'auto' picks the readback regime: whole batch (0) on fast links,
    chunk 1 on slow ones; ints pass through; junk rejected at construction."""
    import logging

    from ldm3d_tpu.cli import common as cli_common
    from ldm3d_tpu.cli.common import resolve_decode_chunk

    monkeypatch.setattr(cli_common, "probe_readback_gbps", lambda *a: 8.0)
    assert resolve_decode_chunk("auto", logging.getLogger(__name__)) == 0
    monkeypatch.setattr(cli_common, "probe_readback_gbps", lambda *a: 0.07)
    assert resolve_decode_chunk("auto") == 1
    assert resolve_decode_chunk(3) == 3
    assert resolve_decode_chunk("0") == 0
    assert resolve_decode_chunk(-2) == 0

    with pytest.raises(ValueError, match="auto"):
        ModelServer(None, None, decode_chunk="whole")
    srv = ModelServer(None, None, decode_chunk="auto")
    assert srv.decode_chunk == "auto"  # resolved at load, against the backend


def test_stdlib_cors_and_gzip(api):
    """Middleware parity with the reference's CORSMiddleware +
    GZipMiddleware(minimum_size=1000) (ref api_server.py:250-258): preflight,
    allow-origin on responses, gzip for large bodies when accepted, no gzip
    below the threshold, and origin filtering when a list is configured."""
    import gzip
    import http.client
    import threading

    from ldm3d_tpu.serving.api_server import GZIP_MIN_SIZE, make_stdlib_server

    assert GZIP_MIN_SIZE == 1000  # the reference's minimum_size

    def request(port, method, path, body=None, headers=None):
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        h = dict(headers or {})
        if body:
            h.setdefault("Content-Type", "application/json")
        conn.request(method, path, body=body, headers=h)
        resp = conn.getresponse()
        data = resp.read()
        hdrs = {k.lower(): v for k, v in resp.getheaders()}
        conn.close()
        return resp.status, hdrs, data

    httpd = make_stdlib_server(api, "127.0.0.1", 0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        # preflight: OPTIONS with Origin + requested method/headers
        code, hdrs, _ = request(port, "OPTIONS", "/generate", headers={
            "Origin": "http://dash.example", "Access-Control-Request-Method": "POST",
            "Access-Control-Request-Headers": "content-type"})
        assert code == 204
        assert hdrs["access-control-allow-origin"] == "http://dash.example"
        assert "POST" in hdrs["access-control-allow-methods"]
        assert hdrs["access-control-allow-headers"] == "content-type"

        # cross-origin GET carries allow-origin (echoed, credentials allowed)
        code, hdrs, _ = request(port, "GET", "/health",
                                headers={"Origin": "http://dash.example"})
        assert code == 200
        assert hdrs["access-control-allow-origin"] == "http://dash.example"
        assert hdrs["access-control-allow-credentials"] == "true"

        # a base64 volume body (>= 1000 bytes) gzips when the client accepts
        code, hdrs, data = request(
            port, "POST", "/generate", json.dumps({"num_samples": 1, "seed": 3}),
            headers={"Accept-Encoding": "gzip"})
        assert code == 200
        assert hdrs.get("content-encoding") == "gzip"
        assert int(hdrs["content-length"]) == len(data)
        payload = json.loads(gzip.decompress(data))
        assert len(payload["samples"]) == 1

        # small bodies stay identity even when gzip is accepted
        code, hdrs, data = request(port, "GET", "/health",
                                   headers={"Accept-Encoding": "gzip"})
        assert code == 200 and "content-encoding" not in hdrs
        json.loads(data)

        # no Accept-Encoding -> identity regardless of size
        code, hdrs, data = request(
            port, "POST", "/generate", json.dumps({"num_samples": 1, "seed": 3}))
        assert code == 200 and "content-encoding" not in hdrs
        json.loads(data)
    finally:
        httpd.shutdown()
        httpd.server_close()

    # a configured origin list filters: allowed origin echoes, others get none
    httpd = make_stdlib_server(api, "127.0.0.1", 0,
                               cors_origins=("http://ok.example",))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        code, hdrs, _ = request(port, "GET", "/health",
                                headers={"Origin": "http://ok.example"})
        assert hdrs["access-control-allow-origin"] == "http://ok.example"
        code, hdrs, _ = request(port, "GET", "/health",
                                headers={"Origin": "http://evil.example"})
        assert "access-control-allow-origin" not in hdrs
        code, hdrs, _ = request(port, "OPTIONS", "/generate", headers={
            "Origin": "http://evil.example",
            "Access-Control-Request-Method": "POST"})
        assert code == 204 and "access-control-allow-origin" not in hdrs
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_stdlib_server_sigterm_drains(tmp_path):
    """SIGTERM must drain the stdlib server: the process finishes IN-FLIGHT
    requests (handler threads are daemons, so this needs the explicit drain
    wait), closes the socket, and exits 0 (K8s pod shutdown path)."""
    import http.client
    import os as _os
    import signal as _signal
    import subprocess
    import sys
    import threading
    import time as _time

    script = tmp_path / "srv.py"
    script.write_text(
        "import os\n"
        "os.environ['JAX_PLATFORMS'] = 'cpu'\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from ldm3d_tpu.serving.api_server import Api, serve_stdlib\n"
        "from ldm3d_tpu.serving.model_server import ModelServer\n"
        "s = ModelServer(None, None)\n"
        "s.load_model()\n"
        "import time as _t\n"
        "_orig = s.generate\n"
        "def _slow(*a, **k):\n"
        "    _t.sleep(2.0)  # hold a request in flight across the SIGTERM\n"
        "    return _orig(*a, **k)\n"
        "s.generate = _slow\n"
        "import socket\n"
        "sock = socket.socket(); sock.bind(('127.0.0.1', 0))\n"
        "port = sock.getsockname()[1]; sock.close()\n"
        "print(f'PORT={port}', flush=True)\n"
        "serve_stdlib(Api(s), '127.0.0.1', port)\n"
        "print('CLEAN-EXIT', flush=True)\n")
    repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    proc = subprocess.Popen([sys.executable, str(script)], stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True,
                            env=dict(_os.environ, PYTHONPATH=repo), cwd=repo)
    try:
        port = None
        deadline = _time.time() + 120
        while _time.time() < deadline:
            line = proc.stdout.readline()
            if line.startswith("PORT="):
                port = int(line.strip().split("=")[1])
                break
        assert port, "server never reported its port"
        # wait until it serves
        for _ in range(100):
            try:
                conn = http.client.HTTPConnection("127.0.0.1", port, timeout=5)
                conn.request("GET", "/health")
                assert conn.getresponse().status == 200
                conn.close()
                break
            except OSError:
                _time.sleep(0.2)
        else:
            raise AssertionError("server never became reachable")
        # launch a slow (2 s) request, then SIGTERM while it is in flight:
        # the drain must let it finish and the client must get its 200
        inflight = {}

        def slow_client():
            c = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
            c.request("POST", "/generate", '{"num_samples": 1, "seed": 0}',
                      {"Content-Type": "application/json"})
            r = c.getresponse()
            inflight["status"] = r.status
            inflight["body"] = r.read()
            c.close()

        t = threading.Thread(target=slow_client)
        t.start()
        _time.sleep(0.7)  # let the request reach the slow generate()
        proc.send_signal(_signal.SIGTERM)
        out, _ = proc.communicate(timeout=60)
        t.join(30)
        assert proc.returncode == 0, out[-2000:]
        assert "CLEAN-EXIT" in out
        assert inflight.get("status") == 200, "in-flight request was killed by shutdown"
    finally:
        if proc.poll() is None:
            proc.kill()


def test_response_schema_reference_fields(api):
    """The reference GenerationResponse fields all round-trip
    (mlops/docker/api_server.py:64-73): status, request_id, num_samples,
    inference_steps, guidance_scale, output_format, processing_time_ms."""
    code, payload, _ = api.dispatch("POST", "/generate", {"num_samples": 2, "seed": 0})
    assert code == 200
    for field in ("status", "request_id", "num_samples", "inference_steps",
                  "guidance_scale", "output_format", "processing_time_ms", "samples"):
        assert field in payload, field
    assert payload["status"] == "success"
    assert len(payload["request_id"]) == 32
    assert payload["num_samples"] == 2


# -- sampler-variant cache concurrency (unit-level, fake build_run) -----------

def _bare_server(build_run, sampler="ddim", steps=4):
    """ModelServer with a fake compile fn injected; skips load_model."""
    s = ModelServer(None, None, sampler=sampler, steps=steps)
    s._build_run = build_run
    return s


def test_variant_compile_does_not_block_cache_hits():
    """A slow variant compile must not stall requests whose program is
    already cached (the compile runs outside the cache lock)."""
    import threading
    import time

    gate = threading.Event()

    def build(name, steps, guidance, spacing=None):
        if steps == 99:
            assert gate.wait(timeout=10)
        return ("prog", name, steps, guidance)

    s = _bare_server(build)
    fast = s._get_run("ddim", 4, 1.0)

    slow_result = {}
    t = threading.Thread(target=lambda: slow_result.setdefault(
        "fn", s._get_run("ddim", 99, 1.0)))
    t.start()
    time.sleep(0.05)  # slow compile is now in flight
    t0 = time.perf_counter()
    assert s._get_run("ddim", 4, 1.0) is fast
    assert time.perf_counter() - t0 < 1.0, "cache hit blocked behind a compile"
    gate.set()
    t.join(10)
    assert slow_result["fn"] == ("prog", "ddim", 99, 1.0)


def test_variant_duplicate_requests_compile_once():
    import threading

    calls = []
    started = threading.Event()
    gate = threading.Event()

    def build(name, steps, guidance, spacing=None):
        calls.append(steps)
        started.set()
        assert gate.wait(timeout=10)
        return ("prog", steps)

    s = _bare_server(build)
    results = []
    threads = [threading.Thread(target=lambda: results.append(s._get_run("ddim", 7, 1.0)))
               for _ in range(4)]
    for t in threads:
        t.start()
    assert started.wait(timeout=10)
    gate.set()
    for t in threads:
        t.join(10)
    assert calls == [7], "duplicate concurrent requests must share one compile"
    assert results == [("prog", 7)] * 4


def test_variant_compile_failure_propagates_and_retries():
    import threading

    attempts = []
    fail_gate = threading.Event()

    def build(name, steps, guidance, spacing=None):
        attempts.append(steps)
        if len(attempts) == 1:
            assert fail_gate.wait(timeout=10)
            raise ValueError("compile exploded")
        return ("prog", steps)

    s = _bare_server(build)
    errors = []
    waiter_done = threading.Event()

    def owner():
        try:
            s._get_run("ddim", 11, 1.0)
        except ValueError as e:
            errors.append(("owner", e))

    def waiter():
        try:
            s._get_run("ddim", 11, 1.0)
        except RuntimeError as e:
            errors.append(("waiter", e))
        waiter_done.set()

    t1 = threading.Thread(target=owner)
    t1.start()
    import time
    time.sleep(0.05)
    t2 = threading.Thread(target=waiter)
    t2.start()
    time.sleep(0.05)
    fail_gate.set()
    t1.join(10)
    assert waiter_done.wait(timeout=10)
    kinds = sorted(k for k, _ in errors)
    # the waiter may instead have become the retry owner (entry was removed
    # before it checked) — then it succeeds; both outcomes are correct
    assert "owner" in kinds
    # a failed compile never poisons the cache: the next call retries
    assert s._get_run("ddim", 11, 1.0) == ("prog", 11)
    assert len(attempts) >= 2


def test_variant_cache_evicts_lru_keeps_default():
    s = _bare_server(lambda name, steps, guidance, spacing=None: ("prog", steps))
    s._sampler_cache_max = 3
    default = s._get_run("ddim", 4, 1.0)   # the server-default variant
    s._get_run("ddim", 10, 1.0)
    s._get_run("ddim", 20, 1.0)            # cache now full (3 entries)
    s._get_run("ddim", 10, 1.0)            # refresh 10 -> 20 is now LRU
    s._get_run("ddim", 30, 1.0)            # evicts 20, never the default
    keys = {k[1] for k in s._sampler_cache}
    assert keys == {4, 10, 30}
    assert s._get_run("ddim", 4, 1.0) is default


def test_variant_cache_bound_restored_after_inflight_publishes():
    """When the cache fills with in-flight placeholders, insertion can't
    evict (placeholders are never victims) — the bound is re-enforced as
    each compile publishes."""
    import threading
    import time as _time

    gates: dict = {}

    def build(name, steps, guidance, spacing=None):
        ev = gates[steps]
        assert ev.wait(10)
        return ("prog", steps)

    s = _bare_server(build)
    s._sampler_cache_max = 2
    gates[4] = threading.Event()
    gates[4].set()
    s._get_run("ddim", 4, 1.0)  # the pinned server-default entry

    threads = []
    for n in (10, 20, 30):
        gates[n] = threading.Event()
        t = threading.Thread(target=lambda n=n: s._get_run("ddim", n, 1.0))
        t.start()
        threads.append(t)
    for _ in range(100):  # all three placeholders inserted (transient overflow)
        if len(s._sampler_cache) == 4:
            break
        _time.sleep(0.05)
    assert len(s._sampler_cache) == 4
    for n in (10, 20, 30):
        gates[n].set()
    for t in threads:
        t.join(10)
    assert len(s._sampler_cache) <= s._sampler_cache_max
    assert ("ddim", 4, 1.0, None) in s._sampler_cache  # default never evicted


def test_per_request_steps_on_ddpm_server(real_api):
    """A ddpm server defaults to the FULL schedule (reference parity) and
    honors per-request inference_steps by subsampling the schedule
    (MONAI DDPMScheduler.set_timesteps semantics) — never silently running
    a different step count than the response reports."""
    srv = ModelServer(real_api.server.config_file, real_api.server.environment_file,
                      sampler="ddpm", steps=None, batch=1)
    srv.load_model()
    assert not srv.is_dummy
    # tiny config trains 16 timesteps -> ddpm default = full 16-step loop
    assert srv.steps == 16

    out = srv.generate(1, seed=0, inference_steps=8)
    assert out["inference_steps"] == 8
    arr = np.frombuffer(base64.b64decode(out["samples"][0]["data"]), np.float32)
    assert np.isfinite(arr).all()
    # the 8-step variant is genuinely strided: cached separately from default
    assert ("ddpm", 8, 1.0, None) in srv._sampler_cache

    # steps beyond the training schedule are rejected, not silently clamped
    with pytest.raises(ValueError, match="num_inference_steps"):
        srv.generate(1, seed=0, inference_steps=17)


def test_health_check_exit_code_contract(api, tmp_path):
    """Container health check (Docker HEALTHCHECK / K8s probe command,
    reference mlops/docker/health_check.py:53-96 parity): exit 0 against a
    healthy live server, exit 1 on unreachable API or missing model files;
    --skip-device marks the device check skipped-ok (the API server process
    holds the TPU exclusively, so the probe must not grab it)."""
    import threading

    from ldm3d_tpu.serving.api_server import make_stdlib_server
    from ldm3d_tpu.serving.health_check import main as health_main

    httpd = make_stdlib_server(api, "127.0.0.1", 0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        rc = health_main(["--skip-device", "--api-url", f"http://127.0.0.1:{port}"])
        assert rc == 0
        # unreachable API -> unhealthy
        rc = health_main(["--skip-device", "--api-url", "http://127.0.0.1:9"])
        assert rc == 1
        # missing model artifacts -> unhealthy
        rc = health_main(["--skip-device", "--model-dir", str(tmp_path / "nope")])
        assert rc == 1
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_reload_excludes_inflight_generate(monkeypatch):
    """POST /model/reload must not swap the pipeline under an in-flight
    /generate: the reload blocks until the request drains, and requests
    arriving behind a waiting reload queue after it (writer-preferring)."""
    import threading
    import time as _time

    from ldm3d_tpu.serving import model_server as ms

    server = ModelServer(None, None)
    server.load_model()
    assert server.is_dummy

    entered = threading.Event()
    release = threading.Event()
    real_sleep = _time.sleep  # ms.time IS the time module: keep the real one

    def slow_sleep(_t):  # the dummy generate's latency shim, made controllable
        entered.set()
        assert release.wait(10), "test deadlock: release never set"

    monkeypatch.setattr(ms.time, "sleep", slow_sleep)
    order: list[str] = []
    result = {}

    def gen():
        result["resp"] = server.generate(num_samples=1, seed=0)
        order.append("generate")

    def reload():
        server.load_model()
        order.append("reload")

    t_gen = threading.Thread(target=gen)
    t_gen.start()
    assert entered.wait(10)
    t_reload = threading.Thread(target=reload)
    t_reload.start()
    # the reload must be parked behind the in-flight generate
    deadline = _time.monotonic() + 2.0
    while _time.monotonic() < deadline and not server._reload_gate._writers_waiting:
        real_sleep(0.01)
    assert t_reload.is_alive()
    assert server._reload_gate._writers_waiting == 1
    # a second request arriving now queues BEHIND the waiting reload
    late = {}
    t_late = threading.Thread(target=lambda: late.update(
        resp=server.generate(num_samples=1, seed=1)))
    t_late.start()
    real_sleep(0.05)
    assert "resp" not in late  # parked: reload has priority
    release.set()
    t_gen.join(10); t_reload.join(10); t_late.join(10)
    assert not (t_gen.is_alive() or t_reload.is_alive() or t_late.is_alive())
    assert order[0] == "generate" and "reload" in order
    assert result["resp"]["status"] == "success"
    assert late["resp"]["status"] == "success"


def test_per_request_timestep_spacing(real_api):
    """'timestep_spacing' in POST /generate switches the sampling grid per
    request: karras caches its own compiled variant (keyed separately from
    the same sampler/steps on the default spacing), the response echoes it,
    ddpm+karras and unknown values are the client's error, and a step count
    the discrete schedule cannot keep distinct rejects cleanly."""
    srv = real_api.server
    out = srv.generate(1, seed=4, sampler="dpm", inference_steps=6,
                       timestep_spacing="karras")
    assert out["timestep_spacing"] == "karras"
    assert ("dpm", 6, 1.0, "karras") in srv._sampler_cache
    arr = np.frombuffer(base64.b64decode(out["samples"][0]["data"]), np.float32)
    assert np.isfinite(arr).all()
    # same sampler/steps WITHOUT the spacing override is a different program,
    # and the response echoes the APPLIED (server-default) spacing
    out2 = srv.generate(1, seed=4, sampler="dpm", inference_steps=6)
    assert ("dpm", 6, 1.0, None) in srv._sampler_cache
    assert out2["timestep_spacing"] == "leading"
    # explicitly requesting the server's own default spacing must NOT compile
    # a separate byte-identical variant
    n = len(srv._sampler_cache)
    out3 = srv.generate(1, seed=4, sampler="dpm", inference_steps=6,
                        timestep_spacing="leading")
    assert len(srv._sampler_cache) == n
    assert out3["timestep_spacing"] == "leading"
    assert out3["samples"][0]["data"] == out2["samples"][0]["data"]

    code, payload, _ = real_api.dispatch(
        "POST", "/generate", {"num_samples": 1, "timestep_spacing": "fibonacci"})
    assert code == 422 and "timestep_spacing" in payload["error"]
    code, payload, _ = real_api.dispatch(
        "POST", "/generate", {"num_samples": 1, "sampler": "ddpm",
                              "timestep_spacing": "karras"})
    assert code == 422 and "ddpm" in payload["error"]
    # 10 karras steps cannot stay distinct on the tiny 16-step schedule:
    # the grid builder's ValueError surfaces as the client's 422
    code, payload, _ = real_api.dispatch(
        "POST", "/generate", {"num_samples": 1, "sampler": "dpm",
                              "inference_steps": 10, "timestep_spacing": "karras"})
    assert code == 422 and "karras" in payload["error"]


def test_server_default_timestep_spacing(real_api):
    """--timestep-spacing at server start sets the default grid for every
    request (echoed as the applied value); per-request values still override,
    and explicitly requesting the server default reuses the default program.
    One server load shared with the ddpm-on-karras-default checks below."""
    srv = ModelServer(real_api.server.config_file, real_api.server.environment_file,
                      sampler="dpm", steps=6, batch=1, timestep_spacing="karras")
    srv.load_model()
    assert not srv.is_dummy
    out = srv.generate(1, seed=0)
    assert out["timestep_spacing"] == "karras"
    n = len(srv._sampler_cache)
    out_same = srv.generate(1, seed=0, timestep_spacing="karras")
    assert len(srv._sampler_cache) == n  # normalized onto the default program
    assert out_same["samples"][0]["data"] == out["samples"][0]["data"]
    out2 = srv.generate(1, seed=0, timestep_spacing="trailing")
    assert out2["timestep_spacing"] == "trailing"
    assert out2["samples"][0]["data"] != out["samples"][0]["data"]
    with pytest.raises(ValueError, match="timestep_spacing"):
        ModelServer(None, None, timestep_spacing="quadratic")

    # a plain sampler=ddpm request on this karras-default server fails fast
    # with an ACTIONABLE message (the server default, not the client, chose
    # karras); an explicit compatible spacing makes ddpm usable
    with pytest.raises(ValueError, match="default spacing is karras"):
        srv.generate(1, seed=0, sampler="ddpm")
    out3 = srv.generate(1, seed=0, sampler="ddpm", timestep_spacing="leading")
    assert out3["sampler"] == "ddpm" and out3["timestep_spacing"] == "leading"


def test_config_errors_fail_loudly_not_dummy(real_api):
    """User-config errors must crash the server, not silently degrade to the
    dummy model that reports healthy and serves random noise: statically
    invalid combinations fail at construction; config-dependent ones (a
    karras default too dense for the schedule) fail at load_model. Missing
    artifacts (the reference's infra-test affordance) still fall back."""
    with pytest.raises(ValueError, match="ddpm"):
        ModelServer(None, None, sampler="ddpm", timestep_spacing="karras")
    # tiny config trains 16 timesteps: a 10-step karras grid has duplicates
    srv = ModelServer(real_api.server.config_file, real_api.server.environment_file,
                      sampler="dpm", steps=10, batch=1, timestep_spacing="karras")
    with pytest.raises(ValueError, match="karras"):
        srv.load_model()
    assert not srv.model_loaded
    # missing artifacts keep the dummy fallback
    dummy = ModelServer(None, None)
    dummy.load_model()
    assert dummy.is_dummy



def test_variant_cache_soak_bounds_memory(real_api):
    """Endurance under the memory regime that killed the round-3 bench
    (round-3 verdict item 8): drive the micro-batched server through many
    generate cycles with varying request shapes and prove the compiled-
    variant cache + LRU eviction bound device memory.

    Phase A touches more (sampler, steps) variants than ``_sampler_cache_max``
    — the cache must stay bounded and every variant must still serve. Phase B
    loops a fixed recurring variant set and asserts NO growth in live device
    buffers (the CPU backend's jax.live_arrays is the same accounting the TPU
    allocator sees) and bounded host RSS between the mid-point and the end.
    """
    import gc

    import jax
    import psutil

    srv = ModelServer(real_api.server.config_file, real_api.server.environment_file,
                      sampler="ddim", steps=2, batch=2)
    srv.load_model()
    assert not srv.is_dummy and srv._batcher is not None
    cache_max = srv._sampler_cache_max

    def one(sampler, steps, seed):
        out = srv.generate(1, seed=seed, sampler=sampler, inference_steps=steps)
        arr = np.frombuffer(base64.b64decode(out["samples"][0]["data"]), np.float32)
        assert np.isfinite(arr).all()

    # --- phase A: more distinct variants than the cache holds --------------
    variants = [("ddim", s) for s in (2, 3, 4, 5, 6)] + \
               [("dpm", s) for s in (2, 3, 4, 5, 6)]
    assert len(variants) > cache_max
    for i, (sampler, steps) in enumerate(variants):
        one(sampler, steps, seed=i)
        assert len(srv._sampler_cache) <= cache_max, \
            f"variant cache unbounded: {len(srv._sampler_cache)}"

    # --- phase B: steady-state soak over recurring variants ----------------
    recurring = [("ddim", 2), ("dpm", 3), ("ddim", 4)]
    for sampler, steps in recurring:  # ensure all compiled before baselining
        one(sampler, steps, seed=100)

    def snapshot():
        gc.collect()
        return len(jax.live_arrays()), psutil.Process().memory_info().rss

    cycles = 12
    mid = cycles // 2
    live_mid = rss_mid = None
    for c in range(cycles):
        for j, (sampler, steps) in enumerate(recurring):
            one(sampler, steps, seed=1000 + c * 10 + j)
        if c == mid - 1:
            live_mid, rss_mid = snapshot()
    live_end, rss_end = snapshot()

    assert live_end <= live_mid, \
        f"live device buffers grew during soak: {live_mid} -> {live_end}"
    assert len(srv._sampler_cache) <= cache_max
    # host RSS: small allocator jitter is fine; a leak of compiled programs
    # or latents across 6 cycles x 3 variants would be tens of MB
    assert rss_end - rss_mid < 64 * 2**20, \
        f"RSS grew {rss_end - rss_mid} bytes over steady-state soak"
