"""Multi-host (multi-process) distribution tests on CPU.

Launches two real JAX processes (2 virtual devices each → a 4-device global
mesh), the topology the reference could only validate on a live cluster
(SURVEY.md §4: "distributed tests: none"). Verifies per-host data sharding is
disjoint, global-batch assembly from process-local shards, and that reduced
quantities (mean, gradients) agree bitwise across hosts.
"""

import os
import socket
import subprocess
import sys

import numpy as np

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)), "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _parse(out: str) -> dict:
    res = {}
    for line in out.splitlines():
        if line.startswith("RESULT "):
            _, key, *vals = line.split(" ")
            res[key] = " ".join(vals)
    return res


def test_two_process_data_parallel():
    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["PALLAS_AXON_POOL_IPS"] = ""  # keep the remote-TPU plugin out of workers
    procs = [
        subprocess.Popen([sys.executable, WORKER, str(i), "2", str(port)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=570)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}"

    r0, r1 = (_parse(o) for o in outs)
    # 2 local devices per process, 4 global, visible on both
    assert r0["devices"] == r1["devices"] == "2 4"
    # disjoint contiguous dataset shards (DistributedSampler semantics):
    # host0 owns indices 0..3, host1 owns 4..7; first local batches are
    # {0,1} and {4,5}
    ids0, ids1 = eval(r0["local_ids"]), eval(r1["local_ids"])  # noqa: S307 — our own output
    assert not set(ids0) & set(ids1)
    assert set(ids0) | set(ids1) == {0.0, 1.0, 4.0, 5.0}
    # global reductions agree across hosts and equal the closed form:
    # mean over the assembled global batch {0,1,4,5} = 2.5
    assert r0["global_mean"] == r1["global_mean"]
    assert abs(float(r0["global_mean"]) - 2.5) < 1e-6
    # gradients identical on every host (the DDP invariant)
    g0 = np.array(r0["grad"].split(), dtype=np.float64)
    g1 = np.array(r1["grad"].split(), dtype=np.float64)
    np.testing.assert_array_equal(g0, g1)
