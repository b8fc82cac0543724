"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is how the framework tests multi-chip semantics without TPU hardware
(the reference never tested distribution at all — SURVEY.md section 4). Env
vars must be set before jax initializes, hence the import-time assignment.
"""

import os
import sys

# Force CPU: the session environment registers a remote-TPU PJRT plugin at
# interpreter startup (sitecustomize) and pins the platform to it, which would
# make every tiny test compile over the tunnel. The config update below is the
# only override that wins once the plugin has registered.
os.environ["JAX_PLATFORMS"] = "cpu"
import re as _re

# force the count even when the environment inherited a DIFFERENT one (e.g.
# another project's XLA_FLAGS): tests assume the 8-device mesh, and a stale
# 4 would fail them obscurely instead of here
flags = _re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                os.environ.get("XLA_FLAGS", ""))
os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: the suite is compile-dominated (3-D models on a
# virtual 8-device mesh); cached XLA:CPU executables cut a cold ~50 min run
# to minutes on re-runs. Per-machine, gitignored. If an XLA upgrade ever
# makes stale entries misbehave, delete the directory.
_cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      ".jax_cache_tests")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 virtual devices, got {len(devs)}"
    return devs
