"""Fault injection: SIGKILL a trainer mid-run, resume from its last save.

The reference has no fault injection anywhere (SURVEY.md 5.3); its only
recovery story is K8s restart. This test hard-kills (no grace, no SIGTERM
handler) a real training subprocess after its first validation save and
asserts the restarted run resumes from the saved epoch with intact state —
crash-consistency of the orbax best/last layout.
"""

import json
import os
import signal
import subprocess
import sys
import time

import pytest

from ldm3d_tpu.configs import preset_path

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_sigkill_then_resume(tmp_path):
    from scaffolds import write_env_json

    env_file = tmp_path / "env.json"
    write_env_json(env_file, tmp_path / "ckpts", tmp_path,
                   synthetic_data=True, synthetic_num=16)
    cfg = preset_path("config_micro_cpu.json")
    argv = [sys.executable, "-m", "ldm3d_tpu.cli.train_autoencoder",
            "-c", cfg, "-e", str(env_file), "--synthetic-data",
            "--max-epochs", "50", "--no-images"]
    env = dict(os.environ,
               # clear the axon pool var: the sitecustomize re-registers the
               # remote-TPU platform when it is set, and this test SIGKILLs
               # the subprocess mid-run — killing a live tunnel client can
               # wedge the shared device session for every other process
               PALLAS_AXON_POOL_IPS="",
               JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=2",
               JAX_COMPILATION_CACHE_DIR=os.path.join(REPO, ".jax_cache_tests"),
               PYTHONPATH=REPO)
    log_path = tmp_path / "train.log"
    with open(log_path, "w") as log_f:
        proc = subprocess.Popen(argv, stdout=log_f, stderr=subprocess.STDOUT,
                                env=env, cwd=REPO)
        try:
            # wait for the first validation save (epoch 0, val_interval 1)
            deadline = time.time() + 600
            saved = False
            while time.time() < deadline:
                if proc.poll() is not None:
                    pytest.fail(f"trainer exited early:\n{log_path.read_text()[-2000:]}")
                if "saved best checkpoints" in log_path.read_text():
                    saved = True
                    break
                time.sleep(2)
            assert saved, "no checkpoint save within the window"
            time.sleep(1)  # let the epoch advance a little past the save
            proc.send_signal(signal.SIGKILL)  # hard crash: no handler runs
            proc.wait(timeout=30)
        finally:
            if proc.poll() is None:
                proc.kill()

    meta = json.loads((tmp_path / "ckpts" / "autoencoder" / "last_meta.json").read_text())
    crashed_epoch = meta["epoch"]
    assert crashed_epoch >= 0

    # restart with resume for one more epoch than already done
    env_file.write_text(env_file.read_text().replace('"resume_ckpt": false',
                                                     '"resume_ckpt": true'))
    out = subprocess.run(argv[:-3] + ["--max-epochs", str(crashed_epoch + 2), "--no-images"],
                         capture_output=True, text=True, env=env, cwd=REPO, timeout=600)
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert f"resumed autoencoder from epoch {crashed_epoch + 1}" in out.stdout
    meta2 = json.loads((tmp_path / "ckpts" / "autoencoder" / "last_meta.json").read_text())
    assert meta2["epoch"] == crashed_epoch + 1
