"""Preemption-safe training (training/preemption.py).

The reference's only recovery is K8s restart from the last validation-time
checkpoint (SURVEY.md 5.3). Here SIGTERM latches a flag the trainers poll
each step; they save a full resumable 'last' checkpoint and exit cleanly.
"""

import json
import os
import signal

import pytest

import jax.numpy as jnp

from ldm3d_tpu.training.preemption import GracefulShutdown


def test_sigterm_latches_flag():
    stop = GracefulShutdown()
    try:
        assert not stop.requested
        os.kill(os.getpid(), signal.SIGTERM)  # delivered synchronously on the main thread
        assert stop.requested
    finally:
        stop.restore()
    # handler restored: a fresh instance starts clear
    stop2 = GracefulShutdown()
    try:
        assert not stop2.requested
        stop2.trigger()
        assert stop2.requested
    finally:
        stop2.restore()


def test_trainer_preempt_saves_resumable_last(tmp_path, monkeypatch):
    """Stage-1 trainer preempted mid-epoch-0 writes a resumable 'last' with
    meta epoch=-1 and preempted=True; a resumed run replays epoch 0."""
    import ldm3d_tpu.cli.train_autoencoder as ta
    from ldm3d_tpu.ckpt import CheckpointManager, StageArtifacts
    from ldm3d_tpu.configs import preset_path

    class FakeShutdown:
        """Requests shutdown after the third poll (mid-epoch)."""

        def __init__(self, *a, **k):
            self.calls = 0

        @property
        def requested(self):
            self.calls += 1
            return self.calls > 3

        # the trainers poll the cross-host agreement (single-process runs
        # short-circuit to the local flag)
        requested_global = requested

        def restore(self):
            pass

    monkeypatch.setattr(ta, "GracefulShutdown", FakeShutdown)

    from scaffolds import write_env_json

    env = tmp_path / "env.json"
    write_env_json(env, tmp_path / "ckpts", tmp_path,
                   synthetic_data=True, synthetic_num=32)
    cfg = preset_path("config_micro_cpu.json")
    argv = ["-c", cfg, "-e", str(env), "--synthetic-data", "--max-epochs", "2"]
    # exits 75 (EX_TEMPFAIL) so wrappers don't mistake preemption for success
    with pytest.raises(SystemExit) as exc:
        ta.main(argv)
    assert exc.value.code == 75

    mgr = CheckpointManager(str(tmp_path / "ckpts"), StageArtifacts.AUTOENCODER)
    meta = mgr.load_meta("last")
    assert meta["preempted"] is True
    assert meta["epoch"] == -1  # epoch 0 was interrupted -> replay it
    assert mgr.exists("last")  # the full train state (params + opt + step)

    # restart with resume: starts back at epoch 0 and completes
    monkeypatch.setattr(ta, "GracefulShutdown", GracefulShutdown)
    env.write_text(env.read_text().replace('"resume_ckpt": false', '"resume_ckpt": true'))
    best = ta.main(["-c", cfg, "-e", str(env), "--synthetic-data", "--max-epochs", "1"])
    assert jnp.isfinite(best)
    assert mgr.load_meta("last")["epoch"] == 0
    assert mgr.exists("best")
