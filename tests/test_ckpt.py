"""Checkpoint tests: best/last roundtrip with full train state + meta."""

import jax
import jax.numpy as jnp
import numpy as np

from ldm3d_tpu.ckpt import CheckpointManager, StageArtifacts
from ldm3d_tpu.training import TrainState, build_lr_schedule, make_optimizer


def _make_state():
    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}

    def apply_fn(vars_, x):
        return x @ vars_["params"]["w"] + vars_["params"]["b"]

    tx = make_optimizer(build_lr_schedule(None, 1e-3, 1, 1))
    return TrainState.create(apply_fn, params, tx)


def test_roundtrip_full_state(tmp_path):
    state = _make_state()
    # advance one step so opt_state is non-trivial
    grads = jax.tree.map(jnp.ones_like, state.params)
    state = state.apply_gradients(grads)

    mgr = CheckpointManager(str(tmp_path), StageArtifacts.AUTOENCODER)
    full = {"params": state.params, "opt_state": state.opt_state, "step": state.step}
    mgr.save_best_and_last(full, is_best=True, meta={"epoch": 7, "val_loss": 0.5})

    fresh = _make_state()
    template = {"params": fresh.params, "opt_state": fresh.opt_state, "step": fresh.step}
    restored, ok = mgr.try_restore("last", template)
    assert ok
    assert int(restored["step"]) == 1
    np.testing.assert_allclose(np.asarray(restored["params"]["w"]), np.asarray(state.params["w"]))
    # optimizer moments survive (the reference loses these, SURVEY.md 5.4)
    r_leaves = jax.tree_util.tree_leaves(restored["opt_state"])
    s_leaves = jax.tree_util.tree_leaves(state.opt_state)
    for r, s in zip(r_leaves, s_leaves):
        np.testing.assert_allclose(np.asarray(r), np.asarray(s))
    assert mgr.load_meta("last")["epoch"] == 7


def test_best_is_params_only(tmp_path):
    state = _make_state()
    mgr = CheckpointManager(str(tmp_path), StageArtifacts.DIFFUSION)
    full = {"params": state.params, "opt_state": state.opt_state, "step": state.step}
    mgr.save_best_and_last(full, is_best=True, meta={"scale_factor": 1.25})
    params = mgr.restore_params("best", state.params)
    np.testing.assert_allclose(np.asarray(params["w"]), np.asarray(state.params["w"]))
    assert mgr.load_meta("best")["scale_factor"] == 1.25


def test_try_restore_missing(tmp_path):
    mgr = CheckpointManager(str(tmp_path), "nonexistent")
    template = {"params": {"w": jnp.zeros((2,))}}
    restored, ok = mgr.try_restore("last", template)
    assert not ok
    assert restored is template


def test_cli_resume_continues_epochs(tmp_path):
    """Restart-based recovery (SURVEY.md 5.3/5.4): kill training after epoch 0,
    rerun with resume_ckpt -> continues at epoch 1 with optimizer state and
    epoch counter restored (the reference's .pt resume restarted the
    schedule and lost the optimizer)."""
    import json

    from ldm3d_tpu.ckpt import CheckpointManager, StageArtifacts
    from ldm3d_tpu.cli.train_autoencoder import main as train_ae
    from ldm3d_tpu.cli.train_diffusion import main as train_diff
    from ldm3d_tpu.configs import preset_path

    from scaffolds import write_env_json

    env = tmp_path / "env.json"
    write_env_json(env, tmp_path / "ckpts", tmp_path,
                   synthetic_data=True, synthetic_num=48)
    cfg = preset_path("config_micro_cpu.json")
    argv = ["-c", cfg, "-e", str(env), "--synthetic-data"]

    # stage 1 (needed by stage 2), then stage 2 epoch 0 only
    train_ae(argv + ["--max-epochs", "1"])
    train_diff(argv + ["--max-epochs", "1"])
    mgr = CheckpointManager(str(tmp_path / "ckpts"), StageArtifacts.DIFFUSION)
    assert mgr.load_meta("last")["epoch"] == 0

    # "crash" happened; restart with resume for 2 epochs -> runs only epoch 1
    env.write_text(env.read_text().replace('"resume_ckpt": false', '"resume_ckpt": true'))
    train_diff(argv + ["--max-epochs", "2"])
    meta = mgr.load_meta("last")
    assert meta["epoch"] == 1  # continued, not restarted


def test_async_save_defers_meta_until_commit(tmp_path):
    """block=False schedules the write; the meta sidecar must not appear
    until the checkpoint has committed (wait() / next save), so a crash
    mid-write can't leave meta pointing at a missing checkpoint."""
    import os

    state = _make_state()
    mgr = CheckpointManager(str(tmp_path), StageArtifacts.AUTOENCODER)
    full = {"params": state.params, "opt_state": state.opt_state, "step": state.step}
    mgr.save("last", full, meta={"epoch": 3}, block=False)
    meta_path = os.path.join(mgr.root, "last_meta.json")
    mgr.wait()
    assert os.path.exists(meta_path)
    assert mgr.load_meta("last")["epoch"] == 3
    assert mgr.exists("last")

    # a following save drains + flushes the previous pending meta first
    mgr.save("last", full, meta={"epoch": 4}, block=False)
    mgr.save("best", {"params": state.params}, meta={"epoch": 4})
    assert mgr.load_meta("last")["epoch"] == 4


def test_swap_recovery_interrupted_states(tmp_path):
    """Every crash point of the atomic <role>.new/<role>.old swap heals to a
    complete restorable checkpoint on the next manager construction."""
    import os
    import shutil

    state = _make_state()
    full = {"params": state.params, "opt_state": state.opt_state, "step": state.step}

    # a committed checkpoint to play with
    mgr = CheckpointManager(str(tmp_path), StageArtifacts.AUTOENCODER)
    mgr.save("last", full, meta={"epoch": 1})
    root = mgr.root
    last = os.path.join(root, "last")

    # crash point A: .new committed, swap never started (kill between orbax
    # commit and swap) -> recovery must adopt the NEWER data
    shutil.copytree(last, last + ".new")
    m2 = CheckpointManager(str(tmp_path), StageArtifacts.AUTOENCODER)
    assert m2.exists("last") and not os.path.isdir(last + ".new")
    restored, ok = m2.try_restore("last", full)
    assert ok

    # crash point B: old moved aside, new already promoted, cleanup missed
    shutil.copytree(last, last + ".old")
    m3 = CheckpointManager(str(tmp_path), StageArtifacts.AUTOENCODER)
    assert m3.exists("last") and not os.path.isdir(last + ".old")

    # crash point C: mid-swap — final missing, .old holds the previous data
    os.rename(last, last + ".old")
    m4 = CheckpointManager(str(tmp_path), StageArtifacts.AUTOENCODER)
    assert m4.exists("last") and not os.path.isdir(last + ".old")
    restored, ok = m4.try_restore("last", full)
    assert ok

    # crash point D: final missing, .new committed AND .old present
    os.rename(last, last + ".new")
    shutil.copytree(last + ".new", last + ".old")
    m5 = CheckpointManager(str(tmp_path), StageArtifacts.AUTOENCODER)
    assert m5.exists("last")
    assert not os.path.isdir(last + ".new") and not os.path.isdir(last + ".old")
    _, ok = m5.try_restore("last", full)
    assert ok


def test_save_never_leaves_missing_checkpoint(tmp_path):
    """Unlike save(force=True) straight to the final path, a new save must
    keep the previous checkpoint restorable until the replacement commits:
    after any completed save, the role directory exists and restores."""
    state = _make_state()
    full = {"params": state.params, "opt_state": state.opt_state, "step": state.step}
    mgr = CheckpointManager(str(tmp_path), StageArtifacts.DIFFUSION)
    for epoch in range(3):
        mgr.save("last", full, meta={"epoch": epoch})
        assert mgr.exists("last")
        assert mgr.load_meta("last")["epoch"] == epoch
    _, ok = mgr.try_restore("last", full)
    assert ok

def test_fsdp_sharded_state_roundtrip(tmp_path, eight_devices):
    """An FSDP-sharded train state (params + moments physically 1/N per
    device) must checkpoint and restore exactly: save from the sharded
    state, restore replicated (the CLI resume path), re-shard, and continue
    stepping with values identical to an unsharded run."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ldm3d_tpu.parallel import MeshSpec, create_mesh, shard_train_state_fsdp

    mesh = create_mesh(MeshSpec(data=8), devices=eight_devices)

    def make_state():
        params = {"w": jnp.arange(48 * 64, dtype=jnp.float32).reshape(48, 64) / 100.0,
                  "b": jnp.zeros((64,))}
        tx = make_optimizer(build_lr_schedule(None, 1e-3, 1, 1))
        return TrainState.create(lambda v, x: x @ v["params"]["w"] + v["params"]["b"],
                                 params, tx)

    @jax.jit
    def step(state):
        grads = jax.tree.map(jnp.ones_like, state.params)
        return state.apply_gradients(grads)

    with mesh:
        fs = step(shard_train_state_fsdp(make_state(), mesh))
    # precondition: the state being saved really is sharded
    assert fs.params["w"].addressable_shards[0].data.size == fs.params["w"].size // 8

    mgr = CheckpointManager(str(tmp_path), StageArtifacts.DIFFUSION)
    full = {"params": fs.params, "opt_state": fs.opt_state, "step": fs.step}
    mgr.save_best_and_last(full, is_best=False, meta={"epoch": 1})
    mgr.wait()

    # restore replicated onto the mesh (what the trainers do before re-sharding)
    fresh = make_state()
    template = {"params": fresh.params, "opt_state": fresh.opt_state, "step": fresh.step}
    restored, ok = mgr.try_restore("last", template,
                                   sharding=NamedSharding(mesh, P()))
    assert ok

    ref = step(make_state())  # the same single step, unsharded
    np.testing.assert_allclose(np.asarray(restored["params"]["w"]),
                               np.asarray(ref.params["w"]), atol=1e-7)
    for r, s in zip(jax.tree_util.tree_leaves(restored["opt_state"]),
                    jax.tree_util.tree_leaves(ref.opt_state)):
        np.testing.assert_allclose(np.asarray(r), np.asarray(s), atol=1e-7)

    # resume: re-shard the restored state and take another identical step
    with mesh:
        resumed = step(shard_train_state_fsdp(
            fresh.replace(params=restored["params"], opt_state=restored["opt_state"],
                          step=restored["step"]), mesh))
    ref2 = step(ref)
    np.testing.assert_allclose(np.asarray(resumed.params["w"]),
                               np.asarray(ref2.params["w"]), atol=1e-6)
