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
