"""Gradient accumulation: k micro-steps on b == 1 macro-step on k*b."""

import jax
import jax.numpy as jnp
import numpy as np

from ldm3d_tpu.nn import AutoencoderKL, PatchDiscriminator3D
from ldm3d_tpu.training import (
    Stage1Config,
    TrainState,
    build_lr_schedule,
    make_optimizer,
    make_stage1_train_step,
)


def test_accumulated_equals_large_batch():
    ae = AutoencoderKL(in_channels=1, out_channels=1, latent_channels=2,
                       channels=(4, 4, 8), num_res_blocks=(1, 1, 1),
                       attention_levels=(False, False, False), norm_num_groups=2)
    disc = PatchDiscriminator3D(num_layers_d=2, channels=4)
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (4, 16, 16, 16, 1))
    g_vars = ae.init({"params": rng, "sample": rng}, x)
    d_vars = disc.init(rng, x)
    cfg = Stage1Config(perceptual_weight=0.0, kl_weight=0.0)
    sched = build_lr_schedule(None, 1e-3, 1, 1)

    step = make_stage1_train_step(ae, disc, None, cfg)
    clone = lambda tree: jax.tree.map(jnp.copy, tree)
    init_params = g_vars["params"]

    # one step on the full batch (train steps donate their state buffers)
    g_full = TrainState.create(ae.apply, clone(init_params), make_optimizer(sched))
    d_full = TrainState.create(disc.apply, clone(d_vars["params"]), make_optimizer(sched))
    g_full, _, _ = step(g_full, d_full, x, jax.random.PRNGKey(1), adv_active=False)

    # two accumulated micro-steps on the halves; same rng per micro-step pair
    # won't match exactly (fresh VAE sampling noise per micro batch), so use
    # the same key for both paths' sampling by slicing deterministic halves.
    g_acc = TrainState.create(ae.apply, clone(init_params), make_optimizer(sched, grad_accum=2))
    d_acc = TrainState.create(disc.apply, clone(d_vars["params"]), make_optimizer(sched, grad_accum=2))
    for half in (x[:2], x[2:]):
        g_acc, d_acc, _ = step(g_acc, d_acc, half, jax.random.PRNGKey(1), adv_active=False)

    # parameters moved in both cases and stayed finite; exact equality is not
    # expected (per-micro-batch sampling noise), but magnitudes must agree.
    w_full = jax.tree_util.tree_leaves(g_full.params)[0]
    w_acc = jax.tree_util.tree_leaves(g_acc.params)[0]
    w_init = jax.tree_util.tree_leaves(g_vars["params"])[0]
    assert not np.allclose(np.asarray(w_acc), np.asarray(w_init))
    delta_full = float(jnp.abs(w_full - w_init).mean())
    delta_acc = float(jnp.abs(w_acc - w_init).mean())
    assert 0.2 < delta_acc / delta_full < 5.0


def test_multisteps_updates_only_every_k():
    params = {"w": jnp.ones((3,))}
    tx = make_optimizer(build_lr_schedule(None, 1e-2, 1, 1), grad_accum=3)
    state = TrainState.create(lambda v, x: x, params, tx)
    g = {"w": jnp.ones((3,))}
    p0 = state.params["w"]
    state = state.apply_gradients(g)
    np.testing.assert_allclose(np.asarray(state.params["w"]), np.asarray(p0))  # no update yet
    state = state.apply_gradients(g)
    np.testing.assert_allclose(np.asarray(state.params["w"]), np.asarray(p0))
    state = state.apply_gradients(g)
    assert not np.allclose(np.asarray(state.params["w"]), np.asarray(p0))  # k-th step applies


def test_multisteps_applies_the_average_gradient():
    """Direction-sensitive accumulation check: after k micro-grads, the
    applied update must equal ONE plain-optimizer step on their MEAN.
    (Adam is scale-invariant, so the model-level delta-ratio test above
    cannot distinguish sum vs average vs last-micro-batch-only — this can:
    g1 and g2 point in different directions, so any wrong combination
    changes the update direction, not just its scale.)"""
    import optax

    sched = build_lr_schedule(None, 1e-3, 1, 1)
    params = {"w": jnp.array([1.0, -2.0, 3.0])}
    g1 = {"w": jnp.array([1.0, 0.0, -4.0])}
    g2 = {"w": jnp.array([0.0, 2.0, 8.0])}
    g_mean = jax.tree.map(lambda a, b: (a + b) / 2.0, g1, g2)

    acc = TrainState.create(lambda v, x: x, dict(params), make_optimizer(sched, grad_accum=2))
    acc = acc.apply_gradients(g1)
    acc = acc.apply_gradients(g2)

    plain = TrainState.create(lambda v, x: x, dict(params), make_optimizer(sched))
    plain = plain.apply_gradients(g_mean)

    np.testing.assert_allclose(np.asarray(acc.params["w"]),
                               np.asarray(plain.params["w"]), rtol=1e-6, atol=1e-7)


def test_accum_schedule_reindexes_to_micro_steps():
    """Inside optax.MultiSteps the wrapped optimizer's count advances once
    per EMITTED update, but lr schedules are built over LOADER micro-steps —
    without re-indexing every warm-up/milestone ran grad_accum-times too
    slow (found in review). _accum_schedule multiplies the inner count back
    to micro-step units."""
    from ldm3d_tpu.training.stage1 import _accum_schedule

    sched = lambda c: 0.1 * c  # noqa: E731
    assert float(_accum_schedule(sched, 4)(10)) == float(sched(40))
    assert _accum_schedule(sched, 1) is sched
    assert _accum_schedule(0.5, 4) == 0.5  # constant lr passes through


def test_ema_updates_once_per_emitted_step():
    """Under MultiSteps(k), params change only on the k-th micro-step; the
    EMA must decay exactly once per emitted update (ema_every=k), not k
    times (which silently shortened the averaging horizon to decay^k —
    found in review)."""
    import optax

    d = 0.5
    params = {"w": jnp.ones((4,))}
    tx = optax.MultiSteps(optax.sgd(0.1), every_k_schedule=2)
    st = TrainState.create(lambda p, x: x, jax.tree.map(jnp.copy, params), tx,
                           ema_decay=d, ema_every=2)
    grads = {"w": jnp.ones((4,))}

    p0 = np.asarray(st.params["w"])
    st = st.apply_gradients(grads)  # micro-step 1: accumulate only
    np.testing.assert_array_equal(np.asarray(st.params["w"]), p0)  # unchanged
    np.testing.assert_array_equal(np.asarray(st.ema_params["w"]), p0)  # NOT decayed

    st = st.apply_gradients(grads)  # micro-step 2: emit
    p1 = np.asarray(st.params["w"])
    assert not np.allclose(p1, p0)
    expected_ema = d * p0 + (1 - d) * p1  # exactly ONE decay application
    np.testing.assert_allclose(np.asarray(st.ema_params["w"]), expected_ema, rtol=1e-6)
