"""Train-step tests: loss behavior, DP parity across mesh sizes, schedules."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldm3d_tpu.diffusion import DDPMScheduler
from ldm3d_tpu.nn import AutoencoderKL, DiffusionUNet3D, PatchDiscriminator3D
from ldm3d_tpu.parallel import MeshSpec, create_mesh, shard_batch
from ldm3d_tpu.training import (
    Stage1Config,
    Stage2Config,
    TrainState,
    build_lr_schedule,
    compute_scale_factor,
    make_diffusion_optimizer,
    make_optimizer,
    make_stage1_eval_step,
    make_stage1_train_step,
    make_stage2_train_step,
    scale_lr_for_world,
)


def _tiny_ae():
    return AutoencoderKL(
        in_channels=1, out_channels=1, latent_channels=4,
        channels=(8, 8, 16), num_res_blocks=(1, 1, 1),
        attention_levels=(False, False, False), norm_num_groups=4,
    )


def _tiny_unet(in_ch=8):
    return DiffusionUNet3D(
        in_channels=in_ch, out_channels=4, channels=(8, 16, 16),
        attention_levels=(False, False, True), num_head_channels=(0, 0, 8),
        num_res_blocks=(1, 1, 1), norm_num_groups=4,
    )


@pytest.fixture(scope="module")
def _stage1_base():
    ae = _tiny_ae()
    disc = PatchDiscriminator3D(num_layers_d=2, channels=4)
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (8, 16, 16, 16, 1))
    g_vars = ae.init({"params": rng, "sample": rng}, x)
    d_vars = disc.init(rng, x)
    cfg = Stage1Config(perceptual_weight=0.0, kl_weight=1e-7)
    sched = build_lr_schedule("warmup_cosine", 1e-3, max_epochs=10, steps_per_epoch=4)
    g_state = TrainState.create(ae.apply, g_vars["params"], make_optimizer(sched))
    d_state = TrainState.create(disc.apply, d_vars["params"], make_optimizer(sched))
    return ae, disc, cfg, g_state, d_state, x


@pytest.fixture()
def stage1_setup(_stage1_base):
    # train steps donate state buffers; hand each test fresh copies
    ae, disc, cfg, g_state, d_state, x = _stage1_base
    clone = lambda s: jax.tree.map(jnp.copy, s)
    return ae, disc, cfg, clone(g_state), clone(d_state), x


def test_stage1_loss_decreases(stage1_setup):
    ae, disc, cfg, g_state, d_state, x = stage1_setup
    step = make_stage1_train_step(ae, disc, None, cfg)
    first = last = None
    for i in range(5):
        g_state, d_state, m = step(g_state, d_state, x, jax.random.PRNGKey(i), adv_active=False)
        if first is None:
            first = float(m["recon_loss"])
        last = float(m["recon_loss"])
    assert np.isfinite(last)
    assert last < first


def test_stage1_adv_branch(stage1_setup):
    ae, disc, cfg, g_state, d_state, x = stage1_setup
    step = make_stage1_train_step(ae, disc, None, cfg)
    g_state, d_state, m = step(g_state, d_state, x, jax.random.PRNGKey(0), adv_active=True)
    assert float(m["adv_loss"]) != 0.0
    assert np.isfinite(float(m["d_loss"]))


def test_stage1_dp_parity(stage1_setup, eight_devices):
    """Same step on a 1-device and an 8-device mesh gives the same metrics
    (the multi-chip validation the reference never had, SURVEY.md section 4)."""
    ae, disc, cfg, g_state, d_state, x = stage1_setup
    step = make_stage1_train_step(ae, disc, None, cfg)

    mesh8 = create_mesh(MeshSpec(data=8), devices=eight_devices)
    x8 = shard_batch(mesh8, np.asarray(x))
    clone = lambda s: jax.tree.map(jnp.copy, s)
    g1, _, m1 = step(clone(g_state), clone(d_state), x, jax.random.PRNGKey(0), adv_active=False)
    g8, _, m8 = step(g_state, d_state, x8, jax.random.PRNGKey(0), adv_active=False)
    np.testing.assert_allclose(float(m1["recon_loss"]), float(m8["recon_loss"]), rtol=2e-5)
    l1 = jax.tree_util.tree_leaves(g1.params)[0]
    l8 = jax.tree_util.tree_leaves(g8.params)[0]
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l8), atol=2e-5)


def test_stage2_step_and_scale_factor(stage1_setup):
    ae, _, _, g_state, _, x = stage1_setup
    unet = _tiny_unet(in_ch=8)
    scheduler = DDPMScheduler.create(num_train_timesteps=8)
    rng = jax.random.PRNGKey(0)
    sf = compute_scale_factor(ae, g_state.params, x, rng)
    assert np.isfinite(float(sf)) and float(sf) > 0

    u_vars = unet.init(rng, jnp.zeros((1, 4, 4, 4, 8)), jnp.zeros((1,), jnp.int32))
    u_state = TrainState.create(unet.apply, u_vars["params"],
                                make_diffusion_optimizer(build_lr_schedule("multistep", 1e-3, 10, 4)))
    step = make_stage2_train_step(unet, ae, scheduler, Stage2Config())
    batch = {"image": x, "label": x}
    losses = []
    for i in range(3):
        u_state, m = step(u_state, g_state.params, batch, sf, jax.random.PRNGKey(i))
        losses.append(float(m["diffusion_loss"]))
    assert all(np.isfinite(losses))
    # zero-init output conv => first prediction is 0, loss ~ E[eps^2] ~ 1
    assert 0.5 < losses[0] < 2.0


def test_unconditional_stage2():
    ae = _tiny_ae()
    unet = _tiny_unet(in_ch=4)  # latent-only input
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (2, 16, 16, 16, 1))
    g_vars = ae.init({"params": rng, "sample": rng}, x)
    scheduler = DDPMScheduler.create(num_train_timesteps=8)
    u_vars = unet.init(rng, jnp.zeros((1, 4, 4, 4, 4)), jnp.zeros((1,), jnp.int32))
    u_state = TrainState.create(unet.apply, u_vars["params"],
                                make_diffusion_optimizer(build_lr_schedule(None, 1e-3, 10, 4)))
    step = make_stage2_train_step(unet, ae, scheduler, Stage2Config(conditional=False))
    u_state, m = step(u_state, g_vars["params"], {"image": x, "label": x}, 1.0, rng)
    assert np.isfinite(float(m["diffusion_loss"]))


def test_lr_schedules():
    s = build_lr_schedule("warmup_cosine", 1e-3, max_epochs=100, steps_per_epoch=10, warmup_epochs=5)
    assert float(s(0)) == pytest.approx(1e-4, rel=1e-3)
    assert float(s(50)) == pytest.approx(1e-3, rel=1e-2)
    assert float(s(1000)) < 2e-5  # decayed near eta_min
    m = build_lr_schedule("multistep", 1e-3, 2000, 1, milestones=(100, 1000))
    assert float(m(50)) == pytest.approx(1e-3)
    assert float(m(150)) == pytest.approx(1e-4)
    assert float(m(1500)) == pytest.approx(1e-5)
    assert scale_lr_for_world(1e-3, 4) == pytest.approx(1e-3)  # sqrt(4)*0.5 = 1.0
    assert scale_lr_for_world(1e-3, 1) == pytest.approx(1e-3)


def test_stage1_eval_step(stage1_setup):
    ae, _, cfg, g_state, _, x = stage1_setup
    eval_step = make_stage1_eval_step(ae, None, cfg)
    m, recon = eval_step(g_state.params, x, jax.random.PRNGKey(0))
    assert recon.shape == x.shape
    assert np.isfinite(float(m["val_recon_loss"]))
    assert float(np.max(np.asarray(recon))) <= 1.0


def test_ema_params_track_updates():
    """EMA tree follows params with the configured decay (capability beyond
    the reference, which keeps no weight averages)."""
    import optax

    from ldm3d_tpu.training.state import TrainState

    params = {"w": jnp.ones((4,), jnp.float32)}
    state = TrainState.create(lambda *a: None, params, optax.sgd(0.5), ema_decay=0.9)
    grads = {"w": jnp.ones((4,), jnp.float32)}
    state = state.apply_gradients(grads)
    # params: 1 - 0.5 = 0.5 ; ema: 0.9*1 + 0.1*0.5 = 0.95
    np.testing.assert_allclose(np.asarray(state.params["w"]), 0.5)
    np.testing.assert_allclose(np.asarray(state.ema_params["w"]), 0.95, rtol=1e-6)
    state = state.apply_gradients(grads)
    # params: 0.0 ; ema: 0.9*0.95 = 0.855
    np.testing.assert_allclose(np.asarray(state.params["w"]), 0.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(state.ema_params["w"]), 0.855, rtol=1e-6)


def test_ema_none_by_default():
    import optax

    from ldm3d_tpu.training.state import TrainState

    state = TrainState.create(lambda *a: None, {"w": jnp.ones((2,))}, optax.sgd(0.1))
    assert state.ema_params is None
    state = state.apply_gradients({"w": jnp.ones((2,))})
    assert state.ema_params is None


def test_min_snr_weights_closed_form():
    """epsilon: min(SNR,g)/SNR; v: min(SNR,g)/(SNR+1); sample: min(SNR,g)."""
    import numpy as np

    from ldm3d_tpu.diffusion import DDPMScheduler
    from ldm3d_tpu.training.stage2 import min_snr_weights

    t = jnp.array([0, 3, 7], jnp.int32)
    gamma = 5.0
    for pt in ("epsilon", "v_prediction", "sample"):
        sched = DDPMScheduler.create(num_train_timesteps=8, prediction_type=pt)
        abar = np.asarray(sched.alphas_cumprod)[np.asarray(t)]
        snr = abar / (1 - abar)
        clipped = np.minimum(snr, gamma)
        expect = {"epsilon": clipped / snr, "v_prediction": clipped / (snr + 1),
                  "sample": clipped}[pt]
        got = np.asarray(min_snr_weights(sched, t, gamma))
        np.testing.assert_allclose(got, expect, rtol=1e-5)
    # early (low-noise... actually high-abar) timesteps have SNR >> gamma ->
    # weight < 1 for epsilon; late timesteps SNR < gamma -> weight 1
    sched = DDPMScheduler.create(num_train_timesteps=1000)
    w = np.asarray(min_snr_weights(sched, jnp.array([0, 999]), 5.0))
    assert w[0] < 0.01 and abs(w[1] - 1.0) < 1e-5


def test_min_snr_train_step_runs_and_differs():
    """min_snr_gamma changes the loss but still trains (finite, updates)."""
    from ldm3d_tpu.training.stage2 import make_stage2_train_step as _mk

    rng = jax.random.PRNGKey(0)
    ae = _tiny_ae()
    unet = _tiny_unet()
    ae_params = ae.init({"params": rng, "sample": rng},
                        jnp.zeros((1, 16, 16, 16, 1)))["params"]
    u_params = unet.init(rng, jnp.zeros((1, 4, 4, 4, unet.in_channels)),
                         jnp.zeros((1,), jnp.int32))["params"]
    sched = DDPMScheduler.create(num_train_timesteps=16)
    x = jax.random.uniform(rng, (2, 16, 16, 16, 1), jnp.float32)
    batch = {"image": x, "label": x}

    losses = {}
    for gamma in (0.0, 5.0):
        params_copy = jax.tree_util.tree_map(jnp.array, u_params)  # step donates
        state = TrainState.create(
            unet.apply, params_copy,
            make_diffusion_optimizer(build_lr_schedule("multistep", 1e-4, 1, 1)))
        step = _mk(unet, ae, sched, Stage2Config(min_snr_gamma=gamma))
        state, metrics = step(state, ae_params, batch, jnp.float32(1.0), rng)
        loss = float(metrics["diffusion_loss"])
        assert np.isfinite(loss)
        losses[gamma] = loss
    assert losses[0.0] != losses[5.0]
