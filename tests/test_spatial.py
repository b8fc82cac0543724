"""Spatial (context) parallelism: sharded ops must match unsharded math.

The reference has no sequence/context parallelism at all (SURVEY.md section
5.7 — it scales volumes by cropping); these tests pin the exactness of the
TPU-native depth-sharding: halo-exchange convs, psum GroupNorm, gathered-kv
attention, whole-model forwards, the sharded DDIM sampler, and the dp x sp
train step — all on the virtual 8-device CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from functools import partial
from jax.sharding import PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ldm3d_tpu.configs import ConfigResolver, load_json, preset_path
from ldm3d_tpu.diffusion import DDIMScheduler, DDPMScheduler, inferer
from ldm3d_tpu.nn.blocks import AttentionBlock3D, Conv3D, GroupNorm32, Upsample3D
from ldm3d_tpu.parallel import (
    MeshSpec,
    create_mesh,
    halo_exchange,
    make_spatial_sampler,
    validate_spatial_divisibility,
)
from ldm3d_tpu.training import (
    Stage2Config,
    TrainState,
    build_lr_schedule,
    make_diffusion_optimizer,
)
from ldm3d_tpu.training.stage2 import make_stage2_train_step_spatial

RNG = jax.random.PRNGKey(0)


def _sharded_apply(mesh, module, params, x, out_specs=P(None, "spatial"), **apply_kw):
    f = shard_map(
        lambda p, v: module.apply({"params": p}, v, **apply_kw),
        mesh=mesh,
        in_specs=(P(), P(None, "spatial")),
        out_specs=out_specs,
        check_vma=False,
    )
    return f(params, x)


@pytest.fixture(scope="module")
def mesh8(eight_devices):
    return create_mesh(MeshSpec(data=1, spatial=8), devices=eight_devices)


@pytest.fixture(scope="module")
def mesh2x4(eight_devices):
    return create_mesh(MeshSpec(data=2, spatial=4), devices=eight_devices)


@pytest.fixture(scope="module")
def mesh4x2(eight_devices):
    return create_mesh(MeshSpec(data=4, spatial=2), devices=eight_devices)


@pytest.fixture(scope="module")
def tiny():
    cfg = load_json(preset_path("config_tiny_cpu.json"))
    r = ConfigResolver(cfg)
    return r.instantiate("autoencoder_def"), r.instantiate("diffusion_def")


def test_halo_exchange_matches_pad(mesh8):
    x = jax.random.normal(RNG, (1, 16, 2, 2, 3), jnp.float32)

    f = shard_map(
        lambda v: halo_exchange(v, "spatial", lo=1, hi=1),
        mesh=mesh8, in_specs=P(None, "spatial"), out_specs=P(None, "spatial"), check_vma=False,
    )
    out = np.asarray(f(x))  # (1, 8*(2+2), ...) concatenated widened slabs
    slabs = out.reshape(1, 8, 4, 2, 2, 3)
    padded = np.pad(np.asarray(x), ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    for i in range(8):
        np.testing.assert_array_equal(slabs[:, i], padded[:, i * 2 : i * 2 + 4])


@pytest.mark.parametrize("padding,stride", [("same", 1), ("down", 2)])
def test_conv3d_sharded_matches(mesh8, padding, stride):
    x = jax.random.normal(RNG, (2, 16, 6, 6, 12), jnp.float32)
    conv = Conv3D(10, kernel=3, stride=stride, padding=padding)
    params = conv.init(RNG, x)["params"]
    ref = conv.apply({"params": params}, x)
    out = _sharded_apply(mesh8, conv.clone(spatial_axis="spatial"), params, x)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=2e-5)


def test_groupnorm_sharded_matches(mesh8):
    x = jax.random.normal(RNG, (2, 16, 4, 4, 12), jnp.float32) * 3 + 1
    gn = GroupNorm32(4)
    params = gn.init(RNG, x)["params"]
    ref = gn.apply({"params": params}, x)
    out = _sharded_apply(mesh8, gn.clone(spatial_axis="spatial"), params, x)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=2e-5)


def test_attention_sharded_matches(mesh8):
    x = jax.random.normal(RNG, (2, 8, 4, 4, 16), jnp.float32)
    attn = AttentionBlock3D(num_head_channels=8, num_groups=4)
    params = attn.init(RNG, x)["params"]
    ref = attn.apply({"params": params}, x)
    out = _sharded_apply(mesh8, attn.clone(spatial_axis="spatial"), params, x)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=2e-5)


def test_upsample_sharded_matches(mesh8):
    x = jax.random.normal(RNG, (1, 8, 4, 4, 6), jnp.float32)
    up = Upsample3D(6)
    params = up.init(RNG, x)["params"]
    ref = up.apply({"params": params}, x)
    out = _sharded_apply(mesh8, up.clone(spatial_axis="spatial"), params, x)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=2e-5)


def test_upsample_sharded_dilated_matches(mesh8, monkeypatch):
    """The probe-only LDM3D_UPSAMPLE=dilated spatial path (1-deep
    pre-upsample halo + depth-VALID lhs-dilated conv) is exact vs the
    unsharded dilated forward — so if tools/probe_kernels.py ever reports
    the spatial backward fixed, the switch is a one-line dispatch change."""
    monkeypatch.setenv("LDM3D_UPSAMPLE", "dilated")
    x = jax.random.normal(RNG, (1, 8, 4, 4, 6), jnp.float32)
    up = Upsample3D(6)
    params = up.init(RNG, x)["params"]
    ref = up.apply({"params": params}, x)
    out = _sharded_apply(mesh8, up.clone(spatial_axis="spatial"), params, x)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=2e-5)


def test_autoencoder_sharded_matches(mesh2x4, tiny):
    # Everything is jit-wrapped: that is the production usage, and one big
    # program per call hits the persistent compile cache, where eager mode
    # would re-pay thousands of sub-threshold per-op compiles on every run.
    ae, _ = tiny
    x = jax.random.uniform(RNG, (2, 32, 32, 32, 1), jnp.float32)
    variables = jax.jit(ae.init)({"params": RNG, "sample": RNG}, x[:1])
    mu_ref, sig_ref = jax.jit(partial(ae.apply, method="encode"))(
        {"params": variables["params"]}, x
    )
    ae_sp = ae.clone(spatial_axis="spatial")
    f = jax.jit(shard_map(
        lambda p, v: ae_sp.apply({"params": p}, v, method="encode"),
        mesh=mesh2x4,
        in_specs=(P(), P("data", "spatial")),
        out_specs=(P("data", "spatial"), P("data", "spatial")),
        check_vma=False,
    ))
    mu, sig = f(variables["params"], x)
    np.testing.assert_allclose(np.asarray(mu_ref), np.asarray(mu), atol=3e-5)
    np.testing.assert_allclose(np.asarray(sig_ref), np.asarray(sig), atol=3e-5)

    z = jax.random.normal(RNG, (2, 8, 8, 8, ae.latent_channels), jnp.float32)
    dec_ref = jax.jit(partial(ae.apply, method="decode_stage_2_outputs"))(
        {"params": variables["params"]}, z
    )
    g = jax.jit(shard_map(
        lambda p, v: ae_sp.apply({"params": p}, v, method="decode_stage_2_outputs"),
        mesh=mesh2x4,
        in_specs=(P(), P("data", "spatial")),
        out_specs=P("data", "spatial"),
        check_vma=False,
    ))
    np.testing.assert_allclose(
        np.asarray(dec_ref), np.asarray(g(variables["params"], z)), atol=3e-5
    )


def _randomize_out_conv(params):
    """The UNet's conv_out is zero-init; randomize it so parity isn't vacuous."""
    kernel = params["conv_out"]["kernel"]
    params = jax.tree_util.tree_map(lambda a: a, params)  # copy containers
    params["conv_out"] = dict(
        params["conv_out"], kernel=jax.random.normal(RNG, kernel.shape, kernel.dtype) * 0.1
    )
    return params


def test_unet_sharded_matches(mesh4x2, tiny):
    _, unet = tiny
    z = jax.random.normal(RNG, (4, 8, 8, 8, unet.in_channels), jnp.float32)
    t = jnp.array([1, 5, 9, 13], jnp.int32)
    params = _randomize_out_conv(jax.jit(unet.init)(RNG, z[:1], t[:1])["params"])
    ref = jax.jit(unet.apply)({"params": params}, z, t)
    assert float(jnp.abs(ref).max()) > 0  # non-vacuous
    unet_sp = unet.clone(spatial_axis="spatial")
    f = jax.jit(shard_map(
        lambda p, v, tt: unet_sp.apply({"params": p}, v, tt),
        mesh=mesh4x2,
        in_specs=(P(), P("data", "spatial"), P("data")),
        out_specs=P("data", "spatial"),
        check_vma=False,
    ))
    np.testing.assert_allclose(np.asarray(ref), np.asarray(f(params, z, t)), atol=5e-5)


def test_spatial_sampler_matches_unsharded(mesh4x2, tiny):
    ae, unet = tiny
    x = jax.random.uniform(RNG, (1, 32, 32, 32, 1), jnp.float32)
    ae_vars = jax.jit(ae.init)({"params": RNG, "sample": RNG}, x)
    u_params = _randomize_out_conv(
        jax.jit(unet.init)(RNG, jnp.zeros((1, 8, 8, 8, unet.in_channels)), jnp.zeros((1,), jnp.int32))["params"]
    )
    ddim = DDIMScheduler.create(num_inference_steps=4, num_train_timesteps=16)
    noise = jax.random.normal(RNG, (4, 8, 8, 8, ae.latent_channels), jnp.float32)
    condition = jax.random.normal(
        jax.random.PRNGKey(5), (4, 8, 8, 8, unet.in_channels - ae.latent_channels), jnp.float32
    )

    ref = inferer.sample(
        lambda xx, tt: unet.apply({"params": u_params}, xx, tt),
        lambda zz: ae.apply({"params": ae_vars["params"]}, zz, method="decode_stage_2_outputs"),
        ddim, noise, RNG, condition,
    )
    sampler = make_spatial_sampler(unet, ae, ddim, mesh4x2)
    out = sampler(u_params, ae_vars["params"], noise, RNG, condition)
    assert float(jnp.abs(ref).max()) > 0
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=1e-4)


def test_spatial_sampler_unconditional(mesh4x2, tiny):
    """condition=None must flow through the shard_map specs (empty pytree)."""
    from ldm3d_tpu.nn import DiffusionUNet3D

    ae, _ = tiny
    unet = DiffusionUNet3D(
        in_channels=ae.latent_channels, out_channels=ae.latent_channels,
        channels=(8, 16, 16), attention_levels=(False, True, True),
        num_head_channels=(0, 8, 8), num_res_blocks=(1, 1, 1), norm_num_groups=4,
    )
    ae_vars = jax.jit(ae.init)({"params": RNG, "sample": RNG}, jnp.zeros((1, 16, 16, 16, 1)))
    u_vars = jax.jit(unet.init)(RNG, jnp.zeros((1, 8, 8, 8, ae.latent_channels)), jnp.zeros((1,), jnp.int32))
    ddim = DDIMScheduler.create(num_inference_steps=2, num_train_timesteps=8)
    sampler = make_spatial_sampler(unet, ae, ddim, mesh4x2)
    noise = jax.random.normal(RNG, (4, 8, 8, 8, ae.latent_channels), jnp.float32)
    out = sampler(u_vars["params"], ae_vars["params"], noise, RNG, None)
    assert out.shape == (4, 32, 32, 32, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_stage2_spatial_train_step(mesh4x2, tiny):
    ae, unet = tiny
    rng = jax.random.PRNGKey(7)
    x = jax.random.uniform(rng, (4, 32, 32, 32, 1), jnp.float32)
    ae_vars = jax.jit(ae.init)({"params": rng, "sample": rng}, x[:1])
    u_vars = jax.jit(unet.init)(rng, jnp.zeros((1, 8, 8, 8, unet.in_channels)), jnp.zeros((1,), jnp.int32))
    sched = DDPMScheduler.create(num_train_timesteps=16)
    state = TrainState.create(
        unet.apply, u_vars["params"],
        make_diffusion_optimizer(build_lr_schedule("multistep", 1e-3, 1, 1)),
    )
    baseline = jax.tree_util.tree_map(jnp.copy, u_vars["params"])
    step = make_stage2_train_step_spatial(unet, ae, sched, Stage2Config(), mesh4x2)
    with mesh4x2:
        state, metrics = step(state, ae_vars["params"], {"image": x, "label": x}, jnp.float32(1.0), rng)
    loss = float(metrics["diffusion_loss"])
    gnorm = float(metrics["grad_norm"])
    assert np.isfinite(loss) and 0.3 < loss < 3.0  # epsilon-MSE near 1 at init
    assert np.isfinite(gnorm) and gnorm > 0
    moved = sum(
        float(jnp.abs(a - b).sum())
        for a, b in zip(jax.tree_util.tree_leaves(state.params), jax.tree_util.tree_leaves(baseline))
    )
    assert moved > 0


def test_stage1_spatial_train_step(mesh4x2, tiny):
    """VAE-GAN dp x sp step: sharded VAE + gathered-volume discriminator."""
    from ldm3d_tpu.nn import PatchDiscriminator3D
    from ldm3d_tpu.training import make_optimizer, make_stage1_train_step
    from ldm3d_tpu.training.stage1 import Stage1Config, make_stage1_train_step_spatial

    ae, _ = tiny
    disc = PatchDiscriminator3D()
    rng = jax.random.PRNGKey(3)
    x = jax.random.uniform(rng, (4, 32, 32, 32, 1), jnp.float32)
    ae_vars = jax.jit(ae.init)({"params": rng, "sample": rng}, x[:1])
    d_vars = jax.jit(disc.init)(rng, x[:1])
    cfg = Stage1Config(kl_weight=1e-7, perceptual_weight=0.0, adv_weight=0.01)

    def states():
        g = TrainState.create(ae.apply, jax.tree_util.tree_map(jnp.copy, ae_vars["params"]),
                              make_optimizer(build_lr_schedule("constant", 1e-3, 1, 1)))
        d = TrainState.create(disc.apply, jax.tree_util.tree_map(jnp.copy, d_vars["params"]),
                              make_optimizer(build_lr_schedule("constant", 1e-3, 1, 1)))
        return g, d

    g_sp, d_sp = states()
    step_sp = make_stage1_train_step_spatial(ae, disc, None, cfg, mesh4x2)
    with mesh4x2:
        g_sp, d_sp, m = step_sp(g_sp, d_sp, x, rng, adv_active=True)
    for k, v in m.items():
        assert np.isfinite(float(v)), k

    # loss magnitudes line up with the unsharded step on the same batch
    # (exact equality is impossible: the posterior sample folds mesh indices)
    g_ref, d_ref = states()
    step = make_stage1_train_step(ae, disc, None, cfg)
    _, _, m_ref = step(g_ref, d_ref, x, rng, adv_active=True)
    assert abs(float(m["recon_loss"]) - float(m_ref["recon_loss"])) < 0.05 * float(m_ref["recon_loss"])
    np.testing.assert_allclose(float(m["kl_loss"]), float(m_ref["kl_loss"]), rtol=1e-3)


def test_validate_spatial_divisibility():
    validate_spatial_divisibility(32, 4, 2)  # 8 -> 4 -> 2 OK
    with pytest.raises(ValueError):
        validate_spatial_divisibility(30, 4, 2)
    with pytest.raises(ValueError):
        validate_spatial_divisibility(8, 4, 2)  # local 2 -> 1 -> odd


def test_stage2_spatial_train_step_min_snr(mesh4x2, tiny):
    """Min-SNR weighting in the depth-sharded step stays finite and differs
    from uniform weighting (weights are per-sample, constant across slabs)."""
    ae, unet = tiny
    rng = jax.random.PRNGKey(7)
    x = jax.random.uniform(rng, (4, 32, 32, 32, 1), jnp.float32)
    ae_vars = jax.jit(ae.init)({"params": rng, "sample": rng}, x[:1])
    u_vars = jax.jit(unet.init)(rng, jnp.zeros((1, 8, 8, 8, unet.in_channels)), jnp.zeros((1,), jnp.int32))
    sched = DDPMScheduler.create(num_train_timesteps=16)
    losses = {}
    for gamma in (0.0, 5.0):
        params = jax.tree_util.tree_map(jnp.array, u_vars["params"])
        state = TrainState.create(
            unet.apply, params,
            make_diffusion_optimizer(build_lr_schedule("multistep", 1e-3, 1, 1)))
        step = make_stage2_train_step_spatial(unet, ae, sched,
                                              Stage2Config(min_snr_gamma=gamma), mesh4x2)
        with mesh4x2:
            state, metrics = step(state, ae_vars["params"], {"image": x, "label": x},
                                  jnp.float32(1.0), rng)
        losses[gamma] = float(metrics["diffusion_loss"])
        assert np.isfinite(losses[gamma])
    assert losses[0.0] != losses[5.0]


def test_stage2_spatial_composes_with_tensor_parallel(tiny, eight_devices):
    """data2 x model2 x spatial2: TP-sharded UNet params inside the spatial
    shard_map ('model' stays an auto GSPMD axis) — identical loss and updated
    params vs the model=1 spatial step (same rng)."""
    from ldm3d_tpu.parallel import shard_train_state_tp
    from ldm3d_tpu.training import (Stage2Config, TrainState, build_lr_schedule,
                                    make_diffusion_optimizer)
    from ldm3d_tpu.training.stage2 import make_stage2_train_step_spatial

    ae, unet = tiny
    rng = jax.random.PRNGKey(3)
    x = jax.random.uniform(rng, (2, 32, 16, 16, 1), jnp.float32)
    ae_vars = jax.jit(ae.init)({"params": rng, "sample": rng}, x[:1])
    u_vars = jax.jit(unet.init)(rng, jnp.zeros((1, 8, 4, 4, unet.in_channels)), jnp.zeros((1,), jnp.int32))
    sched = DDPMScheduler.create(num_train_timesteps=8)

    def make_state():
        return TrainState.create(
            unet.apply, jax.tree_util.tree_map(jnp.copy, u_vars["params"]),
            make_diffusion_optimizer(build_lr_schedule("multistep", 1e-3, 1, 1)))

    batch = {"image": x, "label": x}
    mesh_ref = create_mesh(MeshSpec(data=2, model=1, spatial=2), devices=eight_devices[:4])
    step_ref = make_stage2_train_step_spatial(unet, ae, sched, Stage2Config(), mesh_ref)
    with mesh_ref:
        s_ref, m_ref = step_ref(make_state(), ae_vars["params"], batch, jnp.float32(1.0), rng)

    mesh_tp = create_mesh(MeshSpec(data=2, model=2, spatial=2), devices=eight_devices)
    step_tp = make_stage2_train_step_spatial(unet, ae, sched, Stage2Config(), mesh_tp)
    with mesh_tp:
        s_tp = shard_train_state_tp(make_state(), mesh_tp)
        s_tp, m_tp = step_tp(s_tp, ae_vars["params"], batch, jnp.float32(1.0), rng)

    np.testing.assert_allclose(float(m_ref["diffusion_loss"]),
                               float(m_tp["diffusion_loss"]), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s_ref.params),
                    jax.tree_util.tree_leaves(s_tp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_spatial_sampler_composes_with_tensor_parallel(tiny, eight_devices):
    """TP x SP sampling: TP-sharded weights through the depth-sharded DDIM
    sampler match the model=1 spatial sampler exactly (deterministic)."""
    from ldm3d_tpu.parallel import shard_params_tp

    ae, unet = tiny
    rng = jax.random.PRNGKey(5)
    ae_vars = jax.jit(ae.init)({"params": rng, "sample": rng}, jnp.zeros((1, 32, 16, 16, 1)))
    u_vars = jax.jit(unet.init)(rng, jnp.zeros((1, 8, 4, 4, unet.in_channels)), jnp.zeros((1,), jnp.int32))
    ddim = DDIMScheduler.create(num_inference_steps=2, num_train_timesteps=8)
    noise = jax.random.normal(rng, (2, 8, 4, 4, ae.latent_channels), jnp.float32)
    cond = jax.random.normal(jax.random.PRNGKey(6), (2, 8, 4, 4, ae.latent_channels), jnp.float32)

    mesh_ref = create_mesh(MeshSpec(data=2, model=1, spatial=2), devices=eight_devices[:4])
    sampler_ref = make_spatial_sampler(unet, ae, ddim, mesh_ref)
    out_ref = np.asarray(sampler_ref(u_vars["params"], ae_vars["params"], noise, rng, cond))

    mesh_tp = create_mesh(MeshSpec(data=2, model=2, spatial=2), devices=eight_devices)
    sampler_tp = make_spatial_sampler(unet, ae, ddim, mesh_tp)
    with mesh_tp:
        u_tp = shard_params_tp(u_vars["params"], mesh_tp)
        ae_tp = shard_params_tp(ae_vars["params"], mesh_tp)
    out_tp = np.asarray(sampler_tp(u_tp, ae_tp, noise, rng, cond))

    np.testing.assert_allclose(out_ref, out_tp, atol=2e-4)

    # the sampler's param placement must PRESERVE the TP sharding — a
    # blanket device_put to replicated defeated TP x SP and re-materialized
    # full weights per chip (found in review)
    from ldm3d_tpu.parallel.spatial import _keep_or_replicate

    tp_leaves = [a for a in jax.tree_util.tree_leaves(u_tp)
                 if "model" in tuple(getattr(a.sharding, "spec", ()) or ())]
    assert tp_leaves, "expected at least one model-sharded UNet leaf"
    for leaf in tp_leaves[:3]:
        kept = _keep_or_replicate(leaf, mesh_tp)
        assert "model" in tuple(kept.spec), kept


def test_stage1_spatial_composes_with_tensor_parallel(tiny, eight_devices):
    """VAE-GAN spatial step with TP-sharded G+D states matches model=1."""
    from ldm3d_tpu.nn import PatchDiscriminator3D
    from ldm3d_tpu.parallel import shard_train_state_tp
    from ldm3d_tpu.training import make_optimizer
    from ldm3d_tpu.training.stage1 import Stage1Config, make_stage1_train_step_spatial

    ae, _ = tiny
    disc = PatchDiscriminator3D()
    rng = jax.random.PRNGKey(9)
    x = jax.random.uniform(rng, (2, 32, 16, 16, 1), jnp.float32)
    ae_vars = jax.jit(ae.init)({"params": rng, "sample": rng}, x[:1])
    d_vars = jax.jit(disc.init)(rng, x[:1])
    cfg = Stage1Config(kl_weight=1e-7, perceptual_weight=0.0, adv_weight=0.01)

    def states():
        g = TrainState.create(ae.apply, jax.tree_util.tree_map(jnp.copy, ae_vars["params"]),
                              make_optimizer(build_lr_schedule("constant", 1e-3, 1, 1)))
        d = TrainState.create(disc.apply, jax.tree_util.tree_map(jnp.copy, d_vars["params"]),
                              make_optimizer(build_lr_schedule("constant", 1e-3, 1, 1)))
        return g, d

    mesh_ref = create_mesh(MeshSpec(data=2, model=1, spatial=2), devices=eight_devices[:4])
    step_ref = make_stage1_train_step_spatial(ae, disc, None, cfg, mesh_ref)
    g_ref, d_ref = states()
    with mesh_ref:
        g_ref, d_ref, m_ref = step_ref(g_ref, d_ref, x, rng, adv_active=True)

    mesh_tp = create_mesh(MeshSpec(data=2, model=2, spatial=2), devices=eight_devices)
    step_tp = make_stage1_train_step_spatial(ae, disc, None, cfg, mesh_tp)
    with mesh_tp:
        g_tp, d_tp = states()
        g_tp = shard_train_state_tp(g_tp, mesh_tp)
        d_tp = shard_train_state_tp(d_tp, mesh_tp)
        g_tp, d_tp, m_tp = step_tp(g_tp, d_tp, x, rng, adv_active=True)

    np.testing.assert_allclose(float(m_ref["g_loss"]), float(m_tp["g_loss"]), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref.params),
                    jax.tree_util.tree_leaves(g_tp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
    for a, b in zip(jax.tree_util.tree_leaves(d_ref.params),
                    jax.tree_util.tree_leaves(d_tp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_stage1_eval_step_spatial(mesh4x2, tiny):
    """Depth-sharded validation (the --spatial trainer path): same metrics
    contract as the unsharded eval step, recon returned full-depth. Guards
    the round-2 finding that spatial runs validated through the UNSHARDED
    model (which would OOM at the sizes --spatial exists for)."""
    from ldm3d_tpu.training.stage1 import (Stage1Config, make_stage1_eval_step,
                                           make_stage1_eval_step_spatial)

    ae, _ = tiny
    rng = jax.random.PRNGKey(11)
    x = jax.random.uniform(rng, (4, 32, 32, 32, 1), jnp.float32)
    params = jax.jit(ae.init)({"params": rng, "sample": rng}, x[:1])["params"]
    cfg = Stage1Config(perceptual_weight=0.0)

    ref_metrics, _ = make_stage1_eval_step(ae, None, cfg)(params, x, rng)
    step = make_stage1_eval_step_spatial(ae, None, cfg, mesh4x2)
    with mesh4x2:
        metrics, recon = step(params, x, rng)
    assert recon.shape == x.shape
    assert np.isfinite(np.asarray(recon)).all()
    for k in ("val_recon_loss", "val_l_loss", "val_kl_loss"):
        v, r = float(metrics[k]), float(ref_metrics[k])
        assert np.isfinite(v)
        # posterior draws use different (sound) key derivations, so compare
        # loosely: same order of magnitude, both positive
        assert v > 0 and abs(v - r) / max(abs(r), 1e-6) < 0.5, (k, v, r)


def test_stage2_eval_step_spatial(mesh4x2, tiny):
    from ldm3d_tpu.training.stage2 import Stage2Config, make_stage2_eval_step_spatial

    ae, unet = tiny
    rng = jax.random.PRNGKey(13)
    x = jax.random.uniform(rng, (4, 32, 32, 32, 1), jnp.float32)
    ae_vars = jax.jit(ae.init)({"params": rng, "sample": rng}, x[:1])
    u_vars = jax.jit(unet.init)(rng, jnp.zeros((1, 8, 8, 8, unet.in_channels)),
                                jnp.zeros((1,), jnp.int32))
    sched = DDPMScheduler.create(num_train_timesteps=16)
    step = make_stage2_eval_step_spatial(unet, ae, sched, Stage2Config(), mesh4x2)
    with mesh4x2:
        vm = step(u_vars["params"], ae_vars["params"], {"image": x, "label": x},
                  jnp.float32(1.0), rng)
    loss = float(vm["val_diffusion_loss"])
    assert np.isfinite(loss) and 0.3 < loss < 3.0  # epsilon-MSE near 1 at init
