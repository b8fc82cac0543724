"""Pipeline parallelism over the 'stage' mesh axis (parallel/pipeline.py).

Pins: (a) the GPipe schedule computes EXACTLY the sequential stack (forward),
(b) its autodiff matches sequential gradients (the scan/ppermute transpose IS
the backward pipeline), (c) the dp x pp stage-2 train step matches an
unsharded reference implementation with identical RNG discipline, and the
bottleneck stack's params/moments stay physically sharded 1/S per device,
(d) the refactored UNet keeps its parameter tree byte-compatible
(mid_depth=0) and stacks mid_stack params for mid_depth>0. The reference has
no pipeline parallelism at all (SURVEY.md section 2.3).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldm3d_tpu.configs import ConfigResolver, load_json, preset_path
from ldm3d_tpu.parallel import (
    MeshSpec,
    create_mesh,
    pipeline_apply,
    shard_batch,
    shard_train_state_pp,
)

RNG = jax.random.PRNGKey(0)
N_LAYERS, FEAT, BATCH = 8, 16, 8


def _layer_fn(p, h, aux):
    return h + jnp.tanh(h @ p["w"] + p["b"] + aux[:, None])


def _stack_problem():
    k1, k2, k3, k4 = jax.random.split(RNG, 4)
    stacked = {
        "w": jax.random.normal(k1, (N_LAYERS, FEAT, FEAT), jnp.float32) * 0.3,
        "b": jax.random.normal(k2, (N_LAYERS, FEAT), jnp.float32) * 0.1,
    }
    x = jax.random.normal(k3, (BATCH, FEAT), jnp.float32)
    aux = jax.random.normal(k4, (BATCH,), jnp.float32)
    return stacked, x, aux


def _sequential(stacked, x, aux):
    h = x
    for i in range(N_LAYERS):
        h = _layer_fn(jax.tree_util.tree_map(lambda a: a[i], stacked), h, aux)
    return h


@pytest.mark.parametrize("spec", [dict(data=2, stage=4), dict(data=4, stage=2),
                                  dict(data=8, stage=1)])
def test_pipeline_forward_matches_sequential(eight_devices, spec):
    """All stage widths (incl. multi-layer chunks and the degenerate S=1
    path) reproduce the sequential stack exactly."""
    mesh = create_mesh(MeshSpec(**spec), devices=eight_devices)
    stacked, x, aux = _stack_problem()
    ref = _sequential(stacked, x, aux)
    with mesh:
        out = pipeline_apply(_layer_fn, stacked, x, aux,
                             mesh=mesh, num_microbatches=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pipeline_grad_matches_sequential(eight_devices):
    """d(loss)/d(stacked params, x) through the schedule == sequential."""
    mesh = create_mesh(MeshSpec(data=2, stage=4), devices=eight_devices)
    stacked, x, aux = _stack_problem()

    def loss_seq(p, x):
        return jnp.sum(_sequential(p, x, aux) ** 2)

    def loss_pp(p, x):
        return jnp.sum(pipeline_apply(_layer_fn, p, x, aux,
                                      mesh=mesh, num_microbatches=4) ** 2)

    g_ref = jax.grad(loss_seq, argnums=(0, 1))(stacked, x)
    with mesh:
        g_pp = jax.jit(jax.grad(loss_pp, argnums=(0, 1)))(stacked, x)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_pp)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-4)


def test_pipeline_rejects_nonuniform_stage():
    """Shape/dtype-changing stages violate the uniform-pipeline contract."""
    from ldm3d_tpu.parallel.pipeline import chunked_stage_fn, pipeline_spmd

    bad = chunked_stage_fn(lambda p, h, aux: jnp.concatenate([h, h], -1))
    with pytest.raises(ValueError, match="preserve shape"):
        # n_stages > 1 so the check path (not the degenerate scan) runs;
        # eval_shape raises before any collective executes
        pipeline_spmd(bad, {"w": jnp.zeros((1, 2))}, jnp.zeros((2, 1, 4)),
                      n_stages=2)


# --- UNet integration -------------------------------------------------------

_EXPECTED_TINY_UNET_PARAMS = [
    "conv_in", "conv_out",
    "down_0_downsample", "down_0_res_0",
    "down_1_attn_0", "down_1_downsample", "down_1_res_0",
    "down_2_attn_0", "down_2_res_0",
    "mid_attn", "mid_res_1", "mid_res_2",
    "norm_out", "time_embed",
    "up_0_res_0", "up_0_res_1",
    "up_1_attn_0", "up_1_attn_1", "up_1_res_0", "up_1_res_1", "up_1_upsample",
    "up_2_attn_0", "up_2_attn_1", "up_2_res_0", "up_2_res_1", "up_2_upsample",
]


def _tiny_unet(**overrides):
    cfg = load_json(preset_path("config_tiny_cpu.json"))
    unet = ConfigResolver(cfg).instantiate("diffusion_def")
    return unet.clone(**overrides) if overrides else unet


def test_unet_param_tree_stable_and_mid_stack():
    """mid_depth=0 keeps the exact pre-refactor parameter tree (checkpoint
    compatibility); mid_depth=N adds ONLY 'mid_stack' with layer-stacked
    leaves; staged methods compose to __call__."""
    unet = _tiny_unet()
    x = jnp.zeros((1, 4, 4, 4, unet.in_channels))
    t = jnp.zeros((1,), jnp.int32)
    v = unet.init(RNG, x, t)
    assert sorted(v["params"].keys()) == _EXPECTED_TINY_UNET_PARAMS

    deep = _tiny_unet(mid_depth=3)
    v3 = deep.init(RNG, x, t)
    assert sorted(v3["params"].keys()) == sorted(_EXPECTED_TINY_UNET_PARAMS + ["mid_stack"])
    k = v3["params"]["mid_stack"]["res"]["conv1"]["kernel"]
    assert k.shape[0] == 3  # leading layer axis (nn.scan stacking)

    y_call = deep.apply(v3, x, t)
    temb = deep.apply(v3, t, method="time_embedding")
    h, skips = deep.apply(v3, x, temb, method="down")
    h = deep.apply(v3, h, temb, method="mid_entry")
    h = deep.apply(v3, h, temb, method="mid_stack_apply")
    h = deep.apply(v3, h, temb, method="mid_exit")
    y_staged = deep.apply(v3, h, skips, temb, method="up")
    np.testing.assert_allclose(np.asarray(y_call), np.asarray(y_staged), atol=1e-6)


def test_stage2_pp_step_matches_reference(eight_devices):
    """The dp x pp train step == an unsharded reference with the same
    per-data-row RNG discipline: loss, updated params, and the mid_stack
    stays physically sharded 1/S per device after the step."""
    from ldm3d_tpu.diffusion import DDPMScheduler, inferer
    from ldm3d_tpu.training import (
        Stage2Config,
        TrainState,
        build_lr_schedule,
        make_diffusion_optimizer,
    )
    from ldm3d_tpu.training.stage2 import _stage2_mse, make_stage2_train_step_pp

    n_data, n_stage = 2, 4
    mesh = create_mesh(MeshSpec(data=n_data, stage=n_stage), devices=eight_devices)
    cfg = load_json(preset_path("config_tiny_cpu.json"))
    r = ConfigResolver(cfg)
    ae = r.instantiate("autoencoder_def")
    unet = r.instantiate("diffusion_def").clone(mid_depth=4)
    sched = DDPMScheduler.create(num_train_timesteps=16)
    s2cfg = Stage2Config()

    vol = (4, 16, 16, 16, 1)  # batch 4 -> rows of 2, microbatches of 1
    x = jax.random.uniform(RNG, vol, jnp.float32)
    batch = {"image": x, "label": x}
    ae_vars = ae.init({"params": RNG, "sample": RNG}, x[:1])
    latent = tuple(s // ae.downsample_factor for s in vol[1:4])
    u_params = unet.init(RNG, jnp.zeros((1, *latent, unet.in_channels)),
                         jnp.zeros((1,), jnp.int32))["params"]

    def make_state():
        return TrainState.create(
            unet.apply, jax.tree_util.tree_map(jnp.copy, u_params),
            make_diffusion_optimizer(build_lr_schedule("multistep", 1e-3, 1, 1)),
        )

    rng = jax.random.PRNGKey(7)
    sf = jnp.float32(1.0)

    def encode(ae_params, v, r_):
        return ae.apply({"params": ae_params}, v,
                        method="encode_stage_2_inputs", rngs={"sample": r_})

    # unsharded reference: same math, same per-row keys, full __call__
    def ref_loss(params, ae_params, batch, sf, rng):
        total = 0.0
        rb = vol[0] // n_data
        for di in range(n_data):
            row = {k: v[di * rb:(di + 1) * rb] for k, v in batch.items()}
            rng_vol = jax.random.fold_in(rng, di)
            rng_zl, rng_zi, rng_n, rng_t, _ = jax.random.split(rng_vol, 5)
            images = jnp.clip(row["image"], 0.0, 1.0)
            labels = jnp.clip(row["label"], 0.0, 1.0)
            z = jax.lax.stop_gradient(encode(ae_params, labels, rng_zl)) * sf
            cond = jax.lax.stop_gradient(encode(ae_params, images, rng_zi))
            noise = jax.random.normal(rng_n, z.shape, jnp.float32).astype(z.dtype)
            ts = jax.random.randint(rng_t, (rb,), 0, sched.num_train_timesteps)
            model_in = inferer.noise_prediction_inputs(sched, z, noise, ts, cond)
            pred = unet.apply({"params": params}, model_in, ts)
            target = inferer.training_targets(sched, z, noise, ts)
            total = total + _stage2_mse(pred, target, ts, sched, s2cfg,
                                        reduce="sum") / (pred.size * n_data)
        return total

    ref_state = make_state()
    loss_ref, grads_ref = jax.value_and_grad(ref_loss)(
        ref_state.params, ae_vars["params"], batch, sf, rng)
    ref_state = ref_state.apply_gradients(grads_ref)

    step = make_stage2_train_step_pp(unet, ae, sched, s2cfg, mesh,
                                     num_microbatches=2)
    with mesh:
        pp_state = shard_train_state_pp(make_state(), mesh)
        pp_batch = shard_batch(mesh, batch)
        pp_state, metrics = step(pp_state, ae_vars["params"], pp_batch, sf, rng)

    np.testing.assert_allclose(float(metrics["diffusion_loss"]), float(loss_ref),
                               rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(ref_state.params),
                    jax.tree_util.tree_leaves(pp_state.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-4)

    # the stack's params stay physically sharded over 'stage' after the step
    k = pp_state.params["mid_stack"]["res"]["conv1"]["kernel"]
    assert k.addressable_shards[0].data.shape[0] == 4 // n_stage, k.sharding
    moment = [a for a in jax.tree_util.tree_leaves(pp_state.opt_state)
              if getattr(a, "shape", None) == k.shape]
    assert moment and all(
        m.addressable_shards[0].data.shape[0] == 4 // n_stage for m in moment)


def test_pp_state_shards_ema_and_remat_step_runs(eight_devices):
    """--pipeline with --ema-decay keeps the stack's EMA sharded 1/S through
    a remat'd train step (the fsdp-style constrain_ema hazard, found in
    review: propagation could hand back a replicated full-size EMA)."""
    from ldm3d_tpu.diffusion import DDPMScheduler
    from ldm3d_tpu.training import (
        Stage2Config,
        TrainState,
        build_lr_schedule,
        make_diffusion_optimizer,
    )
    from ldm3d_tpu.training.stage2 import make_stage2_train_step_pp

    n_stage = 4
    mesh = create_mesh(MeshSpec(data=2, stage=n_stage), devices=eight_devices)
    cfg = load_json(preset_path("config_tiny_cpu.json"))
    r = ConfigResolver(cfg)
    ae = r.instantiate("autoencoder_def")
    unet = r.instantiate("diffusion_def").clone(mid_depth=4, remat=True)
    sched = DDPMScheduler.create(num_train_timesteps=16)

    vol = (4, 16, 16, 16, 1)
    x = jax.random.uniform(RNG, vol, jnp.float32)
    ae_vars = ae.init({"params": RNG, "sample": RNG}, x[:1])
    latent = tuple(s // ae.downsample_factor for s in vol[1:4])
    u_params = unet.init(RNG, jnp.zeros((1, *latent, unet.in_channels)),
                         jnp.zeros((1,), jnp.int32))["params"]
    state = TrainState.create(
        unet.apply, u_params,
        make_diffusion_optimizer(build_lr_schedule("multistep", 1e-3, 1, 1)),
        ema_decay=0.99)

    step = make_stage2_train_step_pp(unet, ae, sched, Stage2Config(), mesh,
                                     num_microbatches=2)
    with mesh:
        state = shard_train_state_pp(state, mesh)
        batch = shard_batch(mesh, {"image": x, "label": x})
        state, metrics = step(state, ae_vars["params"], batch, jnp.float32(1.0),
                              jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["diffusion_loss"]))
    e = state.ema_params["mid_stack"]["res"]["conv1"]["kernel"]
    assert e.addressable_shards[0].data.shape[0] == 4 // n_stage, e.sharding


def test_cli_train_diffusion_pipeline(tmp_path):
    """End-to-end --pipeline run through the stage-2 trainer CLI: mid_depth
    config, dp x pp mesh, sharded-state checkpointing, resume template —
    the full integration the unit tests can't see."""
    import json

    from scaffolds import make_two_stage_checkpoints, write_env_json

    from ldm3d_tpu.ckpt import CheckpointManager, StageArtifacts
    from ldm3d_tpu.cli.train_diffusion import main as train_main
    from ldm3d_tpu.configs import load_json, preset_path

    _, model_dir = make_two_stage_checkpoints(tmp_path)
    cfg = load_json(preset_path("config_tiny_cpu.json"))
    cfg["diffusion_def"]["mid_depth"] = 2
    cfg["diffusion_train"]["max_epochs"] = 1
    cfg_path = tmp_path / "config_pp.json"
    cfg_path.write_text(json.dumps(cfg))
    env = write_env_json(tmp_path / "env.json", model_dir, tmp_path,
                         synthetic_data=True, synthetic_num=16, seed=5)

    best = train_main(["-c", str(cfg_path), "-e", env, "-g", "8",
                       "--pipeline", "2", "--no-images", "--max-epochs", "1"])
    assert np.isfinite(best)
    ckpt = CheckpointManager(model_dir, StageArtifacts.DIFFUSION)
    assert ckpt.exists("last")
    # the scaffold pre-creates a 'best' with meta {scale_factor: 1.0} only —
    # assert the TRAINER's validation overwrote it (val_loss/epoch present),
    # not just that a file exists (vacuous otherwise, found in review)
    meta = ckpt.load_meta("best")
    assert "val_loss" in meta and meta["val_loss"] == best, meta


def test_pp_step_rejects_bad_mid_depth(eight_devices):
    from ldm3d_tpu.diffusion import DDPMScheduler
    from ldm3d_tpu.training import Stage2Config
    from ldm3d_tpu.training.stage2 import make_stage2_train_step_pp

    mesh = create_mesh(MeshSpec(data=2, stage=4), devices=eight_devices)
    cfg = load_json(preset_path("config_tiny_cpu.json"))
    r = ConfigResolver(cfg)
    with pytest.raises(ValueError, match="mid_depth"):
        make_stage2_train_step_pp(
            r.instantiate("diffusion_def"),  # mid_depth=0
            r.instantiate("autoencoder_def"),
            DDPMScheduler.create(num_train_timesteps=16), Stage2Config(), mesh, 2)
