"""Tensor (weight) parallelism over the 'model' mesh axis — GSPMD sharding.

Parameters' output-channel dims are annotated with NamedShardings and the
SPMD partitioner propagates them; these tests pin forward/grad exactness vs
the unsharded model and that the big kernels actually shard (1/m per-device
weight + optimizer memory). The reference has no TP/ZeRO of any kind
(SURVEY.md section 2.3).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from ldm3d_tpu.configs import ConfigResolver, load_json, preset_path
from ldm3d_tpu.parallel import (
    MeshSpec,
    create_mesh,
    shard_params_tp,
    shard_train_state_tp,
    tp_sharding_tree,
)

RNG = jax.random.PRNGKey(0)


@pytest.fixture(scope="module")
def mesh2x4(eight_devices):
    return create_mesh(MeshSpec(data=2, model=4, spatial=1), devices=eight_devices)


@pytest.fixture(scope="module")
def tiny_unet():
    cfg = load_json(preset_path("config_tiny_cpu.json"))
    return ConfigResolver(cfg).instantiate("diffusion_def")


def _init_params(unet):
    z = jnp.zeros((1, 8, 8, 8, unet.in_channels))
    params = unet.init(RNG, z, jnp.zeros((1,), jnp.int32))["params"]
    # zero-init output conv would make parity vacuous
    params["conv_out"] = dict(
        params["conv_out"],
        kernel=jax.random.normal(RNG, params["conv_out"]["kernel"].shape) * 0.1,
    )
    return params


def test_tp_shards_large_kernels(mesh2x4, tiny_unet):
    # min_shard_channels=1: the tiny test UNet's 16/32-wide kernels are below
    # the production floor (which keeps e.g. the flagship's 16-wide zero-init
    # output conv replicated) — this test checks the MECHANISM
    params = _init_params(tiny_unet)
    tree = tp_sharding_tree(params, mesh2x4, min_shard_channels=1)
    sharded = [s for s in jax.tree_util.tree_leaves(tree) if s.spec != P()]
    assert len(sharded) > 30  # the conv/dense kernels
    for s in sharded:
        assert s.spec[-1] == "model"


def test_tp_floor_keeps_narrow_outputs_replicated(mesh2x4, tiny_unet):
    """The production floor: out-channel dims below min_shard_channels per
    device stay replicated (the module docstring's zero-init-output-conv
    rule). For the tiny UNet on model=4 every kernel is below the default
    floor, so nothing shards."""
    import numpy as np

    from ldm3d_tpu.parallel.tensor import tp_spec_for

    assert tp_spec_for((), np.zeros((3, 3, 3, 32, 16)), 2) == P()   # 8/dev
    assert tp_spec_for((), np.zeros((3, 3, 3, 32, 64)), 2) != P()   # 32/dev
    assert tp_spec_for((), np.zeros((3, 3, 3, 32, 64)), 8) == P()   # 8/dev


def test_tp_forward_matches(mesh2x4, tiny_unet):
    unet = tiny_unet
    params = _init_params(unet)
    z = jax.random.normal(RNG, (2, 8, 8, 8, unet.in_channels), jnp.float32)
    t = jnp.array([3, 7], jnp.int32)
    ref = unet.apply({"params": params}, z, t)
    assert float(jnp.abs(ref).max()) > 0

    batch_sh = NamedSharding(mesh2x4, P("data"))
    fn = jax.jit(lambda p, z, t: unet.apply({"params": p}, z, t),
                 in_shardings=(tp_sharding_tree(params, mesh2x4), batch_sh, batch_sh))
    with mesh2x4:
        out = fn(shard_params_tp(params, mesh2x4),
                 jax.device_put(z, batch_sh), jax.device_put(t, batch_sh))
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=5e-5)


def test_tp_train_step_matches_unsharded(mesh2x4, tiny_unet):
    """One full stage-2 step with TP-sharded state must match the unsharded
    update (same rng => identical noise/timesteps; only layouts differ)."""
    from ldm3d_tpu.diffusion import DDPMScheduler
    from ldm3d_tpu.training import (
        Stage2Config,
        TrainState,
        build_lr_schedule,
        make_diffusion_optimizer,
        make_stage2_train_step,
    )

    cfg = load_json(preset_path("config_tiny_cpu.json"))
    r = ConfigResolver(cfg)
    ae = r.instantiate("autoencoder_def")
    unet = tiny_unet
    rng = jax.random.PRNGKey(5)
    x = jax.random.uniform(rng, (2, 32, 32, 32, 1), jnp.float32)
    ae_vars = ae.init({"params": rng, "sample": rng}, x[:1])
    u_params = _init_params(unet)
    sched = DDPMScheduler.create(num_train_timesteps=16)

    def make_state():
        return TrainState.create(
            unet.apply, jax.tree_util.tree_map(jnp.copy, u_params),
            make_diffusion_optimizer(build_lr_schedule("multistep", 1e-3, 1, 1)),
        )

    step = make_stage2_train_step(unet, ae, sched, Stage2Config())
    batch = {"image": x, "label": x}

    ref_state, ref_m = step(make_state(), ae_vars["params"], batch, jnp.float32(1.0), rng)

    with mesh2x4:
        tp_state = shard_train_state_tp(make_state(), mesh2x4)
        tp_state, tp_m = step(tp_state, ae_vars["params"], batch, jnp.float32(1.0), rng)
    np.testing.assert_allclose(float(ref_m["diffusion_loss"]), float(tp_m["diffusion_loss"]), rtol=1e-4)
    # updated params identical up to reduction order
    for a, b in zip(jax.tree_util.tree_leaves(ref_state.params),
                    jax.tree_util.tree_leaves(tp_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
