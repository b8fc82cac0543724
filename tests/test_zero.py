"""ZeRO-1 optimizer-state sharding over the 'data' axis (parallel/zero.py).

Pins three properties: (a) the spec rule shards the largest free dim and
composes with the tensor-parallel spec, (b) a zero-sharded TrainState takes
the SAME update as an unsharded one (layout-only transform), (c) the moment
buffers actually live sharded after a jitted step — the 1/N memory claim.
The reference lists ZeRO/FSDP only as future work (README_MULTIGPU.md:200-204).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import PartitionSpec as P

from ldm3d_tpu.configs import ConfigResolver, load_json, preset_path
from ldm3d_tpu.parallel import (
    MeshSpec,
    create_mesh,
    shard_batch,
    shard_train_state_zero,
    zero_spec_for,
)
from ldm3d_tpu.training import TrainState

RNG = jax.random.PRNGKey(0)


@pytest.fixture(scope="module")
def mesh8(eight_devices):
    return create_mesh(MeshSpec(data=8), devices=eight_devices)


def test_zero_spec_rules():
    big = jnp.zeros((3, 3, 3, 16, 64))
    assert zero_spec_for(big, 8) == P(None, None, None, "data", None) or \
        zero_spec_for(big, 8) == P(None, None, None, None, "data")
    # largest divisible dim wins: 64 > 16
    assert zero_spec_for(big, 8)[-1] == "data"
    # bias: nothing divisible and >= 2*n -> replicated
    assert zero_spec_for(jnp.zeros((8,)), 8) == P(None)
    # TP composition: last dim taken by 'model', zero picks another
    spec = zero_spec_for(jnp.zeros((48, 64)), 8, base=P(None, "model"))
    assert spec == P("data", "model")


def test_zero_state_parity_and_layout(mesh8):
    """Same updates as unsharded; moments physically sharded over data."""
    params = {
        "w": jax.random.normal(RNG, (48, 64), jnp.float32),
        "b": jnp.zeros((64,), jnp.float32),
    }
    tx = optax.adam(1e-2)

    def make_state():
        return TrainState.create(lambda p, x: x @ p["w"] + p["b"],
                                 jax.tree_util.tree_map(jnp.copy, params), tx)

    x = jax.random.normal(jax.random.PRNGKey(1), (16, 48), jnp.float32)
    y = jax.random.normal(jax.random.PRNGKey(2), (16, 64), jnp.float32)

    def loss_fn(p, x, y):
        return jnp.mean((x @ p["w"] + p["b"] - y) ** 2)

    @jax.jit
    def step(state, x, y):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, x, y)
        return state.apply_gradients(grads), loss

    ref = make_state()
    for _ in range(3):
        ref, ref_loss = step(ref, x, y)

    with mesh8:
        zs = shard_train_state_zero(make_state(), mesh8)
        batch = shard_batch(mesh8, {"x": x, "y": y})
        for _ in range(3):
            zs, z_loss = step(zs, batch["x"], batch["y"])

    np.testing.assert_allclose(float(ref_loss), float(z_loss), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(ref.params),
                    jax.tree_util.tree_leaves(zs.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    # the adam moments for 'w' (every leaf of w's shape) stay sharded over
    # 'data' after jitted steps: each device holds 1/8 of each moment
    moment_leaves = [a for a in jax.tree_util.tree_leaves(zs.opt_state)
                     if getattr(a, "shape", None) == (48, 64)]
    assert len(moment_leaves) >= 2  # adam mu and nu
    for m in moment_leaves:
        assert "data" in tuple(m.sharding.spec), m.sharding
        assert m.addressable_shards[0].data.size == m.size // 8
    # params remain replicated (every device holds the full tensor)
    w = zs.params["w"]
    assert w.addressable_shards[0].data.size == w.size


def test_zero_stage2_latents_step(mesh8):
    """Integration: the stage-2 latent-cache train step runs zero-sharded and
    matches the unsharded update (same rng)."""
    from ldm3d_tpu.diffusion import DDPMScheduler
    from ldm3d_tpu.training import (
        Stage2Config,
        build_lr_schedule,
        make_diffusion_optimizer,
        make_stage2_train_step_latents,
    )

    cfg = load_json(preset_path("config_tiny_cpu.json"))
    unet = ConfigResolver(cfg).instantiate("diffusion_def")
    z = jnp.zeros((1, 8, 8, 8, unet.in_channels))
    u_params = unet.init(RNG, z, jnp.zeros((1,), jnp.int32))["params"]
    sched = DDPMScheduler.create(num_train_timesteps=16)

    def make_state():
        return TrainState.create(
            unet.apply, jax.tree_util.tree_map(jnp.copy, u_params),
            make_diffusion_optimizer(build_lr_schedule("multistep", 1e-3, 1, 1)),
        )

    step = make_stage2_train_step_latents(unet, sched, Stage2Config())
    lat = unet.in_channels // 2
    rng = jax.random.PRNGKey(7)
    batch = {
        "label_mu": jax.random.normal(rng, (8, 8, 8, 8, lat), jnp.float32),
        "label_sigma": jnp.full((8, 8, 8, 8, lat), 0.1, jnp.float32),
        "image_mu": jax.random.normal(rng, (8, 8, 8, 8, lat), jnp.float32),
        "image_sigma": jnp.full((8, 8, 8, 8, lat), 0.1, jnp.float32),
    }

    ref_state, ref_m = step(make_state(), batch, jnp.float32(1.0), rng)

    with mesh8:
        zs = shard_train_state_zero(make_state(), mesh8)
        zb = shard_batch(mesh8, batch)
        zs, zm = step(zs, zb, jnp.float32(1.0), rng)

    np.testing.assert_allclose(float(ref_m["diffusion_loss"]),
                               float(zm["diffusion_loss"]), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(ref_state.params),
                    jax.tree_util.tree_leaves(zs.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_zero_composes_with_tensor_parallel(eight_devices):
    """data=4 x model=2: params TP-sharded on 'model', moments additionally
    ZeRO-sharded on 'data' — updates still match the unsharded run."""
    from ldm3d_tpu.parallel import shard_train_state_tp

    mesh = create_mesh(MeshSpec(data=4, model=2), devices=eight_devices)
    params = {
        "w": jax.random.normal(RNG, (48, 64), jnp.float32),
        "b": jnp.zeros((64,), jnp.float32),
    }
    tx = optax.adam(1e-2)

    def make_state():
        return TrainState.create(lambda p, x: x @ p["w"] + p["b"],
                                 jax.tree_util.tree_map(jnp.copy, params), tx)

    x = jax.random.normal(jax.random.PRNGKey(1), (16, 48), jnp.float32)
    y = jax.random.normal(jax.random.PRNGKey(2), (16, 64), jnp.float32)

    def loss_fn(p, x, y):
        return jnp.mean((x @ p["w"] + p["b"] - y) ** 2)

    @jax.jit
    def step(state, x, y):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, x, y)
        return state.apply_gradients(grads), loss

    ref = make_state()
    for _ in range(2):
        ref, _ = step(ref, x, y)

    with mesh:
        zs = shard_train_state_zero(shard_train_state_tp(make_state(), mesh), mesh)
        for _ in range(2):
            zs, _ = step(zs, x, y)

    for a, b in zip(jax.tree_util.tree_leaves(ref.params),
                    jax.tree_util.tree_leaves(zs.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    # the 'w' moments carry BOTH axes: P('data', 'model')
    moment_leaves = [a for a in jax.tree_util.tree_leaves(zs.opt_state)
                     if getattr(a, "shape", None) == (48, 64)]
    assert moment_leaves
    for m in moment_leaves:
        spec = tuple(m.sharding.spec)
        assert "data" in spec and "model" in spec, m.sharding
        assert m.addressable_shards[0].data.size == m.size // 8
