"""Model shape/structure tests (tiny configs, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldm3d_tpu.nn import (
    LPIPS,
    AutoencoderKL,
    DiffusionUNet3D,
    PatchDiscriminator3D,
    perceptual_loss_25d,
)


def tiny_ae(**kw):
    base = dict(
        in_channels=1, out_channels=1, latent_channels=4,
        channels=(8, 8, 16), num_res_blocks=(1, 1, 1),
        attention_levels=(False, False, True), norm_num_groups=4,
    )
    base.update(kw)
    return AutoencoderKL(**base)


def test_autoencoder_shapes():
    ae = tiny_ae()
    x = jnp.zeros((2, 16, 16, 16, 1))
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}
    variables = ae.init(rngs, x)
    recon, mu, sigma = ae.apply(variables, x, rngs={"sample": jax.random.PRNGKey(2)})
    assert recon.shape == x.shape
    # downsample factor 4 (2 stride-2 convs for 3 levels) — parity with
    # reference latent_shape = patch // 4 (inference.py:88)
    assert mu.shape == (2, 4, 4, 4, 4)
    assert sigma.shape == mu.shape
    assert np.all(np.asarray(sigma) > 0)


def test_autoencoder_stage2_contract():
    ae = tiny_ae()
    x = jnp.zeros((1, 16, 16, 16, 1))
    variables = ae.init({"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x)
    z = ae.apply(variables, x, method=ae.encode_stage_2_inputs, rngs={"sample": jax.random.PRNGKey(2)})
    assert z.shape == (1, 4, 4, 4, 4)
    out = ae.apply(variables, z, method=ae.decode_stage_2_outputs)
    assert out.shape == x.shape


def test_autoencoder_odd_sizes():
    """Asymmetric-padded downsample keeps floor(n/2) semantics for odd dims."""
    ae = tiny_ae()
    x = jnp.zeros((1, 20, 16, 24, 1))
    variables = ae.init({"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x)
    recon, mu, _ = ae.apply(variables, x, rngs={"sample": jax.random.PRNGKey(2)})
    assert mu.shape == (1, 5, 4, 6, 4)
    assert recon.shape == x.shape


def test_unet_shapes_concat_conditioning():
    unet = DiffusionUNet3D(
        in_channels=8, out_channels=4, channels=(8, 16, 16),
        attention_levels=(False, True, True), num_head_channels=(0, 8, 8),
        num_res_blocks=(1, 1, 1), norm_num_groups=4,
    )
    # in_channels 8 = 4 latent + 4 condition (concat mode, train_diffusion.py:197-205)
    x = jnp.zeros((2, 8, 8, 8, 8))
    t = jnp.array([0, 5])
    variables = unet.init(jax.random.PRNGKey(0), x, t)
    out = unet.apply(variables, x, t)
    assert out.shape == (2, 8, 8, 8, 4)


def test_unet_zero_init_output():
    unet = DiffusionUNet3D(
        in_channels=2, out_channels=2, channels=(8, 8, 8),
        attention_levels=(False, False, False), num_head_channels=(0, 0, 0),
        num_res_blocks=(1, 1, 1), norm_num_groups=4,
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 8, 2))
    t = jnp.array([3])
    variables = unet.init(jax.random.PRNGKey(0), x, t)
    out = unet.apply(variables, x, t)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_unet_timestep_sensitivity():
    unet = DiffusionUNet3D(
        in_channels=2, out_channels=2, channels=(8, 8, 8),
        attention_levels=(False, False, True), num_head_channels=(0, 0, 4),
        num_res_blocks=(1, 1, 1), norm_num_groups=4,
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 8, 2))
    variables = unet.init(jax.random.PRNGKey(0), x, jnp.array([0]))
    # perturb output conv so it isn't all-zero
    params = variables["params"]
    params = jax.tree_util.tree_map(lambda p: p + 0.01, params)
    o1 = unet.apply({"params": params}, x, jnp.array([1]))
    o2 = unet.apply({"params": params}, x, jnp.array([500]))
    assert not np.allclose(np.asarray(o1), np.asarray(o2))


def test_discriminator_feature_list():
    disc = PatchDiscriminator3D(num_layers_d=3, channels=4, in_channels=1, out_channels=1)
    x = jnp.zeros((2, 32, 32, 32, 1))
    variables = disc.init(jax.random.PRNGKey(0), x)
    feats = disc.apply(variables, x)
    # reference uses discriminator(x)[-1] as logits (train_autoencoder.py:410)
    assert len(feats) == 4
    assert feats[-1].shape == (2, 4, 4, 4, 1)
    assert feats[0].shape == (2, 16, 16, 16, 4)


def test_lpips_25d():
    lpips = LPIPS()
    x2d = jnp.zeros((2, 32, 32, 1))
    variables = lpips.init(jax.random.PRNGKey(0), x2d, x2d)

    def lpips_apply(a, b):
        return lpips.apply(variables, a, b)

    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 16, 16, 16, 1))
    y = jax.random.uniform(jax.random.PRNGKey(2), (1, 16, 16, 16, 1))
    same = perceptual_loss_25d(lpips_apply, x, x, jax.random.PRNGKey(3))
    diff = perceptual_loss_25d(lpips_apply, x, y, jax.random.PRNGKey(3))
    assert float(same) < 1e-6
    assert float(diff) > float(same)


def test_attention_block_heads():
    from ldm3d_tpu.nn.blocks import AttentionBlock3D

    blk = AttentionBlock3D(num_head_channels=4, num_groups=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 4, 8))
    variables = blk.init(jax.random.PRNGKey(1), x)
    out = blk.apply(variables, x)
    assert out.shape == x.shape
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.parametrize("impl", ["lhsdil", "polyphase"])
def test_upsample3d_fused_matches_naive(impl, monkeypatch):
    """BOTH fused upsample-conv forms (the default lhs_dilation transposed
    conv and the LDM3D_UPSAMPLE=polyphase fallback) must equal
    nearest-x2-repeat + SAME conv3^3 exactly — forward and gradients —
    including odd sizes. Same param tree, so checkpoints are interchangeable."""
    from flax import linen as fnn

    from ldm3d_tpu.nn.blocks import Upsample3D, _conv3

    if impl == "polyphase":
        monkeypatch.setenv("LDM3D_UPSAMPLE", "polyphase")
    else:
        monkeypatch.delenv("LDM3D_UPSAMPLE", raising=False)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 5, 6, 7, 12))
    up = Upsample3D(out_channels=9)
    params = up.init(rng, x)

    class Naive(fnn.Module):
        @fnn.compact
        def __call__(self, x):
            x = jnp.repeat(jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2), 2, axis=3)
            return _conv3(9, jnp.float32, name="conv")(x)

    ref = Naive().apply(params, x)
    out = up.apply(params, x)
    assert out.shape == (2, 10, 12, 14, 9)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    g_fused = jax.grad(lambda p: jnp.sum(up.apply(p, x) ** 2))(params)
    g_naive = jax.grad(lambda p: jnp.sum(Naive().apply(p, x) ** 2))(params)
    for vf, vn in zip(jax.tree_util.tree_leaves(g_fused), jax.tree_util.tree_leaves(g_naive)):
        np.testing.assert_allclose(np.asarray(vf), np.asarray(vn), rtol=1e-5, atol=1e-3)


def test_conv3d_small_out_factorized_matches_direct():
    """Conv3D's few-output-channel factorized fast path (matmul + shifted
    tap-sum, used for the VAE decoder's 64->1 output conv) must equal the
    direct lax conv exactly in fp32 — forward and gradients — for every F
    that engages the gate, including odd spatial sizes."""
    from ldm3d_tpu.nn.blocks import _CONV_DN, Conv3D

    rng = jax.random.PRNGKey(7)
    x = jax.random.normal(rng, (2, 5, 7, 6, 32))
    for feats in (1, 2, 4):
        conv = Conv3D(features=feats, kernel=3, padding="same")
        params = conv.init(rng, x)

        def direct(p, x):
            out = jax.lax.conv_general_dilated(
                x, p["params"]["kernel"], window_strides=(1, 1, 1),
                padding=((1, 1),) * 3, dimension_numbers=_CONV_DN)
            return out + p["params"]["bias"]

        out = conv.apply(params, x)
        ref = direct(params, x)
        assert out.shape == (2, 5, 7, 6, feats)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

        g_fast = jax.grad(lambda p: jnp.sum(conv.apply(p, x) ** 2))(params)
        g_ref = jax.grad(lambda p: jnp.sum(direct(p, x) ** 2))(params)
        for vf, vr in zip(jax.tree_util.tree_leaves(g_fast),
                          jax.tree_util.tree_leaves(g_ref)):
            np.testing.assert_allclose(np.asarray(vf), np.asarray(vr),
                                       rtol=1e-5, atol=1e-3)


def test_groupnorm_custom_vjp_matches_autodiff():
    """GroupNorm32's closed-form backward (_gn_affine_bwd: MXU-dot
    reductions) must match plain autodiff of the same math — dx, dscale,
    dbias — in fp32 to rounding, for uneven group content and a
    non-trivial upstream cotangent."""
    from ldm3d_tpu.nn.blocks import _gn_affine

    g, eps = 4, 1e-6
    rng = jax.random.PRNGKey(11)
    x = jax.random.normal(rng, (2, 5, 6, 7, 8), jnp.float32) * 3.0 + 0.7
    scale = jax.random.normal(jax.random.PRNGKey(12), (8,), jnp.float32)
    bias = jax.random.normal(jax.random.PRNGKey(13), (8,), jnp.float32)
    ct = jax.random.normal(jax.random.PRNGKey(14), x.shape, jnp.float32)

    def ref(x, scale, bias):
        b, c = x.shape[0], x.shape[-1]
        xf = x.reshape(b, -1, c).astype(jnp.float32)
        grouped = xf.reshape(b, xf.shape[1], g, c // g)
        mean = grouped.mean(axis=(1, 3))
        var = grouped.var(axis=(1, 3))
        inv = jax.lax.rsqrt(var + eps)
        mean_c = jnp.repeat(mean, c // g, -1)[:, None, :]
        inv_c = jnp.repeat(inv, c // g, -1)[:, None, :]
        y = (xf - mean_c) * inv_c * scale[None, None, :] + bias[None, None, :]
        return y.reshape(x.shape)

    def loss_custom(x, s, b):
        return jnp.sum(_gn_affine(x, s, b, g, eps) * ct)

    def loss_ref(x, s, b):
        return jnp.sum(ref(x, s, b) * ct)

    out_c = _gn_affine(x, scale, bias, g, eps)
    out_r = ref(x, scale, bias)
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(out_r), atol=1e-4)

    gc = jax.grad(loss_custom, argnums=(0, 1, 2))(x, scale, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_ in zip(gc, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-4)

    # bf16 path: outputs and grads stay finite and close to the fp32 ones
    xb = x.astype(jnp.bfloat16)
    out_b = _gn_affine(xb, scale, bias, g, eps)
    np.testing.assert_allclose(np.asarray(out_b, dtype=np.float32),
                               np.asarray(out_r), atol=0.1)
    gb = jax.grad(lambda x, s, b: jnp.sum(
        _gn_affine(x, s, b, g, eps).astype(jnp.float32) * ct),
        argnums=(0, 1, 2))(xb, scale, bias)
    for a, b_ in zip(gb, gr):
        np.testing.assert_allclose(np.asarray(a, dtype=np.float32),
                                   np.asarray(b_), rtol=0.1, atol=0.15)
