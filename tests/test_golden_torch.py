"""Golden-value parity vs torch CPU primitives.

The reference's networks are MONAI modules built from ``torch.nn.Conv3d``,
``torch.nn.GroupNorm`` and scaled-dot-product attention. These tests load the
SAME weights into our NDHWC Flax blocks and assert numerical agreement,
pinning the cross-framework math (SURVEY.md section 7 "hard parts" item 3:
loss/layer parity needs golden-value tests against small torch runs).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from ldm3d_tpu.losses import kl_loss, l1_loss, l2_loss, lsgan_discriminator_loss, lsgan_generator_loss
from ldm3d_tpu.nn.blocks import Conv3D, GroupNorm32
from ldm3d_tpu.ops.attention import volumetric_attention

RNG = np.random.default_rng(0)


def _to_ndhwc(x_ncdhw: np.ndarray) -> np.ndarray:
    return np.transpose(x_ncdhw, (0, 2, 3, 4, 1))


def _torch_conv_weights_to_flax(w: torch.Tensor) -> np.ndarray:
    # torch (O, I, D, H, W) -> flax/lax (D, H, W, I, O)
    return np.transpose(w.detach().numpy(), (2, 3, 4, 1, 0))


@pytest.mark.parametrize("stride,pad", [(1, 1), (2, (0, 1))])
def test_conv3d_matches_torch(stride, pad):
    x = RNG.standard_normal((2, 6, 10, 10, 10), dtype=np.float32)  # NCDHW
    tconv = torch.nn.Conv3d(6, 8, 3, stride=stride, padding=0)
    with torch.no_grad():
        xt = torch.from_numpy(x)
        if pad == 1:
            xt = torch.nn.functional.pad(xt, (1, 1, 1, 1, 1, 1))
        else:
            xt = torch.nn.functional.pad(xt, (0, 1, 0, 1, 0, 1))
        ref = tconv(xt).numpy()

    conv = Conv3D(8, kernel=3, stride=stride, padding="same" if pad == 1 else "down")
    params = {
        "kernel": jnp.asarray(_torch_conv_weights_to_flax(tconv.weight)),
        "bias": jnp.asarray(tconv.bias.detach().numpy()),
    }
    out = conv.apply({"params": params}, jnp.asarray(_to_ndhwc(x)))
    np.testing.assert_allclose(_to_ndhwc(ref), np.asarray(out), atol=1e-4)


def test_groupnorm_matches_torch():
    x = RNG.standard_normal((2, 12, 6, 6, 6), dtype=np.float32) * 2 + 0.5  # NCDHW
    tgn = torch.nn.GroupNorm(4, 12, eps=1e-6)
    with torch.no_grad():
        tgn.weight.copy_(torch.from_numpy(RNG.standard_normal(12).astype(np.float32)))
        tgn.bias.copy_(torch.from_numpy(RNG.standard_normal(12).astype(np.float32)))
        ref = tgn(torch.from_numpy(x)).numpy()

    gn = GroupNorm32(4, epsilon=1e-6)
    params = {
        "scale": jnp.asarray(tgn.weight.detach().numpy()),
        "bias": jnp.asarray(tgn.bias.detach().numpy()),
    }
    out = gn.apply({"params": params}, jnp.asarray(_to_ndhwc(x)))
    np.testing.assert_allclose(_to_ndhwc(ref), np.asarray(out), atol=1e-4)


def test_attention_matches_torch_sdpa():
    b, n, h, d = 2, 64, 4, 16
    q = RNG.standard_normal((b, n, h, d), dtype=np.float32)
    k = RNG.standard_normal((b, n, h, d), dtype=np.float32)
    v = RNG.standard_normal((b, n, h, d), dtype=np.float32)
    with torch.no_grad():
        ref = torch.nn.functional.scaled_dot_product_attention(
            torch.from_numpy(q).permute(0, 2, 1, 3),
            torch.from_numpy(k).permute(0, 2, 1, 3),
            torch.from_numpy(v).permute(0, 2, 1, 3),
        ).permute(0, 2, 1, 3).numpy()
    out = volumetric_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), use_flash=False)
    np.testing.assert_allclose(ref, np.asarray(out), atol=1e-5)


def test_losses_match_torch():
    x = RNG.standard_normal((2, 1, 8, 8, 8), dtype=np.float32)
    y = RNG.standard_normal((2, 1, 8, 8, 8), dtype=np.float32)
    xt, yt = torch.from_numpy(x), torch.from_numpy(y)

    np.testing.assert_allclose(
        float(torch.nn.functional.l1_loss(xt, yt)), float(l1_loss(jnp.asarray(x), jnp.asarray(y))), rtol=1e-6
    )
    np.testing.assert_allclose(
        float(torch.nn.functional.mse_loss(xt, yt)), float(l2_loss(jnp.asarray(x), jnp.asarray(y))), rtol=1e-6
    )

    # KL with the reference's formulation (utils.py:249-262): per-sample sum of
    # 0.5*(mu^2 + sigma^2 - log sigma^2 - 1), averaged over batch
    mu = RNG.standard_normal((2, 4, 2, 2, 2), dtype=np.float32) * 0.3
    sigma = np.abs(RNG.standard_normal((2, 4, 2, 2, 2), dtype=np.float32)) + 0.5
    mut, st = torch.from_numpy(mu), torch.from_numpy(sigma)
    ref_kl = 0.5 * (mut.pow(2) + st.pow(2) - torch.log(st.pow(2)) - 1).sum(dim=[1, 2, 3, 4]).mean()
    np.testing.assert_allclose(float(ref_kl), float(kl_loss(jnp.asarray(mu), jnp.asarray(sigma))), rtol=1e-5)

    # LSGAN (MONAI PatchAdversarialLoss least_squares): MSE vs 1/0 targets
    logits_fake = RNG.standard_normal((2, 1, 4, 4, 4), dtype=np.float32)
    logits_real = RNG.standard_normal((2, 1, 4, 4, 4), dtype=np.float32)
    lf, lr = torch.from_numpy(logits_fake), torch.from_numpy(logits_real)
    g_ref = torch.nn.functional.mse_loss(lf, torch.ones_like(lf))
    d_ref = 0.5 * (
        torch.nn.functional.mse_loss(lf, torch.zeros_like(lf))
        + torch.nn.functional.mse_loss(lr, torch.ones_like(lr))
    )
    np.testing.assert_allclose(float(g_ref), float(lsgan_generator_loss(jnp.asarray(logits_fake))), rtol=1e-5)
    np.testing.assert_allclose(
        float(d_ref),
        float(lsgan_discriminator_loss(jnp.asarray(logits_fake), jnp.asarray(logits_real))),
        rtol=1e-5,
    )
