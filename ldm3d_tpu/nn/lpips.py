"""2.5D perceptual (LPIPS-SqueezeNet) loss network.

Capability parity with ``monai.losses.PerceptualLoss(spatial_dims=3,
network_type="squeeze", is_fake_3d=True, fake_3d_ratio=0.2)`` as used by the
reference stage-1 trainer (``train_autoencoder.py:236``): 3D volumes are
scored by a 2D LPIPS network applied to a random subset of slices along each
anatomical axis ("2.5D"), averaged over the three axes.

The feature extractor is SqueezeNet v1.1 in Flax (NHWC). Pretrained torch
weights cannot be downloaded in this environment; by default the extractor
uses a fixed-seed random initialization, which still yields a useful
perceptual-style training signal (random-feature perceptual losses are a
documented stand-in; run ``python tools/convert_lpips.py --download`` on a
machine with network egress to convert the real pretrained weights — the
conversion is golden-tested for exact parity (tests/test_lpips_parity.py).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

__all__ = ["LPIPS", "SqueezeNetFeatures", "perceptual_loss_25d"]

# channel widths of the 7 LPIPS-squeeze feature stages
_SQUEEZE_STAGE_CHANNELS = (64, 128, 256, 384, 384, 512, 512)


class _Fire(nn.Module):
    squeeze: int
    expand: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        s = nn.relu(nn.Conv(self.squeeze, (1, 1), dtype=self.dtype, param_dtype=jnp.float32, name="squeeze")(x))
        e1 = nn.Conv(self.expand, (1, 1), dtype=self.dtype, param_dtype=jnp.float32, name="expand1")(s)
        e3 = nn.Conv(self.expand, (3, 3), padding="SAME", dtype=self.dtype, param_dtype=jnp.float32, name="expand3")(s)
        return nn.relu(jnp.concatenate([e1, e3], axis=-1))


def _maxpool(x: jax.Array) -> jax.Array:
    """torch ``MaxPool2d(3, stride=2, ceil_mode=True)`` parity.

    torch computes ``out = ceil((n - 3) / 2) + 1`` with no left padding and
    windows allowed to run off the right/bottom edge; we reproduce that by
    right-padding with -inf (amount derived from the static shape) and pooling
    VALID. Output size is floored at 1 so degenerate <=2-pixel maps (from very
    small test volumes, below torch's own minimum input) stay usable; for any
    size torch accepts the two implementations agree exactly, so converted
    pretrained torch weights see identical feature maps.
    """
    pads = []
    for n in (x.shape[1], x.shape[2]):
        out = max(1, -((3 - n) // 2) + 1)  # ceil((n-3)/2) + 1, floored at 1
        pads.append(max(0, (out - 1) * 2 + 3 - n))
    if any(pads):
        x = jnp.pad(
            x,
            ((0, 0), (0, pads[0]), (0, pads[1]), (0, 0)),
            constant_values=-jnp.inf,
        )
    return nn.max_pool(x, window_shape=(3, 3), strides=(2, 2), padding="VALID")


class SqueezeNetFeatures(nn.Module):
    """SqueezeNet v1.1 trunk returning the 7 LPIPS feature stages (NHWC)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> list[jax.Array]:
        feats = []
        # torchvision squeezenet1_1 features[0] is Conv2d(3, 64, 3, stride=2)
        # with padding=0 — VALID, not flax's default SAME.
        h = nn.relu(
            nn.Conv(
                64, (3, 3), strides=(2, 2), padding="VALID",
                dtype=self.dtype, param_dtype=jnp.float32, name="conv1",
            )(x)
        )
        feats.append(h)  # stage 1
        h = _maxpool(h)
        h = _Fire(16, 64, self.dtype, name="fire2")(h)
        h = _Fire(16, 64, self.dtype, name="fire3")(h)
        feats.append(h)  # stage 2
        h = _maxpool(h)
        h = _Fire(32, 128, self.dtype, name="fire4")(h)
        h = _Fire(32, 128, self.dtype, name="fire5")(h)
        feats.append(h)  # stage 3
        h = _maxpool(h)
        h = _Fire(48, 192, self.dtype, name="fire6")(h)
        feats.append(h)  # stage 4
        h = _Fire(48, 192, self.dtype, name="fire7")(h)
        feats.append(h)  # stage 5
        h = _Fire(64, 256, self.dtype, name="fire8")(h)
        feats.append(h)  # stage 6
        h = _Fire(64, 256, self.dtype, name="fire9")(h)
        feats.append(h)  # stage 7
        return feats


class LPIPS(nn.Module):
    """LPIPS distance between batches of 2D images ``(B, H, W, C<=3)``."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, y: jax.Array) -> jax.Array:
        # LPIPS input convention: 3-channel, [-1, 1], channel-standardized.
        shift = jnp.asarray([-0.030, -0.088, -0.188], jnp.float32)
        scale = jnp.asarray([0.458, 0.448, 0.450], jnp.float32)

        def _prep(img):
            if img.shape[-1] == 1:
                img = jnp.repeat(img, 3, axis=-1)
            img = img.astype(jnp.float32) * 2.0 - 1.0  # inputs are [0,1] volumes
            return ((img - shift) / scale).astype(self.dtype)

        net = SqueezeNetFeatures(self.dtype, name="squeeze")
        fx = net(_prep(x))
        fy = net(_prep(y))
        total = jnp.zeros((x.shape[0],), jnp.float32)
        for i, (a, b) in enumerate(zip(fx, fy)):
            a32, b32 = a.astype(jnp.float32), b.astype(jnp.float32)
            # lpips normalize_tensor: feat / (||feat||_2 + 1e-10), channel-wise
            a_n = a32 / (jnp.sqrt(jnp.sum(a32**2, axis=-1, keepdims=True)) + 1e-10)
            b_n = b32 / (jnp.sqrt(jnp.sum(b32**2, axis=-1, keepdims=True)) + 1e-10)
            diff = (a_n - b_n) ** 2
            w = self.param(f"lin_{i}", nn.initializers.ones, (diff.shape[-1],), jnp.float32)
            # lpips "lin" layer: nonneg 1x1 conv -> spatial mean
            contrib = jnp.mean(jnp.sum(diff * jax.nn.relu(w)[None, None, None, :], axis=-1), axis=(1, 2))
            total = total + contrib
        return total  # (B,)


def _slices_along_axis(vol: jax.Array, axis: int, idx: jax.Array) -> jax.Array:
    """Gather slices of a ``(B, D, H, W, C)`` volume -> ``(B*K, h, w, C)``."""
    vol = jnp.moveaxis(vol, 1 + axis, 1)  # slicing axis to front of spatial dims
    sl = jnp.take(vol, idx, axis=1)  # (B, K, h, w, C)
    b, k = sl.shape[0], sl.shape[1]
    return sl.reshape(b * k, *sl.shape[2:])


def perceptual_loss_25d(
    lpips_apply,
    x: jax.Array,
    y: jax.Array,
    rng: jax.Array,
    fake_3d_ratio: float = 0.2,
) -> jax.Array:
    """2.5D perceptual loss between volumes ``(B, D, H, W, C)``.

    For each axis, a random ``ceil(ratio * n)`` subset of slices (static count,
    jit-friendly) is scored by ``lpips_apply`` and the three axis losses are
    averaged — mirroring MONAI's fake-3D behavior.
    """
    losses = []
    for axis in range(3):
        n = x.shape[1 + axis]
        k = max(1, math.ceil(fake_3d_ratio * n))
        rng, sub = jax.random.split(rng)
        idx = jax.random.choice(sub, n, shape=(k,), replace=False)
        xs = _slices_along_axis(x, axis, idx)
        ys = _slices_along_axis(y, axis, idx)
        losses.append(jnp.mean(lpips_apply(xs, ys)))
    return jnp.mean(jnp.stack(losses))
