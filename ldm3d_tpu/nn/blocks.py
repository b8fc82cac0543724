"""Shared Flax building blocks for the 3D VAE / diffusion UNet.

TPU-first conventions used throughout the model zoo:
  * activations are NDHWC (channels-last) so XLA tiles convs onto the MXU,
  * ``dtype`` is the compute dtype (bf16 on TPU), ``param_dtype`` stays fp32,
  * normalization statistics and softmax always accumulate in fp32, which is
    what lets us drop the reference's NaN-guard machinery
    (reference ``3d_ldm/train_autoencoder.py:353-437`` and NaN_FIX_GUIDE.md).

Capability parity targets: MONAI's ResBlock / AttentionBlock / Upsample /
Downsample as used by ``monai.networks.nets.AutoencoderKL`` and
``DiffusionModelUNet`` (reference config ``config_train_32g.json:7-49``).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ldm3d_tpu.ops.attention import volumetric_attention

Dtype = Any

__all__ = [
    "GroupNorm32",
    "ResBlock3D",
    "TimeResBlock3D",
    "AttentionBlock3D",
    "Downsample3D",
    "Upsample3D",
    "sinusoidal_time_embedding",
    "TimestepEmbedding",
]


class GroupNorm32(nn.Module):
    """GroupNorm that normalizes in fp32 regardless of compute dtype."""

    num_groups: int = 32
    epsilon: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        orig_dtype = x.dtype
        x = x.astype(jnp.float32)
        x = nn.GroupNorm(num_groups=self.num_groups, epsilon=self.epsilon, dtype=jnp.float32, param_dtype=jnp.float32)(x)
        return x.astype(orig_dtype)


def _conv3(features: int, dtype: Dtype, name: str | None = None, kernel: int = 3, zero_init: bool = False) -> nn.Conv:
    return nn.Conv(
        features=features,
        kernel_size=(kernel, kernel, kernel),
        padding="SAME" if kernel > 1 else "VALID",
        dtype=dtype,
        param_dtype=jnp.float32,
        kernel_init=nn.initializers.zeros if zero_init else nn.initializers.lecun_normal(),
        name=name,
    )


class ResBlock3D(nn.Module):
    """norm -> silu -> conv -> norm -> silu -> conv with 1x1 shortcut."""

    out_channels: int
    num_groups: int = 32
    norm_eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = GroupNorm32(self.num_groups, self.norm_eps, name="norm1")(x)
        h = nn.silu(h)
        h = _conv3(self.out_channels, self.dtype, name="conv1")(h)
        h = GroupNorm32(self.num_groups, self.norm_eps, name="norm2")(h)
        h = nn.silu(h)
        h = _conv3(self.out_channels, self.dtype, name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = _conv3(self.out_channels, self.dtype, name="shortcut", kernel=1)(x)
        return x + h


class TimeResBlock3D(nn.Module):
    """ResBlock with an additive timestep-embedding projection (UNet variant)."""

    out_channels: int
    num_groups: int = 32
    norm_eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, temb: jax.Array) -> jax.Array:
        h = GroupNorm32(self.num_groups, self.norm_eps, name="norm1")(x)
        h = nn.silu(h)
        h = _conv3(self.out_channels, self.dtype, name="conv1")(h)
        t = nn.silu(temb)
        t = nn.Dense(self.out_channels, dtype=self.dtype, param_dtype=jnp.float32, name="time_proj")(t)
        h = h + t[:, None, None, None, :]
        h = GroupNorm32(self.num_groups, self.norm_eps, name="norm2")(h)
        h = nn.silu(h)
        h = _conv3(self.out_channels, self.dtype, name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = _conv3(self.out_channels, self.dtype, name="shortcut", kernel=1)(x)
        return x + h


class AttentionBlock3D(nn.Module):
    """Spatial self-attention over the flattened D*H*W token axis.

    Mirrors the capability of MONAI's AttentionBlock (used at
    ``attention_levels`` of both networks); the matmuls run through
    :func:`ldm3d_tpu.ops.volumetric_attention` (Pallas flash kernel on TPU).
    """

    num_head_channels: int = 0  # 0 => single head over all channels
    num_groups: int = 32
    norm_eps: float = 1e-6
    dtype: Dtype = jnp.float32
    use_flash: Optional[bool] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, d, h, w, c = x.shape
        heads = max(1, c // self.num_head_channels) if self.num_head_channels else 1
        head_dim = c // heads

        residual = x
        y = GroupNorm32(self.num_groups, self.norm_eps, name="norm")(x)
        y = y.reshape(b, d * h * w, c)
        qkv = nn.Dense(3 * c, dtype=self.dtype, param_dtype=jnp.float32, name="qkv")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, -1, heads, head_dim)
        k = k.reshape(b, -1, heads, head_dim)
        v = v.reshape(b, -1, heads, head_dim)
        attn = volumetric_attention(q, k, v, use_flash=self.use_flash)
        attn = attn.reshape(b, d * h * w, c)
        out = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32, name="proj")(attn)
        return residual + out.reshape(b, d, h, w, c)


class Downsample3D(nn.Module):
    """Stride-2 conv; pads (0, 1) per spatial dim like the reference stack so
    output size is exactly floor(n/2) for any parity."""

    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return nn.Conv(
            self.out_channels,
            kernel_size=(3, 3, 3),
            strides=(2, 2, 2),
            padding=((0, 1), (0, 1), (0, 1)),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)


class Upsample3D(nn.Module):
    """Nearest-neighbor x2 then conv3."""

    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, d, h, w, c = x.shape
        x = jnp.repeat(jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2), 2, axis=3)
        return _conv3(self.out_channels, self.dtype, name="conv")(x)


def sinusoidal_time_embedding(timesteps: jax.Array, dim: int, max_period: float = 10000.0) -> jax.Array:
    """Standard DDPM sinusoidal embedding; fp32 output, shape (B, dim)."""
    half = dim // 2
    freqs = jnp.exp(-jnp.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    angles = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.cos(angles), jnp.sin(angles)], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class TimestepEmbedding(nn.Module):
    """Sinusoidal embedding -> MLP, producing the UNet time embedding."""

    base_dim: int
    time_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, timesteps: jax.Array) -> jax.Array:
        emb = sinusoidal_time_embedding(timesteps, self.base_dim)
        emb = nn.Dense(self.time_dim, dtype=self.dtype, param_dtype=jnp.float32, name="fc1")(emb.astype(self.dtype))
        emb = nn.silu(emb)
        emb = nn.Dense(self.time_dim, dtype=self.dtype, param_dtype=jnp.float32, name="fc2")(emb)
        return emb
