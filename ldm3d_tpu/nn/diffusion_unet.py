"""3D diffusion UNet with timestep conditioning (stage 2 of the LDM).

Capability parity with ``monai.networks.nets.DiffusionModelUNet`` as used by
the reference (``config/config_train_32g.json:40-49``): sinusoidal timestep
embedding + MLP, time-conditioned ResBlocks, self-attention at configured
levels with ``num_head_channels``, skip connections, zero-initialized output
conv. Conditioning by channel concatenation ("concat" mode,
reference ``train_diffusion.py:197-205``) is handled by the caller, which
passes ``in_channels = latent + condition`` inputs.

NDHWC layout; attention over flattened D*H*W tokens rides the Pallas flash
kernel on TPU (:mod:`ldm3d_tpu.ops.attention`).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ldm3d_tpu.nn.blocks import (
    AttentionBlock3D,
    Downsample3D,
    GroupNorm32,
    TimeResBlock3D,
    TimestepEmbedding,
    Upsample3D,
    _conv3,
)

Dtype = Any

__all__ = ["DiffusionUNet3D"]


class DiffusionUNet3D(nn.Module):
    in_channels: int = 32
    out_channels: int = 16
    channels: Sequence[int] = (256, 512, 1024)
    attention_levels: Sequence[bool] = (False, True, True)
    num_head_channels: Sequence[int] = (0, 64, 64)
    num_res_blocks: Sequence[int] = (2, 2, 2)
    norm_num_groups: int = 32
    norm_eps: float = 1e-6
    dtype: Dtype = jnp.float32
    remat: bool = False  # rematerialize ResBlocks (gradient checkpointing)
    spatial_axis: Optional[str] = None  # depth-shard activations over this mesh axis

    @classmethod
    def from_config(cls, **kw) -> "DiffusionUNet3D":
        """Build from the reference's config keyword surface
        (``config_train_32g.json:40-49``); unknown keys are ignored."""
        spatial_dims = kw.pop("spatial_dims", 3)
        if spatial_dims != 3:
            raise ValueError("ldm3d_tpu targets spatial_dims=3")
        channels = tuple(kw.pop("channels", (256, 512, 1024)))
        num_res_blocks = kw.pop("num_res_blocks", 2)
        if isinstance(num_res_blocks, int):
            num_res_blocks = (num_res_blocks,) * len(channels)
        num_head_channels = kw.pop("num_head_channels", 0)
        if isinstance(num_head_channels, int):
            num_head_channels = (num_head_channels,) * len(channels)
        dtype = kw.pop("dtype", jnp.float32)
        if isinstance(dtype, str):
            dtype = jnp.dtype(dtype)
        return cls(
            in_channels=kw.pop("in_channels", 32),
            out_channels=kw.pop("out_channels", 16),
            channels=channels,
            attention_levels=tuple(kw.pop("attention_levels", (False,) * len(channels))),
            num_head_channels=tuple(num_head_channels),
            num_res_blocks=tuple(num_res_blocks),
            norm_num_groups=kw.pop("norm_num_groups", 32),
            norm_eps=kw.pop("norm_eps", 1e-6),
            dtype=dtype,
            remat=kw.pop("remat", False),
            spatial_axis=kw.pop("spatial_axis", None),
        )

    @property
    def downsample_factor(self) -> int:
        return 2 ** (len(self.channels) - 1)

    @nn.compact
    def __call__(self, x: jax.Array, timesteps: jax.Array) -> jax.Array:
        """Predict noise epsilon-hat for noisy latents ``x`` at ``timesteps``.

        Args:
          x: ``(B, D, H, W, in_channels)`` noisy (optionally condition-concat) latents.
          timesteps: ``(B,)`` integer timesteps.
        """
        num_levels = len(self.channels)
        sp = self.spatial_axis
        # remat trades recompute for activation memory — the TPU equivalent of
        # the reference's gradient checkpointing (train_autoencoder.py:161-164)
        ResBlock = nn.remat(TimeResBlock3D) if self.remat else TimeResBlock3D
        temb = TimestepEmbedding(self.channels[0], 4 * self.channels[0], dtype=self.dtype, name="time_embed")(timesteps)

        h = _conv3(self.channels[0], self.dtype, name="conv_in", spatial_axis=sp)(x)
        skips = [h]

        # --- down path ---
        for level in range(num_levels):
            for block in range(self.num_res_blocks[level]):
                h = ResBlock(
                    self.channels[level], self.norm_num_groups, self.norm_eps, self.dtype, sp,
                    name=f"down_{level}_res_{block}",
                )(h, temb)
                if self.attention_levels[level]:
                    h = AttentionBlock3D(
                        num_head_channels=self.num_head_channels[level],
                        num_groups=self.norm_num_groups, norm_eps=self.norm_eps, dtype=self.dtype,
                        spatial_axis=sp, name=f"down_{level}_attn_{block}",
                    )(h)
                skips.append(h)
            if level < num_levels - 1:
                h = Downsample3D(self.channels[level], self.dtype, sp, name=f"down_{level}_downsample")(h)
                skips.append(h)

        # --- middle ---
        h = TimeResBlock3D(self.channels[-1], self.norm_num_groups, self.norm_eps, self.dtype, sp, name="mid_res_1")(h, temb)
        h = AttentionBlock3D(
            num_head_channels=self.num_head_channels[-1],
            num_groups=self.norm_num_groups, norm_eps=self.norm_eps, dtype=self.dtype,
            spatial_axis=sp, name="mid_attn",
        )(h)
        h = TimeResBlock3D(self.channels[-1], self.norm_num_groups, self.norm_eps, self.dtype, sp, name="mid_res_2")(h, temb)

        # --- up path ---
        for idx, level in enumerate(reversed(range(num_levels))):
            for block in range(self.num_res_blocks[level] + 1):
                skip = skips.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = ResBlock(
                    self.channels[level], self.norm_num_groups, self.norm_eps, self.dtype, sp,
                    name=f"up_{level}_res_{block}",
                )(h, temb)
                if self.attention_levels[level]:
                    h = AttentionBlock3D(
                        num_head_channels=self.num_head_channels[level],
                        num_groups=self.norm_num_groups, norm_eps=self.norm_eps, dtype=self.dtype,
                        spatial_axis=sp, name=f"up_{level}_attn_{block}",
                    )(h)
            if idx < num_levels - 1:
                h = Upsample3D(self.channels[level], self.dtype, sp, name=f"up_{level}_upsample")(h)

        # --- out ---
        h = GroupNorm32(self.norm_num_groups, self.norm_eps, spatial_axis=sp, name="norm_out")(h)
        h = nn.silu(h)
        h = _conv3(self.out_channels, self.dtype, name="conv_out", zero_init=True, spatial_axis=sp)(h)
        return h
