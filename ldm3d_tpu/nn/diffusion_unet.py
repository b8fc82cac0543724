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

Beyond the reference: ``mid_depth`` adds a UNIFORM stack of
(ResBlock, Attention) pairs at the bottleneck between ``mid_attn`` and
``mid_res_2``. The stack is built with ``nn.scan`` so its parameters are
stacked along a leading layer axis — the exact layout pipeline parallelism
shards across the mesh's ``stage`` axis (:mod:`ldm3d_tpu.parallel.pipeline`).
``mid_depth=0`` (default) reproduces the reference architecture with an
unchanged parameter tree. The forward is split into ``down`` / ``mid_entry``
/ ``mid_exit`` / ``up`` methods (composed by ``__call__``) so distributed
drivers can stage the computation without duplicating model code.
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
    remat_wrapped,
)

Dtype = Any

__all__ = ["DiffusionUNet3D", "MidBlock3D"]


class MidBlock3D(nn.Module):
    """One uniform bottleneck layer: time-conditioned ResBlock + attention.

    Shape-preserving (``channels[-1]`` in and out), which is what makes a
    stack of these pipeline-able: every stage has identical parameter shapes
    and an identical activation interface. Returns ``(h, None)`` so the same
    module works as an ``nn.scan`` body and as a standalone stage function.
    """

    out_channels: int
    num_head_channels: int = 0
    num_groups: int = 32
    norm_eps: float = 1e-6
    dtype: Dtype = jnp.float32
    spatial_axis: Optional[str] = None

    @nn.compact
    def __call__(self, h: jax.Array, temb: jax.Array):
        h = TimeResBlock3D(
            self.out_channels, self.num_groups, self.norm_eps, self.dtype,
            self.spatial_axis, name="res",
        )(h, temb)
        h = AttentionBlock3D(
            num_head_channels=self.num_head_channels,
            num_groups=self.num_groups, norm_eps=self.norm_eps,
            dtype=self.dtype, spatial_axis=self.spatial_axis, name="attn",
        )(h)
        return h, None


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
    remat: Any = False  # ResBlock checkpointing: False | True/'full' | 'convs'
    spatial_axis: Optional[str] = None  # depth-shard activations over this mesh axis
    mid_depth: int = 0  # extra uniform (res, attn) bottleneck pairs (see module docstring)

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
            mid_depth=kw.pop("mid_depth", 0),
        )

    @property
    def downsample_factor(self) -> int:
        return 2 ** (len(self.channels) - 1)

    def setup(self):
        num_levels = len(self.channels)
        sp = self.spatial_axis
        # remat trades recompute for activation memory — the TPU equivalent of
        # the reference's gradient checkpointing (train_autoencoder.py:161-164)
        ResBlock = remat_wrapped(TimeResBlock3D, self.remat)

        self.time_embed = TimestepEmbedding(
            self.channels[0], 4 * self.channels[0], dtype=self.dtype, name="time_embed")
        self.conv_in = _conv3(self.channels[0], self.dtype, name="conv_in", spatial_axis=sp)

        down_res, down_attn, downsamples = [], [], []
        for level in range(num_levels):
            for block in range(self.num_res_blocks[level]):
                down_res.append(ResBlock(
                    self.channels[level], self.norm_num_groups, self.norm_eps,
                    self.dtype, sp, name=f"down_{level}_res_{block}"))
                if self.attention_levels[level]:
                    down_attn.append(AttentionBlock3D(
                        num_head_channels=self.num_head_channels[level],
                        num_groups=self.norm_num_groups, norm_eps=self.norm_eps,
                        dtype=self.dtype, spatial_axis=sp,
                        name=f"down_{level}_attn_{block}"))
                else:
                    down_attn.append(None)
            if level < num_levels - 1:
                downsamples.append(Downsample3D(
                    self.channels[level], self.dtype, sp, name=f"down_{level}_downsample"))
        self.down_res, self.down_attn, self.downsamples = down_res, down_attn, downsamples

        self.mid_res_1 = TimeResBlock3D(
            self.channels[-1], self.norm_num_groups, self.norm_eps, self.dtype, sp,
            name="mid_res_1")
        self.mid_attn = AttentionBlock3D(
            num_head_channels=self.num_head_channels[-1],
            num_groups=self.norm_num_groups, norm_eps=self.norm_eps,
            dtype=self.dtype, spatial_axis=sp, name="mid_attn")
        if self.mid_depth > 0:
            Mid = remat_wrapped(MidBlock3D, self.remat)
            self.mid_stack = nn.scan(
                Mid,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                length=self.mid_depth,
                in_axes=nn.broadcast,
            )(
                out_channels=self.channels[-1],
                num_head_channels=self.num_head_channels[-1],
                num_groups=self.norm_num_groups, norm_eps=self.norm_eps,
                dtype=self.dtype, spatial_axis=sp, name="mid_stack",
            )
        self.mid_res_2 = TimeResBlock3D(
            self.channels[-1], self.norm_num_groups, self.norm_eps, self.dtype, sp,
            name="mid_res_2")

        up_res, up_attn, upsamples = [], [], []
        for idx, level in enumerate(reversed(range(num_levels))):
            for block in range(self.num_res_blocks[level] + 1):
                up_res.append(ResBlock(
                    self.channels[level], self.norm_num_groups, self.norm_eps,
                    self.dtype, sp, name=f"up_{level}_res_{block}"))
                if self.attention_levels[level]:
                    up_attn.append(AttentionBlock3D(
                        num_head_channels=self.num_head_channels[level],
                        num_groups=self.norm_num_groups, norm_eps=self.norm_eps,
                        dtype=self.dtype, spatial_axis=sp,
                        name=f"up_{level}_attn_{block}"))
                else:
                    up_attn.append(None)
            if idx < num_levels - 1:
                upsamples.append(Upsample3D(
                    self.channels[level], self.dtype, sp, name=f"up_{level}_upsample"))
        self.up_res, self.up_attn, self.upsamples = up_res, up_attn, upsamples

        self.norm_out = GroupNorm32(self.norm_num_groups, self.norm_eps,
                                    spatial_axis=sp, name="norm_out")
        self.conv_out = _conv3(self.out_channels, self.dtype, name="conv_out",
                               zero_init=True, spatial_axis=sp)

    # --- staged forward (used by __call__ and by distributed drivers) -------

    def time_embedding(self, timesteps: jax.Array) -> jax.Array:
        return self.time_embed(timesteps)

    def down(self, x: jax.Array, temb: jax.Array):
        """conv_in + down path. Returns ``(h, skips)``."""
        num_levels = len(self.channels)
        h = self.conv_in(x)
        skips = [h]
        i = ds = 0
        for level in range(num_levels):
            for _ in range(self.num_res_blocks[level]):
                h = self.down_res[i](h, temb)
                if self.down_attn[i] is not None:
                    h = self.down_attn[i](h)
                skips.append(h)
                i += 1
            if level < num_levels - 1:
                h = self.downsamples[ds](h)
                ds += 1
                skips.append(h)
        return h, tuple(skips)

    def mid_entry(self, h: jax.Array, temb: jax.Array) -> jax.Array:
        h = self.mid_res_1(h, temb)
        return self.mid_attn(h)

    def mid_stack_apply(self, h: jax.Array, temb: jax.Array) -> jax.Array:
        """Sequential (nn.scan) execution of the uniform bottleneck stack."""
        if self.mid_depth <= 0:
            return h
        h, _ = self.mid_stack(h, temb)
        return h

    def mid_exit(self, h: jax.Array, temb: jax.Array) -> jax.Array:
        return self.mid_res_2(h, temb)

    def up(self, h: jax.Array, skips, temb: jax.Array) -> jax.Array:
        """Up path + output head. ``skips`` is consumed from the end."""
        num_levels = len(self.channels)
        skips = list(skips)
        i = us = 0
        for idx, level in enumerate(reversed(range(num_levels))):
            for _ in range(self.num_res_blocks[level] + 1):
                skip = skips.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = self.up_res[i](h, temb)
                if self.up_attn[i] is not None:
                    h = self.up_attn[i](h)
                i += 1
            if idx < num_levels - 1:
                h = self.upsamples[us](h)
                us += 1
        h = self.norm_out(h)
        h = nn.silu(h)
        return self.conv_out(h)

    def __call__(self, x: jax.Array, timesteps: jax.Array) -> jax.Array:
        """Predict noise epsilon-hat for noisy latents ``x`` at ``timesteps``.

        Args:
          x: ``(B, D, H, W, in_channels)`` noisy (optionally condition-concat) latents.
          timesteps: ``(B,)`` integer timesteps.
        """
        temb = self.time_embedding(timesteps)
        h, skips = self.down(x, temb)
        h = self.mid_entry(h, temb)
        h = self.mid_stack_apply(h, temb)
        h = self.mid_exit(h, temb)
        return self.up(h, skips, temb)
