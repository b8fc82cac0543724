"""KL-regularized 3D convolutional autoencoder (stage 1 of the LDM).

Capability parity with ``monai.networks.nets.AutoencoderKL`` as configured by
the reference (``config/config_train_32g.json:7-28``): 3 resolution levels
(2 stride-2 downsamples -> spatial /4), GroupNorm + SiLU ResBlocks, optional
self-attention per level, separate 1x1 quant convs for (mu, log_sigma), and
the stage-2 contract ``encode_stage_2_inputs`` / ``decode_stage_2_outputs``
used by the diffusion trainer (reference ``train_diffusion.py:104,180``).

Everything is NDHWC / bf16-capable; see :mod:`ldm3d_tpu.nn.blocks`.
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
    ResBlock3D,
    Upsample3D,
    _conv3,
    remat_wrapped,
)

Dtype = Any

__all__ = ["AutoencoderKL", "Encoder3D", "Decoder3D"]


class Encoder3D(nn.Module):
    channels: Sequence[int]
    latent_channels: int
    num_res_blocks: Sequence[int]
    attention_levels: Sequence[bool]
    num_groups: int = 32
    norm_eps: float = 1e-6
    with_nonlocal_attn: bool = False
    dtype: Dtype = jnp.float32
    remat: Any = False  # False | True/'full' | 'convs' (see blocks.remat_wrapped)
    spatial_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        sp = self.spatial_axis
        ResBlock = remat_wrapped(ResBlock3D, self.remat)
        h = _conv3(self.channels[0], self.dtype, name="conv_in", spatial_axis=sp)(x)
        num_levels = len(self.channels)
        for level in range(num_levels):
            for block in range(self.num_res_blocks[level]):
                h = ResBlock(
                    self.channels[level], self.num_groups, self.norm_eps, self.dtype, sp,
                    name=f"down_{level}_res_{block}",
                )(h)
                if self.attention_levels[level]:
                    h = AttentionBlock3D(
                        num_groups=self.num_groups, norm_eps=self.norm_eps, dtype=self.dtype,
                        spatial_axis=sp, name=f"down_{level}_attn_{block}",
                    )(h)
            if level < num_levels - 1:
                h = Downsample3D(self.channels[level], self.dtype, sp, name=f"down_{level}_downsample")(h)
        if self.with_nonlocal_attn:
            h = ResBlock3D(self.channels[-1], self.num_groups, self.norm_eps, self.dtype, sp, name="mid_res_1")(h)
            h = AttentionBlock3D(num_groups=self.num_groups, norm_eps=self.norm_eps, dtype=self.dtype, spatial_axis=sp, name="mid_attn")(h)
            h = ResBlock3D(self.channels[-1], self.num_groups, self.norm_eps, self.dtype, sp, name="mid_res_2")(h)
        h = GroupNorm32(self.num_groups, self.norm_eps, spatial_axis=sp, name="norm_out")(h)
        h = nn.silu(h)
        h = _conv3(self.latent_channels, self.dtype, name="conv_out", spatial_axis=sp)(h)
        return h


class Decoder3D(nn.Module):
    channels: Sequence[int]
    out_channels: int
    num_res_blocks: Sequence[int]
    attention_levels: Sequence[bool]
    num_groups: int = 32
    norm_eps: float = 1e-6
    with_nonlocal_attn: bool = False
    dtype: Dtype = jnp.float32
    remat: Any = False  # False | True/'full' | 'convs' (see blocks.remat_wrapped)
    spatial_axis: Optional[str] = None

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        sp = self.spatial_axis
        ResBlock = remat_wrapped(ResBlock3D, self.remat)
        rev_channels = list(reversed(self.channels))
        rev_blocks = list(reversed(self.num_res_blocks))
        rev_attn = list(reversed(self.attention_levels))

        h = _conv3(rev_channels[0], self.dtype, name="conv_in", spatial_axis=sp)(z)
        if self.with_nonlocal_attn:
            h = ResBlock3D(rev_channels[0], self.num_groups, self.norm_eps, self.dtype, sp, name="mid_res_1")(h)
            h = AttentionBlock3D(num_groups=self.num_groups, norm_eps=self.norm_eps, dtype=self.dtype, spatial_axis=sp, name="mid_attn")(h)
            h = ResBlock3D(rev_channels[0], self.num_groups, self.norm_eps, self.dtype, sp, name="mid_res_2")(h)
        num_levels = len(rev_channels)
        for level in range(num_levels):
            for block in range(rev_blocks[level]):
                h = ResBlock(
                    rev_channels[level], self.num_groups, self.norm_eps, self.dtype, sp,
                    name=f"up_{level}_res_{block}",
                )(h)
                if rev_attn[level]:
                    h = AttentionBlock3D(
                        num_groups=self.num_groups, norm_eps=self.norm_eps, dtype=self.dtype,
                        spatial_axis=sp, name=f"up_{level}_attn_{block}",
                    )(h)
            if level < num_levels - 1:
                h = Upsample3D(rev_channels[level], self.dtype, sp, name=f"up_{level}_upsample")(h)
        h = GroupNorm32(self.num_groups, self.norm_eps, spatial_axis=sp, name="norm_out")(h)
        h = nn.silu(h)
        h = _conv3(self.out_channels, self.dtype, name="conv_out", spatial_axis=sp)(h)
        return h


class AutoencoderKL(nn.Module):
    """3D VAE with KL prior; forward returns ``(reconstruction, z_mu, z_sigma)``."""

    in_channels: int = 1
    out_channels: int = 1
    latent_channels: int = 16
    channels: Sequence[int] = (64, 128, 256)
    num_res_blocks: Sequence[int] = (2, 2, 2)
    attention_levels: Sequence[bool] = (False, False, True)
    norm_num_groups: int = 32
    norm_eps: float = 1e-6
    with_encoder_nonlocal_attn: bool = False
    with_decoder_nonlocal_attn: bool = False
    dtype: Dtype = jnp.float32
    remat: Any = False  # ResBlock checkpointing: False | True/'full' | 'convs'
    spatial_axis: Optional[str] = None  # depth-shard activations over this mesh axis

    @classmethod
    def from_config(cls, **kw) -> "AutoencoderKL":
        """Build from the reference's config keyword surface
        (``config_train_32g.json:7-28``); unknown keys are ignored."""
        spatial_dims = kw.pop("spatial_dims", 3)
        if spatial_dims != 3:
            raise ValueError("ldm3d_tpu targets spatial_dims=3")
        num_res_blocks = kw.pop("num_res_blocks", 2)
        channels = tuple(kw.pop("channels", (64, 128, 256)))
        if isinstance(num_res_blocks, int):
            num_res_blocks = (num_res_blocks,) * len(channels)
        dtype = kw.pop("dtype", jnp.float32)
        if isinstance(dtype, str):
            dtype = jnp.dtype(dtype)
        known = dict(
            in_channels=kw.pop("in_channels", 1),
            out_channels=kw.pop("out_channels", 1),
            latent_channels=kw.pop("latent_channels", 16),
            channels=channels,
            num_res_blocks=tuple(num_res_blocks),
            attention_levels=tuple(kw.pop("attention_levels", (False, False, True))),
            norm_num_groups=kw.pop("norm_num_groups", 32),
            norm_eps=kw.pop("norm_eps", 1e-6),
            with_encoder_nonlocal_attn=kw.pop("with_encoder_nonlocal_attn", False),
            with_decoder_nonlocal_attn=kw.pop("with_decoder_nonlocal_attn", False),
            dtype=dtype,
            remat=kw.pop("remat", False),
            spatial_axis=kw.pop("spatial_axis", None),
        )
        return cls(**known)

    @property
    def downsample_factor(self) -> int:
        return 2 ** (len(self.channels) - 1)

    def setup(self):
        self.encoder = Encoder3D(
            channels=self.channels,
            latent_channels=self.latent_channels,
            num_res_blocks=self.num_res_blocks,
            attention_levels=self.attention_levels,
            num_groups=self.norm_num_groups,
            norm_eps=self.norm_eps,
            with_nonlocal_attn=self.with_encoder_nonlocal_attn,
            dtype=self.dtype,
            remat=self.remat,
            spatial_axis=self.spatial_axis,
        )
        self.decoder = Decoder3D(
            channels=self.channels,
            out_channels=self.out_channels,
            num_res_blocks=self.num_res_blocks,
            attention_levels=self.attention_levels,
            num_groups=self.norm_num_groups,
            norm_eps=self.norm_eps,
            with_nonlocal_attn=self.with_decoder_nonlocal_attn,
            dtype=self.dtype,
            remat=self.remat,
            spatial_axis=self.spatial_axis,
        )
        self.quant_conv_mu = _conv3(self.latent_channels, self.dtype, kernel=1)
        self.quant_conv_log_sigma = _conv3(self.latent_channels, self.dtype, kernel=1)
        self.post_quant_conv = _conv3(self.latent_channels, self.dtype, kernel=1)

    def encode(self, x: jax.Array) -> tuple[jax.Array, jax.Array]:
        h = self.encoder(x)
        z_mu = self.quant_conv_mu(h)
        z_log_var = self.quant_conv_log_sigma(h)
        # fp32 clamp + exp keeps sigma finite in bf16 runs without any of the
        # reference's runtime NaN policing (see SURVEY.md section 2.4.6).
        z_log_var = jnp.clip(z_log_var.astype(jnp.float32), -30.0, 20.0)
        z_sigma = jnp.exp(0.5 * z_log_var).astype(self.dtype)
        return z_mu, z_sigma

    def sampling(self, z_mu: jax.Array, z_sigma: jax.Array) -> jax.Array:
        eps = jax.random.normal(self.make_rng("sample"), z_mu.shape, dtype=jnp.float32)
        return z_mu + z_sigma * eps.astype(z_mu.dtype)

    def decode(self, z: jax.Array) -> jax.Array:
        return self.decoder(self.post_quant_conv(z))

    def encode_stage_2_inputs(self, x: jax.Array) -> jax.Array:
        z_mu, z_sigma = self.encode(x)
        return self.sampling(z_mu, z_sigma)

    def decode_stage_2_outputs(self, z: jax.Array) -> jax.Array:
        return self.decode(z)

    def __call__(self, x: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
        z_mu, z_sigma = self.encode(x)
        z = self.sampling(z_mu, z_sigma)
        recon = self.decode(z)
        return recon, z_mu, z_sigma
