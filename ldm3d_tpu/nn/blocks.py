"""Shared Flax building blocks for the 3D VAE / diffusion UNet.

TPU-first conventions used throughout the model zoo:
  * activations are NDHWC (channels-last) so XLA tiles convs onto the MXU,
  * ``dtype`` is the compute dtype (bf16 on TPU), ``param_dtype`` stays fp32,
  * normalization statistics and softmax always accumulate in fp32, which is
    what lets us drop the reference's NaN-guard machinery
    (reference ``3d_ldm/train_autoencoder.py:353-437`` and NaN_FIX_GUIDE.md).

Every block takes an optional ``spatial_axis``: when set (a mesh axis name,
used under ``shard_map``), activations are depth-sharded across that axis and
the block stays mathematically exact — convolutions exchange halos
(:func:`ldm3d_tpu.parallel.spatial.halo_exchange`), GroupNorm psums its
moments, attention all-gathers keys/values. This is the volumetric analog of
sequence parallelism; the reference has none (SURVEY.md section 5.7).

Capability parity targets: MONAI's ResBlock / AttentionBlock / Upsample /
Downsample as used by ``monai.networks.nets.AutoencoderKL`` and
``DiffusionModelUNet`` (reference config ``config_train_32g.json:7-49``).
"""

from __future__ import annotations

import os
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name as _checkpoint_name

from ldm3d_tpu.ops.attention import volumetric_attention
from ldm3d_tpu.parallel.spatial import halo_exchange

Dtype = Any

__all__ = [
    "Conv3D",
    "GroupNorm32",
    "ResBlock3D",
    "TimeResBlock3D",
    "AttentionBlock3D",
    "Downsample3D",
    "Upsample3D",
    "sinusoidal_time_embedding",
    "TimestepEmbedding",
]

_CONV_DN = jax.lax.conv_dimension_numbers((1, 1, 1, 1, 1), (1, 1, 1, 1, 1), ("NDHWC", "DHWIO", "NDHWC"))


def _conv3_small_out_factorized(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """3^3 SAME conv with few output channels, as one matmul + shifted tap-sum.

    A direct conv with F<=4 output channels is an N=F matvec on the MXU — the
    systolic array is 128 lanes wide, so 127/128 of the output lanes idle
    (measured ~1 TF/s on v5e for the VAE decoder's 64->1 output conv at 96^3,
    13.6 ms per batch-2 chunk). Reassociated:

      u[v, t*F + f] = sum_c x[v, c] * W[t, c, f]     one (Cin -> 27F) matmul
      y[v, f]       = sum_t u[v + off(t), t*F + f]   27 shifted adds (fused)

    Same products as the conv, fp32 accumulation in both the matmul and the
    tap-sum; exact in fp32 and measured 2.2x faster (6.2 ms) on the decoder's
    output conv. Returns the pre-bias result in ``x.dtype``.
    """
    cin, F = kernel.shape[3], kernel.shape[4]
    w = jnp.moveaxis(kernel.reshape(27, cin, F), 1, 0).reshape(cin, 27 * F)
    u = jax.lax.dot_general(
        x, w, dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    up = jnp.pad(u, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    d, h, wd = x.shape[1], x.shape[2], x.shape[3]
    y = jnp.zeros((*x.shape[:4], F), jnp.float32)
    t = 0
    for a in range(3):
        for b in range(3):
            for c in range(3):
                y = y + up[:, a:a + d, b:b + h, c:c + wd, t * F:(t + 1) * F].astype(jnp.float32)
                t += 1
    return y.astype(x.dtype)


class Conv3D(nn.Module):
    """3D convolution (NDHWC, fp32 params, compute in ``dtype``).

    Param tree matches ``flax.linen.Conv`` (``kernel``/``bias``) so sharded
    and unsharded instances of a model are checkpoint-compatible. ``padding``
    is the *global* semantic padding; with ``spatial_axis`` set, the depth
    padding is realized by a neighbor halo exchange (boundary shards receive
    the zero pad) and the conv runs depth-VALID on the widened slab.
    """

    features: int
    kernel: int = 3
    stride: int = 1
    padding: str = "same"  # "same" | "valid" | "down" ((0,1) per dim, stride-2)
    zero_init: bool = False
    dtype: Dtype = jnp.float32
    spatial_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = self.kernel
        if self.padding == "same":
            pad = ((k - 1) // 2, k // 2)
        elif self.padding == "down":
            pad = (0, 1)
        else:
            pad = (0, 0)
        kernel = self.param(
            "kernel",
            nn.initializers.zeros if self.zero_init else nn.initializers.lecun_normal(),
            (k, k, k, x.shape[-1], self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        x = x.astype(self.dtype)
        kernel = kernel.astype(self.dtype)
        if (
            k == 3
            and self.stride == 1
            and self.padding == "same"
            and self.features <= 4
            and x.shape[-1] >= 32
            and self.spatial_axis is None
        ):
            # few-output-channel 3^3 conv: the direct form is an N<=4 matvec
            # that idles 124+/128 MXU lanes — use the factorized matmul form
            return _conv3_small_out_factorized(x, kernel) + bias.astype(self.dtype)
        depth_pad = pad
        if self.spatial_axis is not None and (pad[0] or pad[1]):
            x = halo_exchange(x, self.spatial_axis, lo=pad[0], hi=pad[1], axis=1)
            depth_pad = (0, 0)
        out = jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(self.stride,) * 3,
            padding=(depth_pad, pad, pad),
            dimension_numbers=_CONV_DN,
        )
        return out + bias.astype(self.dtype)


def _conv3(
    features: int,
    dtype: Dtype,
    name: str | None = None,
    kernel: int = 3,
    zero_init: bool = False,
    spatial_axis: Optional[str] = None,
) -> Conv3D:
    return Conv3D(
        features=features,
        kernel=kernel,
        padding="same" if kernel > 1 else "valid",
        zero_init=zero_init,
        dtype=dtype,
        spatial_axis=spatial_axis,
        name=name,
    )


def _gn_stats(xr: jax.Array, g: int, eps: float, spatial_axis: Optional[str]):
    """fp32 (mean, inv-std) per (batch, channel), group-combined.

    Reduce to PER-CHANNEL sums first: the voxel axis reduces while C stays
    minor-most, so the pass keeps all 128 lanes busy. Reducing straight to
    (B, groups) — the naive formulation — makes XLA reduce over the minor
    axis with a 32-wide output and ran ~20x slower than HBM speed-of-light
    (profiled on v5e: GroupNorm was 55% of a UNet step). The (B, C) ->
    (B, G) group combine is negligible.
    """
    b, _, c = xr.shape
    # MXU-dot voxel sums (ops/groupnorm.py) — measured ~HBM speed-of-light
    # for the two-read formulation; LDM3D_GN=pallas swaps in the probed
    # (slower, kept for re-probing) Pallas streamed kernels. The
    # depth-sharded path pins the XLA form: its psum adjoints must stay
    # traceable wherever autodiff composes with the outer gradient psum.
    from ldm3d_tpu.ops.groupnorm import gn_sums

    s1c, s2c = gn_sums(xr, use_pallas=None if spatial_axis is None else False)
    s1 = s1c.reshape(b, g, c // g).sum(-1)       # (B, G), tiny
    s2 = s2c.reshape(b, g, c // g).sum(-1)
    count = jnp.float32(xr.shape[1] * (c // g))
    if spatial_axis is not None:
        s1 = jax.lax.psum(s1, spatial_axis)
        s2 = jax.lax.psum(s2, spatial_axis)
        count = count * jax.lax.axis_size(spatial_axis)
    mean = s1 / count
    var = jnp.maximum(s2 / count - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + jnp.float32(eps))
    inv_c = jnp.repeat(inv, c // g, axis=-1)    # (B, C)
    mean_c = jnp.repeat(mean, c // g, axis=-1)  # (B, C)
    return mean_c, inv_c


def _gn_affine_fwd(x, scale, bias, g, eps):
    b, c = x.shape[0], x.shape[-1]
    xr = x.reshape(b, -1, c)
    mean_c, inv_c = _gn_stats(xr, g, eps, None)
    a_c = inv_c * scale[None, :]
    b_c = bias[None, :] - mean_c * a_c
    # one fused multiply-add pass in the COMPUTE dtype: materializing the
    # fp32 copy of the volume (the old formulation) doubled the pass bytes
    # and left full-tensor convert ops all over the backward trace
    y = xr * a_c[:, None, :].astype(x.dtype) + b_c[:, None, :].astype(x.dtype)
    return y.reshape(x.shape), (x, scale, mean_c, inv_c)


def _gn_affine_bwd(g, eps, res, dy):
    """GroupNorm backward with every voxel reduction riding the MXU dot.

    Autodiff of the forward leaves the adjoints of the broadcast mean/inv
    as plain reduces, which XLA:TPU lowers to serial kLoop fusions — a
    stage-1 trace showed 105 ms/step of them (of 450 ms). Closed form:
    with dxhat = dy*gamma and group sums S1 = sum(dxhat), S2 =
    sum(dxhat*xhat) over the group's voxels x channels (count N):
        dx = inv*(dxhat - S1/N - xhat*S2/N)
           = (inv*gamma)*dy + (-inv^2*S2/N)*x + (-inv*S1/N + mean*inv^2*S2/N)
    i.e. ONE fused dy/x multiply-add pass with per-(batch, channel)
    coefficients; S1/S2 come from the same per-channel dot trick as the
    forward statistics (their operands fuse into the dot stream, nothing
    f32 materializes). dgamma = sum_b sum_v dy*xhat, dbeta = sum_b sum_v dy.
    """
    x, scale, mean_c, inv_c = res
    b, c = x.shape[0], x.shape[-1]
    xr = x.reshape(b, -1, c)
    dyr = dy.reshape(b, -1, c)
    n = jnp.float32(xr.shape[1] * (c // g))
    # both reductions as MXU dots (ops/groupnorm.py; LDM3D_GN=pallas
    # re-probes the streamed-kernel alternative)
    from ldm3d_tpu.ops.groupnorm import gn_bwd_sums

    sum_dy_c, sum_dyx_c = gn_bwd_sums(dyr, xr, mean_c, inv_c)  # (B, C) each
    dscale = sum_dyx_c.sum(0)
    dbias = sum_dy_c.sum(0)
    gam = scale[None, :]
    s1 = (sum_dy_c * gam).reshape(b, g, c // g).sum(-1)
    s2 = (sum_dyx_c * gam).reshape(b, g, c // g).sum(-1)
    s1_c = jnp.repeat(s1, c // g, axis=-1)  # (B, C)
    s2_c = jnp.repeat(s2, c // g, axis=-1)
    a1 = inv_c * gam
    a2 = -(inv_c * inv_c) * s2_c / n
    a3 = -inv_c * s1_c / n + mean_c * (inv_c * inv_c) * s2_c / n
    od = x.dtype
    dx = (dyr * a1[:, None, :].astype(od) + xr * a2[:, None, :].astype(od)
          + a3[:, None, :].astype(od))
    return dx.reshape(x.shape), dscale, dbias


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _gn_affine(x, scale, bias, g, eps):
    y, _ = _gn_affine_fwd(x, scale, bias, g, eps)
    return y


_gn_affine.defvjp(_gn_affine_fwd, _gn_affine_bwd)


class GroupNorm32(nn.Module):
    """GroupNorm with fp32 statistics regardless of compute dtype.

    Single-device path uses a custom VJP (:func:`_gn_affine_bwd`) so the
    backward's voxel reductions ride the MXU dot pipeline like the forward
    statistics do. With ``spatial_axis`` set the moments are psum-reduced
    across depth shards (autodiff backward — the psum adjoints compose),
    replacing the reference's SyncBatchNorm concern (GroupNorm there never
    needed cross-device sync because activations were never sharded; here
    they are, so the sync is one small fp32 psum per norm).
    """

    num_groups: int = 32
    epsilon: float = 1e-6
    dtype: Dtype = jnp.float32  # kept for call-site compat; stats are fp32
    spatial_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        g = self.num_groups
        if c % g:
            raise ValueError(f"channels {c} not divisible by {g} groups")
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        if self.spatial_axis is None:
            return _gn_affine(x, scale, bias, g, self.epsilon)
        # depth-sharded: stats psum across shards; autodiff handles the
        # backward (the custom-VJP closed form would double-count the
        # cross-shard sums against the outer gradient psum)
        b = x.shape[0]
        xr = x.reshape(b, -1, c)
        mean_c, inv_c = _gn_stats(xr, g, self.epsilon, self.spatial_axis)
        a_c = inv_c * scale[None, :]
        b_c = bias[None, :] - mean_c * a_c
        y = xr * a_c[:, None, :].astype(x.dtype) + b_c[:, None, :].astype(x.dtype)
        return y.reshape(x.shape)


def remat_wrapped(block_cls, remat):
    """Wrap a block class per the remat mode: ``False`` (no remat), ``True`` /
    ``"full"`` (checkpoint everything — minimum memory, re-runs every forward
    conv in the backward), or ``"convs"`` (checkpoint policy saves the
    ``resblock_conv``-tagged MXU conv outputs and recomputes only the cheap
    GroupNorm/SiLU elementwise passes — ~1/3 of full-remat's activation
    saving for none of its conv-recompute cost; the stage-1 recipe)."""
    if not remat:
        return block_cls
    if remat == "convs":
        policy = jax.checkpoint_policies.save_only_these_names("resblock_conv")
        return nn.remat(block_cls, policy=policy)
    if remat is not True and remat != "full":
        raise ValueError(f"remat must be False, True/'full', or 'convs': {remat!r}")
    return nn.remat(block_cls)


class ResBlock3D(nn.Module):
    """norm -> silu -> conv -> norm -> silu -> conv with 1x1 shortcut."""

    out_channels: int
    num_groups: int = 32
    norm_eps: float = 1e-6
    dtype: Dtype = jnp.float32
    spatial_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        sp = self.spatial_axis
        # checkpoint_name tags are no-ops unless the block runs under
        # nn.remat with the save-convs policy (AutoencoderKL remat="convs"):
        # then the MXU conv results are SAVED and only the VPU-cheap
        # GroupNorm/SiLU passes recompute in the backward — measured on the
        # stage-1 trace audit, full remat re-runs every forward conv (~30% of
        # step time) for ~3x less activation-memory saving than the convs
        # are worth (docs/PERFORMANCE.md round-3 stage-1 audit).
        h = GroupNorm32(self.num_groups, self.norm_eps, spatial_axis=sp, name="norm1")(x)
        h = nn.silu(h)
        h = _conv3(self.out_channels, self.dtype, name="conv1", spatial_axis=sp)(h)
        h = _checkpoint_name(h, "resblock_conv")
        h = GroupNorm32(self.num_groups, self.norm_eps, spatial_axis=sp, name="norm2")(h)
        h = nn.silu(h)
        h = _conv3(self.out_channels, self.dtype, name="conv2", spatial_axis=sp)(h)
        h = _checkpoint_name(h, "resblock_conv")
        if x.shape[-1] != self.out_channels:
            x = _conv3(self.out_channels, self.dtype, name="shortcut", kernel=1, spatial_axis=sp)(x)
            x = _checkpoint_name(x, "resblock_conv")
        return x + h


class TimeResBlock3D(nn.Module):
    """ResBlock with an additive timestep-embedding projection (UNet variant)."""

    out_channels: int
    num_groups: int = 32
    norm_eps: float = 1e-6
    dtype: Dtype = jnp.float32
    spatial_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, temb: jax.Array) -> jax.Array:
        sp = self.spatial_axis
        h = GroupNorm32(self.num_groups, self.norm_eps, spatial_axis=sp, name="norm1")(x)
        h = nn.silu(h)
        h = _conv3(self.out_channels, self.dtype, name="conv1", spatial_axis=sp)(h)
        h = _checkpoint_name(h, "resblock_conv")
        t = nn.silu(temb)
        t = nn.Dense(self.out_channels, dtype=self.dtype, param_dtype=jnp.float32, name="time_proj")(t)
        h = h + t[:, None, None, None, :]
        h = GroupNorm32(self.num_groups, self.norm_eps, spatial_axis=sp, name="norm2")(h)
        h = nn.silu(h)
        h = _conv3(self.out_channels, self.dtype, name="conv2", spatial_axis=sp)(h)
        h = _checkpoint_name(h, "resblock_conv")
        if x.shape[-1] != self.out_channels:
            x = _conv3(self.out_channels, self.dtype, name="shortcut", kernel=1, spatial_axis=sp)(x)
            x = _checkpoint_name(x, "resblock_conv")
        return x + h


class AttentionBlock3D(nn.Module):
    """Spatial self-attention over the flattened D*H*W token axis.

    Mirrors the capability of MONAI's AttentionBlock (used at
    ``attention_levels`` of both networks); the matmuls run through
    :func:`ldm3d_tpu.ops.volumetric_attention` (Pallas flash kernel on TPU).
    Depth-sharded: queries stay local, keys/values are all-gathered (exact —
    attention is permutation-invariant over the kv axis).
    """

    num_head_channels: int = 0  # 0 => single head over all channels
    num_groups: int = 32
    norm_eps: float = 1e-6
    dtype: Dtype = jnp.float32
    use_flash: Optional[bool] = None
    spatial_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, d, h, w, c = x.shape
        heads = max(1, c // self.num_head_channels) if self.num_head_channels else 1
        head_dim = c // heads

        residual = x
        y = GroupNorm32(self.num_groups, self.norm_eps, spatial_axis=self.spatial_axis, name="norm")(x)
        y = y.reshape(b, d * h * w, c)
        qkv = nn.Dense(3 * c, dtype=self.dtype, param_dtype=jnp.float32, name="qkv")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, -1, heads, head_dim)
        k = k.reshape(b, -1, heads, head_dim)
        v = v.reshape(b, -1, heads, head_dim)
        if self.spatial_axis is not None:
            k = jax.lax.all_gather(k, self.spatial_axis, axis=1, tiled=True)
            v = jax.lax.all_gather(v, self.spatial_axis, axis=1, tiled=True)
        attn = volumetric_attention(q, k, v, use_flash=self.use_flash)
        attn = attn.reshape(b, d * h * w, c)
        out = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32, name="proj")(attn)
        return residual + out.reshape(b, d, h, w, c)


class Downsample3D(nn.Module):
    """Stride-2 conv; pads (0, 1) per spatial dim like the reference stack so
    output size is exactly floor(n/2) for any parity. Depth-sharded shards
    need even local depth (see ``parallel.spatial.validate_spatial_divisibility``)."""

    out_channels: int
    dtype: Dtype = jnp.float32
    spatial_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return Conv3D(
            self.out_channels,
            kernel=3,
            stride=2,
            padding="down",
            dtype=self.dtype,
            spatial_axis=self.spatial_axis,
            name="conv",
        )(x)


# per-axis tap-combination matrices for the polyphase upsample-conv:
# row a of S[p] holds the original 3-tap weights that land on combined tap a
# for output parity p (derivation in _upsample_conv_fused)
_PHASE_S = np.array(
    [[[1.0, 0.0, 0.0], [0.0, 1.0, 1.0]],   # p=0: offsets {-1: W0, 0: W1+W2}
     [[1.0, 1.0, 0.0], [0.0, 0.0, 1.0]]],  # p=1: offsets {0: W0+W1, +1: W2}
    dtype=np.float32)


def _combined_4tap_kernel(kernel: jax.Array) -> jax.Array:
    """Fold nearest-x2 into the conv3^3 weights: per axis, the 3 taps become
    4 combined taps ``[W0, W0+W1, W1+W2, W2]`` (derivation: output position
    2i reads x[i-1]*W0 + x[i]*(W1+W2); position 2i+1 reads x[i]*(W0+W1) +
    x[i+1]*W2 — the 4-tap kernel realizes both parities at lhs_dilation=2).
    Combined in fp32 so the weight folding adds no bf16 rounding."""

    def taps(k, axis):
        w0, w1, w2 = jnp.split(k, 3, axis=axis)
        return jnp.concatenate([w0, w0 + w1, w1 + w2, w2], axis=axis)

    return taps(taps(taps(kernel.astype(jnp.float32), 0), 1), 2)


def _upsample_conv_fused(x: jax.Array, kernel: jax.Array, bias: jax.Array,
                         dtype, spatial_axis: Optional[str] = None) -> jax.Array:
    """Nearest-x2 upsample followed by SAME conv3^3 — as ONE transposed-style
    ``conv_general_dilated`` with ``lhs_dilation=2`` and the folded 4^3-tap
    kernel (:func:`_combined_4tap_kernel`). Exact (same sums, reassociated),
    the 8x-volume HBM intermediate never exists, and there is no phase
    slicing/interleave at all — XLA maps the dilated conv straight onto the
    MXU. Measured on v5e over the polyphase form this replaces: fwd 1.2-2.0x
    across every UNet/VAE upsample shape (e.g. 12^3x512 b8: 5.6 -> 4.1 ms;
    48^3x128 b8: 29.8 -> 17.9 ms), bwd 1.2-1.8x (docs/PERFORMANCE.md).

    An earlier XLA faulted the TPU backend on this op at 12^3x512 b8 (the
    reason round 2 shipped polyphase); the current backend runs every shape
    clean. ``LDM3D_UPSAMPLE=polyphase`` restores the old form everywhere if
    a future backend regresses.

    Depth-sharded (``spatial_axis``) runs stay on the polyphase form by
    default: its 1-deep pre-upsample halo semantics are identical, and the
    current XLA:CPU backend SIGABRTs compiling the lhs-dilated conv's
    backward inside the spatial train step's shard_map (the 8-device
    virtual-mesh test/dryrun environment), so the dilated form is not
    shippable there. ``LDM3D_UPSAMPLE=dilated`` forces it everywhere —
    probe-only (tools/probe_kernels.py re-checks the crash on new XLA):
    the sharded dilated form runs depth-VALID over the same 1-deep
    pre-upsample halo, local output rows 2g0..2g0+2d-1 = the unsharded
    rows (boundary shards get the zero halo = the (2,2) zero pad).
    """
    impl = os.environ.get("LDM3D_UPSAMPLE", "").lower()
    if impl != "dilated" and (spatial_axis is not None or impl == "polyphase"):
        return _upsample_conv_polyphase(x, kernel, bias, dtype, spatial_axis)
    wk = _combined_4tap_kernel(kernel).astype(dtype)
    x = x.astype(dtype)
    if spatial_axis is not None:
        x = halo_exchange(x, spatial_axis, lo=1, hi=1, axis=1)
        depth_pad = (0, 0)
    else:
        depth_pad = (2, 2)
    y = jax.lax.conv_general_dilated(
        x, wk, window_strides=(1, 1, 1),
        padding=(depth_pad, (2, 2), (2, 2)),
        lhs_dilation=(2, 2, 2),
        dimension_numbers=_CONV_DN,
    )
    return y + bias.astype(dtype)


def _upsample_conv_polyphase(x: jax.Array, kernel: jax.Array, bias: jax.Array,
                             dtype, spatial_axis: Optional[str] = None) -> jax.Array:
    """Polyphase form of the fused upsample-conv (escape hatch — see
    :func:`_upsample_conv_fused`). Without materializing the 8x-volume
    intermediate, at 8/27 of the FLOPs. Exact (same sums, reassociated).

    A 3-tap SAME conv at output position o = 2i+p on a nearest-x2-upsampled
    signal reads upsampled[o+t-1] = x[floor((2i+p+t-1)/2)], which for fixed
    parity p collapses the 3 taps onto 2 distinct input cells:
      p=0: x[i-1]*W0 + x[i]*(W1+W2)
      p=1: x[i]*(W0+W1) + x[i+1]*W2
    In 3D the 27-tap kernel therefore becomes eight 2^3-tap phase kernels of
    combined weights. All 8 phases run as ONE VALID conv over the (1,1)-padded
    input with 8*Cout output channels (phase-major) — a single large MXU
    matmul instead of a 27-tap conv over the 8x-upsampled volume — and the
    phase outputs interleave back via reshape/transpose. This is the hot path
    of the VAE decoder (round-1 bench: decode ran at ~18% MFU because the
    naive form is dominated by the upsampled-volume conv + its HBM traffic).
    """
    n_in = x.shape[-1]
    cout = kernel.shape[-1]
    s = jnp.asarray(_PHASE_S)
    # (2,2,2 phase, 2,2,2 tap, Cin, Cout)
    combined = jnp.einsum("pat,qbu,rcv,tuvio->pqrabcio", s, s, s,
                          kernel.astype(jnp.float32))
    # conv kernel (2,2,2, Cin, 8*Cout), output channels phase-major
    k_fused = combined.transpose(3, 4, 5, 6, 0, 1, 2, 7).reshape(2, 2, 2, n_in, 8 * cout)
    d, h, w = x.shape[1], x.shape[2], x.shape[3]
    x = x.astype(dtype)
    if spatial_axis is not None:
        # depth-sharded: the (1,1) depth pad comes from neighbor shards on
        # the PRE-upsample grid (a 1-deep halo instead of the naive path's
        # post-upsample 1-deep halo — half the exchanged bytes); boundary
        # shards receive the zero pad, exactly like the unsharded padding
        x = halo_exchange(x, spatial_axis, lo=1, hi=1, axis=1)
        depth_pad = (0, 0)
    else:
        depth_pad = (1, 1)
    y = jax.lax.conv_general_dilated(
        x,
        k_fused.astype(dtype),
        window_strides=(1, 1, 1),
        padding=(depth_pad, (1, 1), (1, 1)),
        dimension_numbers=_CONV_DN,
    )  # (B, d+1, h+1, w+1, 8*Cout)
    b_ = y.shape[0]
    y = y.reshape(b_, d + 1, h + 1, w + 1, 2, 2, 2, cout)
    # phase (p,q,r) lives at spatial offset (p,q,r) of the padded-conv output
    phases = [y[:, p:p + d, q:q + h, r:r + w, p, q, r, :]
              for p in (0, 1) for q in (0, 1) for r in (0, 1)]
    st = jnp.stack(phases, axis=-2).reshape(b_, d, h, w, 2, 2, 2, cout)
    out = st.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(b_, 2 * d, 2 * h, 2 * w, cout)
    return out + bias.astype(dtype)


class Upsample3D(nn.Module):
    """Nearest-neighbor x2 then conv3, via the exact fused transposed-conv
    above (``LDM3D_UPSAMPLE=polyphase`` selects the polyphase fallback).

    Depth-sharded (``spatial_axis``) runs the same fusion with a 1-deep
    pre-upsample halo — half the exchanged bytes of the naive
    repeat-then-halo-conv formulation."""

    out_channels: int
    dtype: Dtype = jnp.float32
    spatial_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # params live at conv/{kernel,bias} with the naive path's shapes,
        # so checkpoints are interchangeable between both paths
        kernel, bias = _Conv3Params(self.out_channels, name="conv")(x.shape[-1])
        return _upsample_conv_fused(x, kernel, bias, self.dtype,
                                    spatial_axis=self.spatial_axis)


class _Conv3Params(nn.Module):
    """Bare conv3^3 parameters (kernel/bias), checkpoint-compatible with
    :class:`Conv3D`, for paths that consume the weights in a transformed
    form (the polyphase upsample-conv)."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, 3, in_features, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return kernel, bias


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
