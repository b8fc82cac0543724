"""Spatial (context) parallelism for volumetric models.

The reference scales large volumes only by patch cropping + AMP + gradient
checkpointing (SURVEY.md section 5.7 — it has no sequence/context parallelism
of any kind). The TPU-native analog implemented here shards the *depth* axis
of activations across a ``spatial`` mesh axis and keeps every operator
mathematically exact:

  * 3x3x3 convolutions exchange one-slab halos with mesh neighbors via
    ``ppermute`` (boundary shards receive zeros — exactly the global SAME /
    (0,1) zero padding), so sharded outputs match unsharded bit-for-bit up to
    reduction order;
  * GroupNorm moments are ``psum``-reduced across the axis;
  * self-attention keeps queries local and ``all_gather``s keys/values
    (attention is permutation-invariant over kv, so slab order is free).

Everything runs under ``jax.shard_map`` and is differentiable: XLA transposes
``ppermute``/``all_gather`` to their adjoints automatically, so the same
machinery serves training (see ``training/stage2.make_stage2_train_step_spatial``)
and the single-program sampler (``make_spatial_sampler``).

This is the ``sp`` axis of the ('data', 'model', 'spatial') mesh in
:mod:`ldm3d_tpu.parallel.mesh`.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ldm3d_tpu.parallel.compat import shard_map_compat as _shard_map

__all__ = [
    "SPATIAL_AXIS",
    "halo_exchange",
    "spatial_sharding",
    "shard_volume",
    "make_spatial_encoder",
    "make_spatial_sampler",
    "validate_spatial_divisibility",
]

SPATIAL_AXIS = "spatial"


def halo_exchange(x: jax.Array, axis_name: str, lo: int = 1, hi: int = 1, axis: int = 1) -> jax.Array:
    """Pad ``x`` along ``axis`` with ``lo``/``hi`` slabs from mesh neighbors.

    Boundary shards receive zeros (``ppermute`` zero-fills devices with no
    source), which realizes the global zero padding of SAME convolutions.
    Must run inside ``shard_map`` over ``axis_name``.
    """
    n = jax.lax.axis_size(axis_name)
    size = x.shape[axis]
    parts = []
    if lo:
        src = jax.lax.slice_in_dim(x, size - lo, size, axis=axis)
        parts.append(jax.lax.ppermute(src, axis_name, [(i, i + 1) for i in range(n - 1)]))
    parts.append(x)
    if hi:
        src = jax.lax.slice_in_dim(x, 0, hi, axis=axis)
        parts.append(jax.lax.ppermute(src, axis_name, [(i + 1, i) for i in range(n - 1)]))
    if len(parts) == 1:
        return x
    return jnp.concatenate(parts, axis=axis)


def spatial_sharding(mesh: Mesh, data_axis: bool = True) -> NamedSharding:
    """Sharding for a (B, D, H, W, C) volume: batch on 'data', depth on 'spatial'."""
    return NamedSharding(mesh, P("data" if data_axis else None, SPATIAL_AXIS))


def shard_volume(mesh: Mesh, x, data_axis: bool = True):
    """Place a host volume batch with depth sharded over the spatial axis."""
    n = mesh.shape[SPATIAL_AXIS]

    def _put(v):
        if v.shape[1] % n != 0:
            raise ValueError(f"depth {v.shape[1]} not divisible by spatial axis {n}")
        return jax.device_put(v, spatial_sharding(mesh, data_axis))

    return jax.tree_util.tree_map(_put, x)


def validate_spatial_divisibility(depth: int, n_spatial: int, num_downsamples: int) -> None:
    """Every downsample halves depth; each shard's local depth must stay even
    until the last level (mirrors the reference's size_divisible contract,
    ``train_diffusion.py:69`` — here per-shard)."""
    local = depth // n_spatial
    if depth % n_spatial:
        raise ValueError(f"depth {depth} not divisible by spatial axis {n_spatial}")
    for i in range(num_downsamples):
        if local % 2:
            raise ValueError(
                f"local depth {local} odd before downsample {i}: "
                f"need depth divisible by {n_spatial * 2 ** num_downsamples}"
            )
        local //= 2


def make_spatial_encoder(ae, mesh: Mesh):
    """Depth-sharded ``encode_stage_2_inputs``: global volumes in
    (``(B, D, H, W, C)``), posterior-sampled latents out, both
    ``P('data', 'spatial')``.

    Callers that feed :func:`make_spatial_sampler` a conditioning latent must
    encode through THIS (not the unsharded model): the whole point of the
    spatial axis is volumes whose full-resolution activations don't fit one
    chip, and the encoder hits the same sizes as the decoder."""
    ae_sp = ae.clone(spatial_axis=SPATIAL_AXIS)
    vol_spec = P("data", SPATIAL_AXIS)

    def _local(ae_params, x, rng):
        r = jax.random.fold_in(rng, jax.lax.axis_index("data"))
        r = jax.random.fold_in(r, jax.lax.axis_index(SPATIAL_AXIS))
        return ae_sp.apply({"params": ae_params}, x,
                           method="encode_stage_2_inputs", rngs={"sample": r})

    smap_kwargs = dict(mesh=mesh, in_specs=(P(), vol_spec, P()),
                       out_specs=vol_spec, check_vma=False)
    if mesh.shape.get("model", 1) > 1:
        smap_kwargs["axis_names"] = {"data", SPATIAL_AXIS}
    sharded = jax.jit(_shard_map(_local, **smap_kwargs))
    rep = NamedSharding(mesh, P())
    vol_sh = NamedSharding(mesh, vol_spec)

    def encoder(ae_params, x, rng):
        ae_params = jax.tree_util.tree_map(
            lambda a: jax.device_put(a, _keep_or_replicate(a, mesh)), ae_params)
        return sharded(ae_params, jax.device_put(x, vol_sh),
                       jax.device_put(rng, rep))

    return encoder


def make_spatial_sampler(unet, ae, scheduler, mesh: Mesh, scale_factor=1.0,
                         guidance_scale: float = 1.0):
    """Build a jitted spatially-sharded sampler: reverse loop + VAE decode.

    The returned ``sampler(u_params, ae_params, noise, rng, condition)`` takes
    *global* latent noise/condition ``(B, d, h, w, C)`` (sharded or not — jit
    reshards per the in_specs) and returns decoded volumes sharded
    ``P('data', 'spatial')``. Models must NOT already carry a spatial axis;
    they are cloned onto :data:`SPATIAL_AXIS` here.
    """
    from ldm3d_tpu.diffusion import inferer  # local import to avoid cycles

    unet_sp = unet.clone(spatial_axis=SPATIAL_AXIS)
    ae_sp = ae.clone(spatial_axis=SPATIAL_AXIS)
    vol_spec = P("data", SPATIAL_AXIS)

    def _local(u_params, ae_params, noise, rng, condition):
        # ancestral noise (DDPM) must differ per shard: fold mesh coordinates
        rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))
        rng = jax.random.fold_in(rng, jax.lax.axis_index(SPATIAL_AXIS))

        def unet_apply(x, t):
            return unet_sp.apply({"params": u_params}, x, t)

        latents = inferer.sample_latents(unet_apply, scheduler, noise, rng, condition,
                                         guidance_scale=guidance_scale)
        latents = latents / jnp.asarray(scale_factor, dtype=latents.dtype)
        return ae_sp.apply({"params": ae_params}, latents, method="decode_stage_2_outputs")

    smap_kwargs = dict(
        mesh=mesh,
        in_specs=(P(), P(), vol_spec, P(), vol_spec),
        out_specs=vol_spec,
        check_vma=False,
    )
    if mesh.shape.get("model", 1) > 1:
        # TP x SP sampling: 'model' stays an auto (GSPMD) axis for TP-sharded
        # weights; halo exchange and kv gathers ride the manual axes
        smap_kwargs["axis_names"] = {"data", SPATIAL_AXIS}
    sharded = jax.jit(_shard_map(_local, **smap_kwargs))
    rep = NamedSharding(mesh, P())
    vol_sh = NamedSharding(mesh, vol_spec)

    def sampler(u_params, ae_params, noise, rng, condition=None):
        # explicit placement: inputs may live on devices outside this mesh
        # (e.g. checkpoints restored onto all visible chips); device_put is a
        # no-op when already placed correctly. Params keep an existing
        # same-mesh sharding (tensor-parallel weights stay 'model'-sharded
        # through the auto axis — blanket-replicating them here defeated
        # TP x SP and re-materialized full weights per chip; found in review)
        u_params = jax.tree_util.tree_map(
            lambda a: jax.device_put(a, _keep_or_replicate(a, mesh)), u_params)
        ae_params = jax.tree_util.tree_map(
            lambda a: jax.device_put(a, _keep_or_replicate(a, mesh)), ae_params)
        noise = jax.device_put(noise, vol_sh)
        if condition is not None:
            condition = jax.device_put(condition, vol_sh)
        return sharded(u_params, ae_params, noise, jax.device_put(rng, rep), condition)

    return sampler


def _keep_or_replicate(a, mesh: Mesh):
    """An existing sharding on THIS mesh is preserved (TP weights); anything
    else — single-device or uncommitted arrays — pins replicated-on-mesh
    (same rule as ``zero.py``'s ``_param_sharding``)."""
    sh = getattr(a, "sharding", None)
    if isinstance(sh, NamedSharding) and sh.mesh == mesh:
        return sh
    return NamedSharding(mesh, P())
