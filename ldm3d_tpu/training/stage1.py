"""Stage-1 VAE-GAN training: generator + discriminator steps, one XLA program each.

Behavior parity with the reference trainer (``3d_ldm/train_autoencoder.py``):
  * generator loss = recon(L1|L2) + kl_weight*KL + perceptual_weight*LPIPS-2.5D
    + 0.01*LSGAN(G) after a 5-epoch adversarial warm-up (:304,406-424),
  * discriminator loss = 0.01 * 0.5*(LSGAN fake + real) on detached recon (:453-494),
  * AdamW(betas=(0.5, 0.9), eps=1e-8, weight_decay=1e-5) for both (:274-279),
  * global-norm gradient clip 0.5 (:444,450),
  * inputs clamped to [0, 1] (:359),
  * validation loss = recon + perceptual_weight*perceptual on clamped recon (:578-604).

Deliberately dropped (north star): all NaN skip-batch guards — fp32 loss
accumulation over bf16 compute makes them unnecessary. The adversarial
warm-up boundary is a static jit argument, so the step compiles exactly twice.

Distribution: callers jit these steps over a mesh with the batch sharded on
the ``data`` axis; XLA inserts the gradient all-reduces (no DDP wrapper).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from ldm3d_tpu.losses import (
    kl_loss,
    kl_loss_sum,
    l1_loss,
    l1_loss_sum,
    l2_loss,
    l2_loss_sum,
    lsgan_discriminator_loss,
    lsgan_generator_loss,
)
from ldm3d_tpu.nn.lpips import perceptual_loss_25d
from ldm3d_tpu.training.state import TrainState

__all__ = [
    "Stage1Config",
    "make_optimizer",
    "make_stage1_train_step",
    "make_stage1_train_step_spatial",
    "make_stage1_eval_step",
    "make_stage1_eval_step_spatial",
]


@dataclasses.dataclass(frozen=True)
class Stage1Config:
    recon_loss: str = "l1"
    kl_weight: float = 1e-9
    perceptual_weight: float = 1e-4
    adv_weight: float = 0.01
    grad_clip: float = 0.5
    warmup_epochs: int = 5  # adversarial losses start after this epoch
    fake_3d_ratio: float = 0.2
    clamp_inputs: bool = True


def make_optimizer(lr_schedule, grad_clip: float = 0.5, weight_decay: float = 1e-5,
                   grad_accum: int = 1) -> optax.GradientTransformation:
    """AdamW with the reference's hyperparameters and clip-then-step order.

    ``grad_accum > 1`` enables true gradient accumulation (optax.MultiSteps) —
    a capability the reference documents but never implemented
    (SURVEY.md 2.3: doc/code drift in MULTI_GPU_OPTIMIZATION_SUMMARY.md).
    """
    tx = optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(_accum_schedule(lr_schedule, grad_accum),
                    b1=0.5, b2=0.9, eps=1e-8, weight_decay=weight_decay),
    )
    if grad_accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum)
    return tx


def _accum_schedule(lr_schedule, grad_accum: int):
    """Re-index an lr schedule for gradient accumulation.

    Schedules are built over LOADER micro-steps (``steps_per_epoch`` from the
    dataloader), but inside ``optax.MultiSteps`` the wrapped optimizer's
    count advances only once per EMITTED update — so without re-indexing
    every warm-up/milestone ran ``grad_accum``-times too slow while the TB
    ``lr`` log (indexed by micro-step) showed the intended curve (found in
    review). Multiplying the inner count by ``grad_accum`` restores
    micro-step indexing exactly.
    """
    if grad_accum <= 1 or not callable(lr_schedule):
        return lr_schedule
    return lambda count: lr_schedule(count * grad_accum)


def _recon_fn(name: str) -> Callable:
    return l2_loss if name == "l2" else l1_loss


def make_stage1_train_step(ae, disc, lpips_apply: Optional[Callable], cfg: Stage1Config):
    """Build the jitted (G, D) train step.

    Args:
      ae, disc: Flax module definitions.
      lpips_apply: ``(x2d, y2d) -> (B,)`` LPIPS distance, or None to disable
        the perceptual term.
      cfg: Stage1Config.

    Returns ``train_step(g_state, d_state, images, rng, adv_active) ->
    (g_state, d_state, metrics)`` where ``adv_active`` is a static bool.
    """
    recon_loss_fn = _recon_fn(cfg.recon_loss)

    def g_loss_fn(g_params, d_params, images, rng, adv_active: bool):
        rng_sample, rng_p = jax.random.split(rng)
        recon, z_mu, z_sigma = ae.apply({"params": g_params}, images, rngs={"sample": rng_sample})
        rl = recon_loss_fn(recon, images)
        kl = kl_loss(z_mu, z_sigma)
        if lpips_apply is not None and cfg.perceptual_weight:
            pl = perceptual_loss_25d(lpips_apply, recon, images, rng_p, cfg.fake_3d_ratio)
        else:
            pl = jnp.zeros((), jnp.float32)
        loss = rl + cfg.kl_weight * kl + cfg.perceptual_weight * pl
        adv = jnp.zeros((), jnp.float32)
        if adv_active:
            logits_fake = disc.apply({"params": d_params}, recon)[-1]
            adv = lsgan_generator_loss(logits_fake)
            loss = loss + cfg.adv_weight * adv
        metrics = {"recon_loss": rl, "kl_loss": kl, "perceptual_loss": pl, "adv_loss": adv}
        return loss, (metrics, recon)

    def d_loss_fn(d_params, recon, images):
        logits_fake = disc.apply({"params": d_params}, jax.lax.stop_gradient(recon))[-1]
        logits_real = disc.apply({"params": d_params}, images)[-1]
        d_raw = lsgan_discriminator_loss(logits_fake, logits_real)
        return cfg.adv_weight * d_raw, d_raw

    @functools.partial(jax.jit, static_argnames=("adv_active",), donate_argnums=(0, 1))
    def train_step(g_state: TrainState, d_state: TrainState, images, rng, adv_active: bool = False):
        if cfg.clamp_inputs:
            images = jnp.clip(images, 0.0, 1.0)
        (g_loss, (metrics, recon)), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            g_state.params, d_state.params, images, rng, adv_active
        )
        g_state = g_state.apply_gradients(g_grads)
        metrics["g_loss"] = g_loss
        metrics["g_grad_norm"] = optax.global_norm(g_grads)
        if adv_active:
            (d_loss, d_raw), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
                d_state.params, recon, images
            )
            d_state = d_state.apply_gradients(d_grads)
            metrics["d_loss"] = d_raw
        else:
            metrics["d_loss"] = jnp.zeros((), jnp.float32)
        return g_state, d_state, metrics

    return train_step


def make_stage1_train_step_spatial(ae, disc, lpips_apply: Optional[Callable],
                                   cfg: Stage1Config, mesh):
    """VAE-GAN train step sharded over BOTH the data and spatial mesh axes.

    The autoencoder forward/backward runs depth-sharded (halo convs / psum
    GroupNorm / gathered-kv attention, :mod:`ldm3d_tpu.parallel.spatial`).
    The discriminator and LPIPS operate on the *gathered* single-channel
    volumes — recon/images are tiny compared to activations (96^3 x 1 x bf16
    = 1.7 MB), so one depth all_gather per term is cheap and keeps the small
    PatchGAN/SqueezeNet exactly unsharded. ``all_gather`` is differentiable
    (its transpose scatters the cotangent slabs back), so generator gradients
    from the adversarial/perceptual terms flow into the sharded VAE.

    Loss accounting: per-device partial losses are constructed so their psum
    over ('data', 'spatial') equals the global mean — shard-local sums are
    divided by global element counts; gathered terms (identical across a data
    shard's spatial members) are divided by the full device count.
    """
    from jax.sharding import PartitionSpec as P

    from ldm3d_tpu.parallel.spatial import SPATIAL_AXIS

    from ldm3d_tpu.parallel.compat import shard_map_compat as _shard_map

    recon_sum_fn = l2_loss_sum if cfg.recon_loss == "l2" else l1_loss_sum
    ae_sp = ae.clone(spatial_axis=SPATIAL_AXIS)
    n_data = mesh.shape["data"]
    n_spatial = mesh.shape[SPATIAL_AXIS]
    n_dev = n_data * n_spatial
    vol_spec = P("data", SPATIAL_AXIS)
    axes = ("data", SPATIAL_AXIS)

    def _gather(x):
        return jax.lax.all_gather(x, SPATIAL_AXIS, axis=1, tiled=True)

    def g_loss_fn(g_params, d_params, images, rng, adv_active: bool):
        di = jax.lax.axis_index("data")
        si = jax.lax.axis_index(SPATIAL_AXIS)
        # disjoint streams: the slab-keyed posterior noise and the
        # volume-common LPIPS slice selection must not share a consumed key
        # (same discipline as the spatial stage-2 step and the eval step)
        rng_vol = jax.random.fold_in(rng, di)
        rng_slabs, rng_p = jax.random.split(rng_vol)  # rng_p same across slabs
        rng_sample = jax.random.fold_in(rng_slabs, si)

        recon, z_mu, z_sigma = ae_sp.apply({"params": g_params}, images,
                                           rngs={"sample": rng_sample})
        # local recon sum / global count -> psum = global mean
        rl_sum = recon_sum_fn(recon, images)
        rl = rl_sum / (recon.size * n_dev)  # local size x device count = global count
        # KL: shard-local sum (same elementwise formula as losses.kl_loss,
        # so --spatial and unsharded runs agree) / global batch
        kl = kl_loss_sum(z_mu, z_sigma) / (images.shape[0] * n_data)

        recon_full = _gather(recon)
        images_full = _gather(images)
        if lpips_apply is not None and cfg.perceptual_weight:
            pl = perceptual_loss_25d(lpips_apply, recon_full, images_full, rng_p,
                                     cfg.fake_3d_ratio) / n_dev
        else:
            pl = jnp.zeros((), jnp.float32)
        adv = jnp.zeros((), jnp.float32)
        if adv_active:
            logits_fake = disc.apply({"params": d_params}, recon_full)[-1]
            adv = lsgan_generator_loss(logits_fake) / n_dev
        loss = rl + cfg.kl_weight * kl + cfg.perceptual_weight * pl + cfg.adv_weight * adv
        metrics = {"recon_loss": rl, "kl_loss": kl, "perceptual_loss": pl, "adv_loss": adv}
        return loss, (metrics, recon_full, images_full)

    def d_loss_fn(d_params, recon_full, images_full):
        logits_fake = disc.apply({"params": d_params}, jax.lax.stop_gradient(recon_full))[-1]
        logits_real = disc.apply({"params": d_params}, images_full)[-1]
        d_raw = lsgan_discriminator_loss(logits_fake, logits_real) / n_dev
        return cfg.adv_weight * d_raw, d_raw

    def sharded_grads(g_params, d_params, images, rng, adv_active: bool):
        if cfg.clamp_inputs:
            images = jnp.clip(images, 0.0, 1.0)
        (g_loss, (metrics, recon_full, images_full)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(g_params, d_params, images, rng, adv_active)
        if adv_active:
            (_, d_raw), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
                d_params, recon_full, images_full)
        else:
            d_raw = jnp.zeros((), jnp.float32)
            d_grads = jax.tree_util.tree_map(jnp.zeros_like, d_params)
        metrics["g_loss"] = g_loss
        metrics["d_loss"] = d_raw
        out = (metrics, g_grads, d_grads)
        return jax.tree_util.tree_map(lambda a: jax.lax.psum(a, axes), out)

    smap_kwargs = dict(
        mesh=mesh,
        in_specs=(P(), P(), vol_spec, P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    if mesh.shape.get("model", 1) > 1:
        # TP x SP: 'model' stays an auto (GSPMD) axis — TP-sharded G/D params
        # are partitioned by the compiler inside the manual data/spatial body
        smap_kwargs["axis_names"] = {"data", SPATIAL_AXIS}
    grad_fns = {}
    for adv in (False, True):  # adv_active is static: two shard_map closures
        grad_fns[adv] = _shard_map(
            functools.partial(sharded_grads, adv_active=adv), **smap_kwargs)

    @functools.partial(jax.jit, static_argnames=("adv_active",), donate_argnums=(0, 1))
    def train_step(g_state: TrainState, d_state: TrainState, images, rng, adv_active: bool = False):
        metrics, g_grads, d_grads = grad_fns[adv_active](
            g_state.params, d_state.params, images, rng)
        g_state = g_state.apply_gradients(g_grads)
        metrics["g_grad_norm"] = optax.global_norm(g_grads)
        if adv_active:
            d_state = d_state.apply_gradients(d_grads)
        return g_state, d_state, metrics

    return train_step


def make_stage1_eval_step_spatial(ae, lpips_apply: Optional[Callable],
                                  cfg: Stage1Config, mesh):
    """Depth-sharded validation step (dp x sp), matching
    :func:`make_stage1_eval_step`'s metrics contract.

    Without this, a ``--spatial`` run would validate through the UNSHARDED
    model and materialize full-volume activations per chip — OOMing at
    exactly the volume sizes the spatial axis exists to serve (the training
    step was sharded, validation was not). Same loss accounting as the
    spatial train step: shard-local sums over global counts, psum'd over
    ('data', 'spatial'); LPIPS runs on the gathered (tiny) volumes. Returns
    ``(metrics, recon)`` with recon as full-depth volumes, batch-sharded on
    data — what the TB slice visualizer expects."""
    from jax.sharding import PartitionSpec as P

    from ldm3d_tpu.parallel.compat import shard_map_compat as _shard_map
    from ldm3d_tpu.parallel.spatial import SPATIAL_AXIS

    recon_sum_fn = l2_loss_sum if cfg.recon_loss == "l2" else l1_loss_sum
    ae_sp = ae.clone(spatial_axis=SPATIAL_AXIS)
    n_data = mesh.shape["data"]
    n_spatial = mesh.shape[SPATIAL_AXIS]
    n_dev = n_data * n_spatial
    vol_spec = P("data", SPATIAL_AXIS)
    axes = ("data", SPATIAL_AXIS)

    def local_eval(g_params, images, rng):
        di = jax.lax.axis_index("data")
        si = jax.lax.axis_index(SPATIAL_AXIS)
        rng_vol = jax.random.fold_in(rng, di)
        rng_slab, rng_p = jax.random.split(rng_vol)
        rng_sample = jax.random.fold_in(rng_slab, si)

        images = jnp.clip(images, 0.0, 1.0)
        recon, z_mu, z_sigma = ae_sp.apply({"params": g_params}, images,
                                           rngs={"sample": rng_sample})
        recon = jnp.clip(recon, 0.0, 1.0)
        rl_sum = recon_sum_fn(recon, images)
        rl = rl_sum / (recon.size * n_dev)
        kl = kl_loss_sum(z_mu, z_sigma) / (images.shape[0] * n_data)

        recon_full = jax.lax.all_gather(recon, SPATIAL_AXIS, axis=1, tiled=True)
        if lpips_apply is not None and cfg.perceptual_weight:
            images_full = jax.lax.all_gather(images, SPATIAL_AXIS, axis=1, tiled=True)
            pl = perceptual_loss_25d(lpips_apply, recon_full, images_full, rng_p,
                                     cfg.fake_3d_ratio) / n_dev
        else:
            pl = jnp.zeros((), jnp.float32)
        metrics = {"val_l_loss": rl, "val_perceptual_loss": pl, "val_kl_loss": kl}
        metrics = jax.tree_util.tree_map(lambda a: jax.lax.psum(a, axes), metrics)
        metrics["val_recon_loss"] = metrics["val_l_loss"] + cfg.perceptual_weight * metrics["val_perceptual_loss"]
        return metrics, recon_full

    smap_kwargs = dict(
        mesh=mesh,
        in_specs=(P(), vol_spec, P()),
        # recon is gathered full-depth (replicated over 'spatial'), batch
        # still sharded on 'data'
        out_specs=(P(), P("data")),
        check_vma=False,
    )
    if mesh.shape.get("model", 1) > 1:
        smap_kwargs["axis_names"] = {"data", SPATIAL_AXIS}
    return jax.jit(_shard_map(local_eval, **smap_kwargs))


def make_stage1_eval_step(ae, lpips_apply: Optional[Callable], cfg: Stage1Config):
    """Validation: recon + perceptual on [0,1]-clamped reconstruction."""
    recon_loss_fn = _recon_fn(cfg.recon_loss)

    @jax.jit
    def eval_step(g_params, images, rng):
        images = jnp.clip(images, 0.0, 1.0)
        rng_sample, rng_p = jax.random.split(rng)
        recon, z_mu, z_sigma = ae.apply({"params": g_params}, images, rngs={"sample": rng_sample})
        recon = jnp.clip(recon, 0.0, 1.0)
        rl = recon_loss_fn(recon, images)
        if lpips_apply is not None and cfg.perceptual_weight:
            pl = perceptual_loss_25d(lpips_apply, recon, images, rng_p, cfg.fake_3d_ratio)
        else:
            pl = jnp.zeros((), jnp.float32)
        val_loss = rl + cfg.perceptual_weight * pl
        return {"val_recon_loss": val_loss, "val_l_loss": rl, "val_perceptual_loss": pl,
                "val_kl_loss": kl_loss(z_mu, z_sigma)}, recon

    return eval_step
