"""Stage-2 conditional latent-diffusion training.

Behavior parity with the reference trainer (``3d_ldm/train_diffusion.py``):
  * the frozen stage-1 VAE encodes the high-count "label" volume into the
    denoising target latent and the low-count "image" volume into the concat
    condition (:179-205),
  * latent ``scale_factor = 1 / std(z_labels)`` from the first batch; the
    reference averages per-rank values over NCCL (:100-124), here the std is
    computed over the *globally sharded* batch inside jit so the mesh-wide
    value falls out of one compiled reduction,
  * epsilon-prediction MSE (:207), Adam + MultiStepLR([100, 1000], 0.1)
    (:155-156), global-norm clip 1.0 (:217),
  * validation = same noise-prediction MSE on held-out pairs (:239-278).

Conditioning note: the condition latents are concatenated *unscaled*, exactly
like MONAI's ``LatentDiffusionInferer`` concat mode (only the denoised latent
carries scale_factor).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import optax

from ldm3d_tpu.diffusion import inferer
from ldm3d_tpu.losses import l2_loss
from ldm3d_tpu.training.state import TrainState

__all__ = [
    "Stage2Config",
    "make_diffusion_optimizer",
    "compute_scale_factor",
    "make_stage2_train_step",
    "make_stage2_train_step_latents",
    "make_stage2_train_step_spatial",
    "make_stage2_train_step_pp",
    "make_stage2_eval_step",
    "make_stage2_eval_step_spatial",
]


@dataclasses.dataclass(frozen=True)
class Stage2Config:
    grad_clip: float = 1.0
    conditional: bool = True
    clamp_inputs: bool = True
    # per-sample probability of zeroing the condition during training, which
    # makes classifier-free guidance meaningful at sampling time
    cond_dropout: float = 0.0
    # Min-SNR-gamma loss weighting (Hang et al. 2023): down-weights easy
    # low-noise timesteps, typically faster convergence at equal quality.
    # 0 disables (uniform weighting, the reference's behavior); 5.0 is the
    # paper's recommended gamma.
    min_snr_gamma: float = 0.0


def min_snr_weights(scheduler, timesteps: jax.Array, gamma: float) -> jax.Array:
    """Per-sample Min-SNR-gamma loss weights for the scheduler's target.

    SNR(t) = abar/(1-abar); epsilon-prediction weight = min(SNR, g)/SNR,
    v-prediction = min(SNR, g)/(SNR+1), sample-prediction = min(SNR, g).
    """
    abar = jnp.take(scheduler.alphas_cumprod, timesteps).astype(jnp.float32)
    snr = abar / jnp.maximum(1.0 - abar, 1e-12)
    clipped = jnp.minimum(snr, gamma)
    pt = scheduler.prediction_type
    if pt == "epsilon":
        return clipped / jnp.maximum(snr, 1e-12)
    if pt == "v_prediction":
        return clipped / (snr + 1.0)
    if pt == "sample":
        return clipped
    raise ValueError(pt)


def _drop_condition(condition, rng, p: float):
    keep = jax.random.bernoulli(rng, 1.0 - p, (condition.shape[0],) + (1,) * (condition.ndim - 1))
    return condition * keep.astype(condition.dtype)


def make_diffusion_optimizer(lr_schedule, grad_clip: float = 1.0,
                             grad_accum: int = 1) -> optax.GradientTransformation:
    """Adam (not AdamW — reference ``train_diffusion.py:155``) with clip 1.0."""
    from ldm3d_tpu.training.stage1 import _accum_schedule

    tx = optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adam(_accum_schedule(lr_schedule, grad_accum)),
    )
    if grad_accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum)
    return tx


def compute_scale_factor(ae, ae_params, labels, rng) -> jax.Array:
    """1 / std of the label latents — one jitted global reduction.

    When ``labels`` is sharded over the mesh's data axis this computes the
    mesh-wide std in the same compiled program (the reference instead
    all-reduce-averages per-rank stds, ``train_diffusion.py:119-124``).
    """

    @jax.jit
    def _compute(params, x, r):
        z = ae.apply({"params": params}, x, method="encode_stage_2_inputs", rngs={"sample": r})
        return 1.0 / jnp.std(z.astype(jnp.float32))

    return _compute(ae_params, labels, rng)


def _stage2_mse(pred, target, timesteps, scheduler, cfg: "Stage2Config",
                reduce: str = "mean"):
    """The stage-2 objective in one place: fp32 squared error, optionally
    Min-SNR-weighted per sample. ``reduce="mean"`` is the unsharded loss;
    ``reduce="sum"`` returns the shard-local SUM for spatial paths (divide by
    the global count and psum). One implementation keeps the three train-step
    builders computing the same objective."""
    diff = (pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
    if cfg.min_snr_gamma > 0:
        b = timesteps.shape[0]
        w = min_snr_weights(scheduler, timesteps, cfg.min_snr_gamma)
        diff = diff * w.reshape((b,) + (1,) * (diff.ndim - 1))
    return jnp.mean(diff) if reduce == "mean" else jnp.sum(diff)


def make_stage2_train_step(unet, ae, scheduler, cfg: Stage2Config):
    """Build the jitted LDM train step.

    Returns ``train_step(state, ae_params, batch, scale_factor, rng) ->
    (state, metrics)`` with ``batch = {"image": low, "label": high}`` NDHWC.
    """

    def encode(ae_params, x, rng):
        return ae.apply({"params": ae_params}, x, method="encode_stage_2_inputs", rngs={"sample": rng})

    def loss_fn(params, ae_params, batch, scale_factor, rng):
        rng_zl, rng_zi, rng_n, rng_t, rng_cd = jax.random.split(rng, 5)
        images, labels = batch["image"], batch["label"]
        if cfg.clamp_inputs:
            images = jnp.clip(images, 0.0, 1.0)
            labels = jnp.clip(labels, 0.0, 1.0)
        # frozen VAE: gradients stop at the latents
        z_labels = jax.lax.stop_gradient(encode(ae_params, labels, rng_zl)) * scale_factor
        condition = None
        if cfg.conditional:
            condition = jax.lax.stop_gradient(encode(ae_params, images, rng_zi))
            if cfg.cond_dropout > 0:
                condition = _drop_condition(condition, rng_cd, cfg.cond_dropout)
        noise = jax.random.normal(rng_n, z_labels.shape, dtype=jnp.float32).astype(z_labels.dtype)
        b = z_labels.shape[0]
        timesteps = jax.random.randint(rng_t, (b,), 0, scheduler.num_train_timesteps)
        model_in = inferer.noise_prediction_inputs(scheduler, z_labels, noise, timesteps, condition)
        pred = unet.apply({"params": params}, model_in, timesteps)
        target = inferer.training_targets(scheduler, z_labels, noise, timesteps)
        return _stage2_mse(pred, target, timesteps, scheduler, cfg)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, ae_params, batch, scale_factor, rng):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, ae_params, batch, scale_factor, rng)
        state = state.apply_gradients(grads)
        return state, {"diffusion_loss": loss, "grad_norm": optax.global_norm(grads)}

    return train_step


def make_stage2_train_step_latents(unet, scheduler, cfg: Stage2Config):
    """LDM train step over PRECOMPUTED posterior latents (see
    :class:`ldm3d_tpu.data.latent_cache.LatentCache`): no frozen-VAE encode
    inside the compiled step. Posterior sampling stays exact —
    ``z = mu + sigma * N(0,1)`` drawn fresh per step, matching
    ``encode_stage_2_inputs``.

    ``batch``: {"label_mu", "label_sigma"[, "image_mu", "image_sigma"]}.
    """

    def loss_fn(params, batch, scale_factor, rng):
        rng_zl, rng_zi, rng_n, rng_t, rng_cd = jax.random.split(rng, 5)
        dt = unet.dtype
        mu, sigma = batch["label_mu"], batch["label_sigma"]
        eps_l = jax.random.normal(rng_zl, mu.shape, jnp.float32)
        z_labels = ((mu + sigma * eps_l) * scale_factor).astype(dt)
        condition = None
        if cfg.conditional:
            mu_i, sigma_i = batch["image_mu"], batch["image_sigma"]
            eps_i = jax.random.normal(rng_zi, mu_i.shape, jnp.float32)
            condition = (mu_i + sigma_i * eps_i).astype(dt)
            if cfg.cond_dropout > 0:
                condition = _drop_condition(condition, rng_cd, cfg.cond_dropout)
        noise = jax.random.normal(rng_n, z_labels.shape, dtype=jnp.float32).astype(dt)
        b = z_labels.shape[0]
        timesteps = jax.random.randint(rng_t, (b,), 0, scheduler.num_train_timesteps)
        model_in = inferer.noise_prediction_inputs(scheduler, z_labels, noise, timesteps, condition)
        pred = unet.apply({"params": params}, model_in, timesteps)
        target = inferer.training_targets(scheduler, z_labels, noise, timesteps)
        return _stage2_mse(pred, target, timesteps, scheduler, cfg)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch, scale_factor, rng):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, scale_factor, rng)
        state = state.apply_gradients(grads)
        return state, {"diffusion_loss": loss, "grad_norm": optax.global_norm(grads)}

    return train_step


def make_stage2_train_step_spatial(unet, ae, scheduler, cfg: Stage2Config, mesh):
    """LDM train step sharded over BOTH the data and spatial mesh axes.

    Batch layout: ``(B, D, H, W, C)`` with B on ``data`` and D on ``spatial``
    — each device holds a depth slab of its data-shard's volumes. The frozen
    VAE encode, the UNet forward, and the backward all run depth-sharded
    (halo-exchange convs / psum GroupNorm / gathered-kv attention,
    :mod:`ldm3d_tpu.parallel.spatial`); shard_map autodiff inserts the adjoint
    collectives. Gradients are psum-replicated over both axes, so the
    optimizer update is identical on every device.

    RNG discipline: timesteps and the noising noise must agree across the
    spatial shards of one volume, so their keys fold in only the data index
    (noise slabs are sliced from a per-(data,volume) keyed stream by depth
    offset); the VAE posterior sample is per-voxel and folds in both axes.

    This goes beyond the reference, which is data-parallel only
    (SURVEY.md section 2.3) and scales volume size by cropping alone.
    """
    from jax.sharding import PartitionSpec as P

    from ldm3d_tpu.parallel.spatial import SPATIAL_AXIS

    from ldm3d_tpu.parallel.compat import shard_map_compat as _shard_map

    unet_sp = unet.clone(spatial_axis=SPATIAL_AXIS)
    ae_sp = ae.clone(spatial_axis=SPATIAL_AXIS)
    n_data = mesh.shape["data"]
    n_spatial = mesh.shape[SPATIAL_AXIS]
    vol_spec = P("data", SPATIAL_AXIS)

    def encode(ae_params, x, rng):
        return ae_sp.apply({"params": ae_params}, x, method="encode_stage_2_inputs", rngs={"sample": rng})

    def local_loss(params, ae_params, batch, scale_factor, rng):
        di = jax.lax.axis_index("data")
        si = jax.lax.axis_index(SPATIAL_AXIS)
        rng_vol = jax.random.fold_in(rng, di)          # same across a volume's slabs
        # three disjoint streams off the volume key: slab-local posterior
        # noise, volume-common (noise/timesteps), and condition dropout. The
        # old fold_in(rng_vol, si+1) slab key COLLIDED with fold_in(rng_vol, 1)
        # (= the dropout key) at spatial index 0 — key reuse across different
        # draws, which JAX documents as unsound.
        rng_slabs, rng_common, rng_cd = jax.random.split(rng_vol, 3)
        rng_zl, rng_zi = jax.random.split(jax.random.fold_in(rng_slabs, si))
        rng_n, rng_t = jax.random.split(rng_common)

        images, labels = batch["image"], batch["label"]
        if cfg.clamp_inputs:
            images = jnp.clip(images, 0.0, 1.0)
            labels = jnp.clip(labels, 0.0, 1.0)
        z_labels = jax.lax.stop_gradient(encode(ae_params, labels, rng_zl)) * scale_factor
        condition = None
        if cfg.conditional:
            condition = jax.lax.stop_gradient(encode(ae_params, images, rng_zi))
            if cfg.cond_dropout > 0:
                condition = _drop_condition(condition, rng_cd, cfg.cond_dropout)

        # per-volume noise: generate the slab from a per-(volume, slab) fold of
        # the VOLUME key so the full-volume field is well-defined; epsilon
        # prediction only ever compares pred vs target slab-locally.
        noise = jax.random.normal(
            jax.random.fold_in(rng_n, si), z_labels.shape, dtype=jnp.float32
        ).astype(z_labels.dtype)
        b = z_labels.shape[0]
        timesteps = jax.random.randint(rng_t, (b,), 0, scheduler.num_train_timesteps)
        model_in = inferer.noise_prediction_inputs(scheduler, z_labels, noise, timesteps, condition)
        pred = unet_sp.apply({"params": params}, model_in, timesteps)
        target = inferer.training_targets(scheduler, z_labels, noise, timesteps)
        # local sum / global count: psum of this over the mesh is the global
        # mean (per-sample Min-SNR weights agree across a volume's slabs)
        global_count = pred.size * n_data * n_spatial
        return _stage2_mse(pred, target, timesteps, scheduler, cfg, reduce="sum") / global_count

    def sharded_grads(params, ae_params, batch, scale_factor, rng):
        loss, grads = jax.value_and_grad(local_loss)(params, ae_params, batch, scale_factor, rng)
        loss = jax.lax.psum(loss, ("data", SPATIAL_AXIS))
        grads = jax.lax.psum(grads, ("data", SPATIAL_AXIS))
        return loss, grads

    smap_kwargs = dict(
        mesh=mesh,
        in_specs=(P(), P(), vol_spec, P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    if mesh.shape.get("model", 1) > 1:
        # TP x SP composition: only data/spatial are MANUAL axes; 'model'
        # stays an auto (GSPMD) axis, so params carrying a NamedSharding over
        # 'model' (parallel/tensor.py) are partitioned by the compiler inside
        # the shard_map body — halo exchange and psums ride the manual axes,
        # weight all-reduces ride 'model', chosen by propagation.
        smap_kwargs["axis_names"] = {"data", SPATIAL_AXIS}
    grad_fn = _shard_map(sharded_grads, **smap_kwargs)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, ae_params, batch, scale_factor, rng):
        loss, grads = grad_fn(state.params, ae_params, batch, scale_factor, rng)
        state = state.apply_gradients(grads)
        return state, {"diffusion_loss": loss, "grad_norm": optax.global_norm(grads)}

    return train_step


def make_stage2_train_step_pp(unet, ae, scheduler, cfg: Stage2Config, mesh,
                              num_microbatches: int):
    """LDM train step with the UNet's uniform bottleneck stack PIPELINED over
    the mesh's ``stage`` axis (dp x pp composition).

    Requires ``unet.mid_depth > 0`` with ``mid_depth % n_stages == 0`` (the
    stack was built by ``nn.scan``, so its params carry the leading layer axis
    :mod:`ldm3d_tpu.parallel.pipeline` shards). Layout: batch on ``data``;
    each data row's S stage devices cooperate on the SAME data shard — the
    shallow down/up paths run stage-replicated, the deep mid stack runs as a
    GPipe schedule over ``num_microbatches`` microbatches
    (:func:`ldm3d_tpu.parallel.pipeline.pipeline_spmd`). Gradients: psum over
    ``data`` for the stack (each stage owns its layers), psum over
    ``data + stage`` for the replicated remainder; the loss is divided by the
    stage count so the double psum yields the exact global mean — grad parity
    with the unsharded step is pinned in ``tests/test_pipeline.py``.

    RNG discipline mirrors the spatial step: every key folds in only the data
    index, so a row's stage devices draw identical posteriors/noise/timesteps.
    """
    from jax.sharding import PartitionSpec as P

    from ldm3d_tpu.nn.diffusion_unet import MidBlock3D
    from ldm3d_tpu.parallel.compat import shard_map_compat as _shard_map
    from ldm3d_tpu.parallel.pipeline import (
        STAGE_AXIS,
        chunked_stage_fn,
        merge_microbatches,
        pipeline_spmd,
        split_microbatches,
    )

    n_stages = mesh.shape[STAGE_AXIS]
    n_data = mesh.shape["data"]
    if unet.mid_depth <= 0 or unet.mid_depth % n_stages != 0:
        raise ValueError(
            f"pipeline training needs mid_depth > 0 divisible by the stage axis "
            f"({n_stages}); got mid_depth={unet.mid_depth}")

    # honor the model's remat contract for exactly the deep stack PP targets
    # (the UNet's own mid_stack_apply remats MidBlock3D when unet.remat —
    # without this the pipelined bottleneck stores every tick's activations
    # for all microbatches, defeating --remat at the sizes it exists for)
    from ldm3d_tpu.nn.blocks import remat_wrapped

    Mid = remat_wrapped(MidBlock3D, unet.remat)
    mid_block = Mid(
        out_channels=unet.channels[-1], num_head_channels=unet.num_head_channels[-1],
        num_groups=unet.norm_num_groups, norm_eps=unet.norm_eps, dtype=unet.dtype)
    stage_fn = chunked_stage_fn(
        lambda p, h, temb: mid_block.apply({"params": p}, h, temb)[0])

    def encode(ae_params, x, rng):
        return ae.apply({"params": ae_params}, x, method="encode_stage_2_inputs",
                        rngs={"sample": rng})

    def local_loss(params, ae_params, batch, scale_factor, rng):
        di = jax.lax.axis_index("data")
        rng_vol = jax.random.fold_in(rng, di)  # identical across a row's stages
        rng_zl, rng_zi, rng_n, rng_t, rng_cd = jax.random.split(rng_vol, 5)
        images, labels = batch["image"], batch["label"]
        if cfg.clamp_inputs:
            images = jnp.clip(images, 0.0, 1.0)
            labels = jnp.clip(labels, 0.0, 1.0)
        z_labels = jax.lax.stop_gradient(encode(ae_params, labels, rng_zl)) * scale_factor
        condition = None
        if cfg.conditional:
            condition = jax.lax.stop_gradient(encode(ae_params, images, rng_zi))
            if cfg.cond_dropout > 0:
                condition = _drop_condition(condition, rng_cd, cfg.cond_dropout)
        noise = jax.random.normal(rng_n, z_labels.shape, dtype=jnp.float32).astype(z_labels.dtype)
        b = z_labels.shape[0]
        timesteps = jax.random.randint(rng_t, (b,), 0, scheduler.num_train_timesteps)
        model_in = inferer.noise_prediction_inputs(scheduler, z_labels, noise, timesteps, condition)

        # staged UNet forward: replicated ends, pipelined bottleneck
        apply = lambda method, *a: unet.apply({"params": params}, *a, method=method)
        temb = apply("time_embedding", timesteps)
        h, skips = apply("down", model_in, temb)
        h = apply("mid_entry", h, temb)
        h_mb = split_microbatches(h, num_microbatches)
        temb_mb = split_microbatches(temb, num_microbatches)
        h = merge_microbatches(pipeline_spmd(
            stage_fn, params["mid_stack"], h_mb, temb_mb, n_stages=n_stages))
        h = apply("mid_exit", h, temb)
        pred = apply("up", h, skips, temb)

        target = inferer.training_targets(scheduler, z_labels, noise, timesteps)
        # local sum / (global elements * n_stages): the stage axis REPLICATES
        # the row's loss, so the psum over (data, stage) of this is the exact
        # global mean (see builder docstring)
        global_count = pred.size * n_data * n_stages
        return _stage2_mse(pred, target, timesteps, scheduler, cfg, reduce="sum") / global_count

    def sharded_grads(params, ae_params, batch, scale_factor, rng):
        loss, grads = jax.value_and_grad(local_loss)(params, ae_params, batch, scale_factor, rng)
        loss = jax.lax.psum(loss, ("data", STAGE_AXIS))
        out = {}
        for k, v in grads.items():
            axes = ("data",) if k == "mid_stack" else ("data", STAGE_AXIS)
            out[k] = jax.tree_util.tree_map(lambda a: jax.lax.psum(a, axes), v)
        return loss, out

    def _param_specs(params):
        return {k: (P(STAGE_AXIS) if k == "mid_stack" else P()) for k in params}

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, ae_params, batch, scale_factor, rng):
        pspec = _param_specs(state.params)
        grad_fn = _shard_map(
            sharded_grads, mesh=mesh,
            in_specs=(pspec, P(), P("data"), P(), P()),
            out_specs=(P(), pspec),
            check_vma=False,
        )
        loss, grads = grad_fn(state.params, ae_params, batch, scale_factor, rng)
        state = state.apply_gradients(grads)
        return state, {"diffusion_loss": loss, "grad_norm": optax.global_norm(grads)}

    return train_step


def make_stage2_eval_step_spatial(unet, ae, scheduler, cfg: Stage2Config, mesh):
    """Depth-sharded validation (dp x sp) for ``--spatial`` runs.

    Without this the trainer would validate through the UNSHARDED models,
    materializing full-volume activations per chip — OOMing at exactly the
    sizes the spatial axis exists for. Same RNG discipline and loss
    accounting as :func:`make_stage2_train_step_spatial`."""
    from jax.sharding import PartitionSpec as P

    from ldm3d_tpu.parallel.compat import shard_map_compat as _shard_map
    from ldm3d_tpu.parallel.spatial import SPATIAL_AXIS

    unet_sp = unet.clone(spatial_axis=SPATIAL_AXIS)
    ae_sp = ae.clone(spatial_axis=SPATIAL_AXIS)
    n_data = mesh.shape["data"]
    n_spatial = mesh.shape[SPATIAL_AXIS]
    vol_spec = P("data", SPATIAL_AXIS)

    def local_eval(params, ae_params, batch, scale_factor, rng):
        di = jax.lax.axis_index("data")
        si = jax.lax.axis_index(SPATIAL_AXIS)
        rng_vol = jax.random.fold_in(rng, di)
        rng_slabs, rng_common, _ = jax.random.split(rng_vol, 3)
        rng_zl, rng_zi = jax.random.split(jax.random.fold_in(rng_slabs, si))
        rng_n, rng_t = jax.random.split(rng_common)

        images, labels = batch["image"], batch["label"]
        if cfg.clamp_inputs:
            images = jnp.clip(images, 0.0, 1.0)
            labels = jnp.clip(labels, 0.0, 1.0)

        def encode(x, r):
            return ae_sp.apply({"params": ae_params}, x,
                               method="encode_stage_2_inputs", rngs={"sample": r})

        z_labels = encode(labels, rng_zl) * scale_factor
        condition = encode(images, rng_zi) if cfg.conditional else None
        noise = jax.random.normal(jax.random.fold_in(rng_n, si), z_labels.shape,
                                  dtype=jnp.float32).astype(z_labels.dtype)
        b = z_labels.shape[0]
        timesteps = jax.random.randint(rng_t, (b,), 0, scheduler.num_train_timesteps)
        model_in = inferer.noise_prediction_inputs(scheduler, z_labels, noise, timesteps, condition)
        pred = unet_sp.apply({"params": params}, model_in, timesteps)
        target = inferer.training_targets(scheduler, z_labels, noise, timesteps)
        diff = (pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
        loss = jnp.sum(diff) / (diff.size * n_data * n_spatial)
        return {"val_diffusion_loss": jax.lax.psum(loss, ("data", SPATIAL_AXIS))}

    smap_kwargs = dict(
        mesh=mesh,
        in_specs=(P(), P(), vol_spec, P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    if mesh.shape.get("model", 1) > 1:
        smap_kwargs["axis_names"] = {"data", SPATIAL_AXIS}
    return jax.jit(_shard_map(local_eval, **smap_kwargs))


def make_stage2_eval_step(unet, ae, scheduler, cfg: Stage2Config):
    def encode(ae_params, x, rng):
        return ae.apply({"params": ae_params}, x, method="encode_stage_2_inputs", rngs={"sample": rng})

    @jax.jit
    def eval_step(params, ae_params, batch, scale_factor, rng):
        rng_zl, rng_zi, rng_n, rng_t = jax.random.split(rng, 4)
        images, labels = batch["image"], batch["label"]
        if cfg.clamp_inputs:
            images = jnp.clip(images, 0.0, 1.0)
            labels = jnp.clip(labels, 0.0, 1.0)
        z_labels = encode(ae_params, labels, rng_zl) * scale_factor
        condition = encode(ae_params, images, rng_zi) if cfg.conditional else None
        noise = jax.random.normal(rng_n, z_labels.shape, dtype=jnp.float32).astype(z_labels.dtype)
        b = z_labels.shape[0]
        timesteps = jax.random.randint(rng_t, (b,), 0, scheduler.num_train_timesteps)
        model_in = inferer.noise_prediction_inputs(scheduler, z_labels, noise, timesteps, condition)
        pred = unet.apply({"params": params}, model_in, timesteps)
        target = inferer.training_targets(scheduler, z_labels, noise, timesteps)
        return {"val_diffusion_loss": l2_loss(pred, target)}

    return eval_step
