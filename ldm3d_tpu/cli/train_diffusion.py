"""Stage-2 trainer CLI: conditional latent diffusion over a frozen VAE.

Mirrors the reference driver (``3d_ldm/train_diffusion.py``): loads the
stage-1 best autoencoder (hard requirement, :92-96), computes the latent
``scale_factor`` from the first batch (:100-124, here one jitted global
reduction over the sharded batch), trains the UNet with epsilon-MSE through
concat conditioning (:197-207), Adam + MultiStepLR (:155-156), clip 1.0,
validates with the same loss (:239-278), periodically samples conditionally
and logs tri-axial slices (:308-359).

Usage: python -m ldm3d_tpu.cli.train_diffusion -c CONFIG -e ENV [-g N] [--amp]
"""

from __future__ import annotations

import logging
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ldm3d_tpu.ckpt import CheckpointManager, StageArtifacts
from ldm3d_tpu.cli.common import build_parser, env_seed, global_batch_size, model_dtype, setup, track_run
from ldm3d_tpu.configs import define_instance
from ldm3d_tpu.data import prepare_dataloader
from ldm3d_tpu.diffusion import DDPMScheduler, inferer
from ldm3d_tpu.obs import MetricsWriter, visualize_one_slice_in_3d_image
from ldm3d_tpu.parallel import replicated_sharding, shard_batch
from ldm3d_tpu.training import (
    GracefulShutdown,
    Stage2Config,
    TrainState,
    build_lr_schedule,
    compute_scale_factor,
    make_diffusion_optimizer,
    make_stage2_eval_step,
    make_stage2_train_step,
)
from ldm3d_tpu.utils.config_merge import TrainContext

log = logging.getLogger("train_diffusion")


def load_frozen_autoencoder(args, dt, rng, patch_size, mesh=None):
    """Build the stage-1 VAE and load its best params (required artifact)."""
    ae = define_instance(args, "autoencoder_def").clone(dtype=dt)
    sample_shape = (1, *patch_size, args.image_channels)
    g_vars = jax.jit(ae.init)({"params": rng, "sample": rng}, jnp.zeros(sample_shape, dt))
    ckpt = CheckpointManager(args.model_dir, StageArtifacts.AUTOENCODER)
    if not ckpt.exists("best"):
        raise FileNotFoundError(
            f"stage-1 autoencoder checkpoint not found under {ckpt.root}; train stage 1 first"
        )
    sharding = replicated_sharding(mesh) if mesh is not None else None
    params = ckpt.restore_params("best", g_vars["params"], sharding=sharding)
    log.info("loaded trained autoencoder from %s", ckpt.path("best"))
    return ae, params


def main(argv=None):
    parser = build_parser("TPU latent diffusion training (stage 2)")
    parser.add_argument("--unconditional", action="store_true",
                        help="train without concat conditioning (UNet in_channels == latent)")
    parser.add_argument("--cond-dropout", type=float, default=0.0,
                        help="per-sample probability of zeroing the condition during training "
                             "(enables classifier-free guidance at inference)")
    parser.add_argument("--min-snr-gamma", type=float, default=0.0,
                        help="Min-SNR loss weighting gamma (0 = off, paper recommends 5.0): "
                             "down-weights easy low-noise timesteps for faster convergence")
    parser.add_argument("--cache-latents", action="store_true",
                        help="encode the dataset's posteriors once and train purely in latent "
                             "space: removes the per-step frozen-VAE encode (stage 2 uses "
                             "deterministic center crops, so posteriors never change)")
    args = parser.parse_args(argv)
    args, mesh = setup(args)
    dt = model_dtype(args)
    train_cfg = args.diffusion_train
    ctx = TrainContext(args)

    # data ---------------------------------------------------------------
    size_divisible = 2 ** (
        len(args.autoencoder_def["channels"]) + len(args.diffusion_def["channels"]) - 2
    )
    batch_size = global_batch_size(train_cfg["batch_size"], mesh)
    train_loader, val_loader = prepare_dataloader(
        args, batch_size, train_cfg["patch_size"], randcrop=False, size_divisible=size_divisible
    )
    steps_per_epoch = max(1, train_loader.steps_per_epoch())

    rng = jax.random.PRNGKey(env_seed(args))

    # frozen stage-1 VAE ----------------------------------------------------
    ae, ae_params = load_frozen_autoencoder(args, dt, rng, train_cfg["patch_size"], mesh)

    # scale factor from the first batch (global std over the sharded batch) --
    first = next(iter(train_loader.epoch(0)))
    with mesh:
        labels0 = shard_batch(mesh, first["label"])
        rng, sf_rng = jax.random.split(rng)
        scale_factor = compute_scale_factor(ae, ae_params, jnp.clip(labels0, 0, 1), sf_rng)
    log.info("scale_factor = %.6f", float(scale_factor))

    # UNet -------------------------------------------------------------------
    unet = define_instance(args, "diffusion_def").clone(dtype=dt, **({'remat': args.remat} if args.remat else {}))
    latent_size = [p // ae.downsample_factor for p in train_cfg["patch_size"]]
    probe = jnp.zeros((1, *latent_size, unet.in_channels), dt)
    u_vars = jax.jit(unet.init)(rng, probe, jnp.zeros((1,), jnp.int32))

    sched_cfg = ctx.scheduler_config()
    scheduler = DDPMScheduler.create(
        num_train_timesteps=sched_cfg["num_train_timesteps"],
        schedule=sched_cfg.get("schedule", "scaled_linear_beta"),
        beta_start=sched_cfg["beta_start"],
        beta_end=sched_cfg["beta_end"],
        prediction_type=sched_cfg["prediction_type"],
    )

    max_epochs = args.max_epochs or train_cfg["max_epochs"]
    val_interval = train_cfg["val_interval"]
    # default = the reference's MultiStepLR (:156); the schema-accepted
    # lr_scheduler key must actually take effect when set
    schedule = build_lr_schedule(train_cfg.get("lr_scheduler", "multistep"),
                                 train_cfg["lr"], max_epochs, steps_per_epoch)
    s2cfg = Stage2Config(conditional=not args.unconditional, cond_dropout=args.cond_dropout,
                         min_snr_gamma=args.min_snr_gamma)
    u_state = TrainState.create(unet.apply, u_vars["params"],
                                make_diffusion_optimizer(schedule, grad_accum=args.grad_accum),
                                ema_decay=args.ema_decay, ema_every=args.grad_accum)

    u_ckpt = CheckpointManager(args.model_dir, StageArtifacts.DIFFUSION)
    start_epoch = 0
    if args.resume_ckpt:
        full = {"params": u_state.params, "opt_state": u_state.opt_state, "step": u_state.step}
        if u_state.ema_params is not None:
            full["ema_params"] = u_state.ema_params
        restored, ok = u_ckpt.try_restore("last", full, sharding=replicated_sharding(mesh))
        if ok:
            u_state = u_state.replace(**restored)
            start_epoch = int(u_ckpt.load_meta("last").get("epoch", -1)) + 1
            log.info("resumed diffusion model from epoch %d", start_epoch)
        else:
            log.info("train diffusion model from scratch")

    if mesh.shape.get("model", 1) > 1:
        # tensor parallel: GSPMD-shard weight/optimizer channels (docs/SCALING.md)
        from ldm3d_tpu.parallel import shard_train_state_tp

        u_state = shard_train_state_tp(u_state, mesh)
        log.info("tensor parallel: params + optimizer sharded over %d devices",
                 mesh.shape["model"])
    if getattr(args, "fsdp", False) and mesh.shape["data"] > 1:
        # FSDP/ZeRO-3: params + moments + EMA sharded over data (parallel/fsdp.py)
        from ldm3d_tpu.parallel import shard_train_state_fsdp

        if getattr(args, "zero", False):
            log.info("--zero is redundant under --fsdp (moments are FSDP-sharded)")
        u_state = shard_train_state_fsdp(u_state, mesh)
        log.info("FSDP: params + optimizer state sharded over %d data-parallel devices",
                 mesh.shape["data"])
    elif getattr(args, "zero", False) and mesh.shape["data"] > 1:
        # ZeRO-1: optimizer moments sharded over the data axis (parallel/zero.py)
        from ldm3d_tpu.parallel import shard_train_state_zero

        u_state = shard_train_state_zero(u_state, mesh)
        log.info("ZeRO-1: optimizer state sharded over %d data-parallel devices",
                 mesh.shape["data"])
    if mesh.shape.get("stage", 1) > 1:
        # dp x pp: the UNet's uniform mid_depth bottleneck stack runs as a
        # GPipe microbatch schedule over the 'stage' axis (docs/SCALING.md)
        from ldm3d_tpu.parallel import shard_train_state_pp
        from ldm3d_tpu.training.stage2 import make_stage2_train_step_pp

        if args.cache_latents or getattr(args, "fsdp", False) or getattr(args, "zero", False):
            raise ValueError("--pipeline composes with the data axis only "
                             "(not --cache-latents/--fsdp/--zero)")
        per_replica = train_cfg["batch_size"]
        num_mb = args.pipeline_microbatches or per_replica
        if per_replica % num_mb:
            raise ValueError(f"--pipeline-microbatches {num_mb} does not divide the "
                             f"per-replica batch {per_replica}")
        u_state = shard_train_state_pp(u_state, mesh)
        train_step = make_stage2_train_step_pp(unet, ae, scheduler, s2cfg, mesh,
                                               num_microbatches=num_mb)
        eval_step = make_stage2_eval_step(unet, ae, scheduler, s2cfg)
        log.info("pipeline parallel: mid_depth=%d stack over %d stages, %d microbatches "
                 "(bubble %.0f%%)", unet.mid_depth, mesh.shape["stage"], num_mb,
                 100.0 * (mesh.shape["stage"] - 1) / (num_mb + mesh.shape["stage"] - 1))

        def place_batch(b):
            return shard_batch(mesh, b)
    elif mesh.shape.get("spatial", 1) > 1:
        # dp x sp: volume depth sharded over the spatial axis (docs/SCALING.md)
        from ldm3d_tpu.parallel import validate_spatial_divisibility
        from ldm3d_tpu.training.stage2 import make_stage2_train_step_spatial

        validate_spatial_divisibility(
            train_cfg["patch_size"][0], mesh.shape["spatial"],
            len(args.autoencoder_def["channels"]) + len(args.diffusion_def["channels"]) - 2,
        )
        if args.cache_latents:
            raise ValueError("--cache-latents is incompatible with --spatial "
                             "(the cache stores whole-volume latents)")
        train_step = make_stage2_train_step_spatial(unet, ae, scheduler, s2cfg, mesh)
        # validation must be depth-sharded too (the unsharded eval step
        # would OOM at exactly the volume sizes --spatial exists for)
        from ldm3d_tpu.training.stage2 import make_stage2_eval_step_spatial

        eval_step = make_stage2_eval_step_spatial(unet, ae, scheduler, s2cfg, mesh)

        def place_batch(b):
            return b  # jitted shard_map places P('data','spatial') itself
    elif args.cache_latents:
        from ldm3d_tpu.data import LatentCache
        from ldm3d_tpu.training import make_stage2_train_step_latents

        # on pods each host caches only its contiguous shard and yields
        # batch/num_hosts per step (LatentCache.build defaults its host
        # topology from the JAX process set, like prepare_dataloader)
        cache = LatentCache.build(ae, ae_params, train_loader.dataset, batch_size,
                                  conditional=s2cfg.conditional,
                                  seed=env_seed(args))
        lat_step = make_stage2_train_step_latents(unet, scheduler, s2cfg)

        def train_step(state, _ae_params, sb, sf, r):  # uniform loop signature
            return lat_step(state, sb, sf, r)

        eval_step = make_stage2_eval_step(unet, ae, scheduler, s2cfg)

        def place_batch(b):
            return shard_batch(mesh, b)
    else:
        train_step = make_stage2_train_step(unet, ae, scheduler, s2cfg)
        eval_step = make_stage2_eval_step(unet, ae, scheduler, s2cfg)

        def place_batch(b):
            return shard_batch(mesh, b)

    writer = MetricsWriter(os.path.join(args.tfevent_path, "diffusion"))
    stop = GracefulShutdown()  # SIGTERM (preemption) -> save 'last' + exit 0
    best_val = float("inf")
    total_step = 0

    # first-batch slice images, reference parity (train_diffusion.py:107-117)
    if not args.no_images:
        for axis in range(3):
            writer.add_image(f"train_img_{axis}",
                             visualize_one_slice_in_3d_image(first["image"][0, ..., 0], axis), 1)
            writer.add_image(f"train_label_{axis}",
                             visualize_one_slice_in_3d_image(first["label"][0, ..., 0], axis), 1)

    with mesh:
        for epoch in range(start_epoch, max_epochs):
            t0 = time.time()
            losses = []
            epoch_iter = (cache.epoch(epoch) if args.cache_latents
                          else train_loader.epoch(epoch))
            for batch in epoch_iter:
                if stop.requested_global:
                    break
                sb = place_batch(batch if args.cache_latents
                                 else {"image": batch["image"], "label": batch["label"]})
                rng, step_rng = jax.random.split(rng)
                u_state, metrics = train_step(u_state, ae_params, sb, scale_factor, step_rng)
                losses.append(metrics["diffusion_loss"])
                total_step += 1
                writer.add_scalar("train_diffusion_loss_iter", metrics["diffusion_loss"], total_step)
                if total_step % 50 == 0 and "grad_norm" in metrics:
                    # reference logs grad norms every 50 steps for the AE
                    # (train_autoencoder.py:523-531); do the same here — a
                    # flat loss with healthy grad norms separates slow
                    # learning from a broken gradient path
                    writer.add_scalar("grad_norm_diffusion", metrics["grad_norm"], total_step)
            if stop.requested_global:
                # preemption: full resumable 'last' save; the interrupted
                # epoch replays on restart (meta epoch = epoch - 1)
                full = {"params": u_state.params, "opt_state": u_state.opt_state, "step": u_state.step}
                if u_state.ema_params is not None:
                    full["ema_params"] = u_state.ema_params
                u_ckpt.save("last", full, {"epoch": epoch - 1, "best_val": best_val,
                                           "scale_factor": float(scale_factor), "preempted": True})
                log.warning("preempted during epoch %d: saved resumable 'last' checkpoint", epoch)
                break
            epoch_loss = float(np.mean([np.asarray(x) for x in losses])) if losses else float("nan")
            log.info("Epoch %d/%d (%.2fs) - diffusion loss %.5f", epoch, max_epochs,
                     time.time() - t0, epoch_loss)

            if epoch % val_interval == 0:
                val_losses = []
                last_batch = None
                for batch in val_loader.epoch(epoch):
                    sb = place_batch({"image": batch["image"], "label": batch["label"]})
                    rng, vrng = jax.random.split(rng)
                    vm = eval_step(u_state.params, ae_params, sb, scale_factor, vrng)
                    val_losses.append(vm["val_diffusion_loss"])
                    last_batch = batch
                if val_losses:
                    val_loss = float(np.mean([np.asarray(v) for v in val_losses]))
                    writer.add_scalar("val_diffusion_loss", val_loss, epoch)
                    log.info("Epoch %d val_diffusion_loss: %.5f", epoch, val_loss)
                    is_best = val_loss < best_val
                    best_val = min(best_val, val_loss)
                    full = {"params": u_state.params, "opt_state": u_state.opt_state, "step": u_state.step}
                    if u_state.ema_params is not None:
                        full["ema_params"] = u_state.ema_params
                    # async: the 'last' write overlaps the next epoch's steps
                    u_ckpt.save_best_and_last(
                        full, is_best,
                        {"epoch": epoch, "val_loss": val_loss, "scale_factor": float(scale_factor)},
                        block=False,
                    )
                    if is_best:
                        if u_state.ema_params is not None:
                            u_ckpt.save("ema", {"params": u_state.ema_params})
                        log.info("Got best val noise pred loss; saved to %s", u_ckpt.root)

                # periodic conditional sampling (reference :308-333)
                if not args.no_images and epoch % (2 * val_interval) == 0 and last_batch is not None:
                    rng, crng, nrng, srng = jax.random.split(rng, 4)
                    n_spatial = mesh.shape.get("spatial", 1)
                    if n_spatial > 1:
                        # depth-sharded sampling/encoding — the unsharded path
                        # would OOM at exactly the sizes --spatial serves. The
                        # batch must cover the data axis, so sample n_data
                        # volumes of the same condition and keep the first.
                        from ldm3d_tpu.parallel import (make_spatial_encoder,
                                                        make_spatial_sampler)

                        n_data = mesh.shape["data"]
                        imgs = jnp.clip(jnp.asarray(last_batch["image"][:1]), 0, 1).astype(dt)
                        imgs = jnp.tile(imgs, (n_data, 1, 1, 1, 1))
                        cond = (make_spatial_encoder(ae, mesh)(ae_params, imgs, crng)
                                if s2cfg.conditional else None)
                        latent_shape = (n_data,
                                        *[s // ae.downsample_factor for s in imgs.shape[1:4]],
                                        ae.latent_channels)
                        noise = jax.random.normal(nrng, latent_shape, jnp.float32).astype(dt)
                        sampler = make_spatial_sampler(unet, ae, scheduler, mesh,
                                                       scale_factor=scale_factor)
                        sampled = sampler(u_state.params, ae_params, noise, srng, cond)[:1]
                    else:
                        img1 = jnp.clip(jnp.asarray(last_batch["image"][:1]), 0, 1).astype(dt)
                        cond = None
                        if s2cfg.conditional:
                            cond = ae.apply({"params": ae_params}, img1,
                                            method="encode_stage_2_inputs", rngs={"sample": crng})
                        latent_shape = (1, *[s // ae.downsample_factor for s in img1.shape[1:4]], ae.latent_channels)
                        noise = jax.random.normal(nrng, latent_shape, jnp.float32).astype(dt)

                        def unet_apply(z, t):
                            return unet.apply({"params": u_state.params}, z, t)

                        def decode(z):
                            return ae.apply({"params": ae_params}, z, method="decode_stage_2_outputs")

                        sampled = inferer.sample(unet_apply, decode, scheduler, noise, srng,
                                                 condition=cond, scale_factor=scale_factor)
                    for axis in range(3):
                        writer.add_image(f"val_lowcount_input_{axis}",
                                         visualize_one_slice_in_3d_image(np.asarray(last_batch["image"][0, ..., 0]), axis), epoch)
                        writer.add_image(f"val_highcount_gt_{axis}",
                                         visualize_one_slice_in_3d_image(np.asarray(last_batch["label"][0, ..., 0]), axis), epoch)
                        writer.add_image(f"val_denoised_cond_{axis}",
                                         visualize_one_slice_in_3d_image(np.asarray(sampled[0, ..., 0], dtype=np.float32), axis), epoch)

    u_ckpt.wait()  # drain an in-flight async save before exit
    stop.restore()
    writer.close()
    if stop.requested_global:
        # exit 75 (EX_TEMPFAIL): wrappers (train_ldm.sh, pipelines) must NOT
        # treat a preempted stage as success and move on; the Job restarts
        # with resume_ckpt and replays the interrupted epoch
        log.warning("preempted: resumable state saved; exiting 75 for restart")
        raise SystemExit(75)
    track_run(args, "diffusion", {"best_val_diffusion_loss": best_val,
                                  "scale_factor": float(scale_factor)})
    log.info("training complete; best val %.5f", best_val)
    return best_val


from ldm3d_tpu.cli.common import script_entry

script_main = script_entry(main)


if __name__ == "__main__":
    main()
