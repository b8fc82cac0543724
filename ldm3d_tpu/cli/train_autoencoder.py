"""Stage-1 trainer CLI: KL-autoencoder + PatchGAN on a TPU mesh.

Mirrors the reference driver (``3d_ldm/train_autoencoder.py``) end to end:
config merge, data, VAE-GAN losses with 5-epoch adversarial warm-up, AdamW
(0.5, 0.9) with sqrt(world)*0.5 LR scaling and warmup_cosine schedule
(actually wired — the reference's scheduler never activates, SURVEY.md 2.4.1),
grad-clip 0.5, TB scalars/images, best+last checkpoints, optional profiler.

Deliberate fixes over the reference, documented per SURVEY.md 2.4:
  * best checkpoint saved only on improvement (ref saved it every val),
  * no NaN skip-batch machinery (bf16 + fp32 accumulation is stable),
  * resume restores optimizer state and epoch (ref restarts the schedule).

Usage (flag parity with the reference):
  python -m ldm3d_tpu.cli.train_autoencoder -c CONFIG -e ENV [-g N] [--amp]
         [--profile] [--no-images] [--synthetic-data]
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
from ldm3d_tpu.nn import LPIPS, PatchDiscriminator3D
from ldm3d_tpu.obs import MetricsWriter, StepProfiler, visualize_one_slice_in_3d_image
from ldm3d_tpu.parallel import replicated_sharding, shard_batch
from ldm3d_tpu.training import (
    GracefulShutdown,
    Stage1Config,
    TrainState,
    build_lr_schedule,
    make_optimizer,
    make_stage1_eval_step,
    make_stage1_train_step,
    scale_lr_for_world,
)

log = logging.getLogger("train_autoencoder")


def _gan_last(g_state, d_state) -> dict:
    """Combined resumable stage-1 checkpoint: generator + discriminator in one
    pytree so the pair commits (or not) atomically."""
    return {
        "g": {"params": g_state.params, "opt_state": g_state.opt_state, "step": g_state.step},
        "d": {"params": d_state.params, "opt_state": d_state.opt_state, "step": d_state.step},
    }


def build_lpips(args, dtype):
    """Fixed-seed LPIPS; loads converted pretrained weights when configured
    (environment.json key ``lpips_weights`` -> msgpack from tools/convert_lpips.py)."""
    lpips = LPIPS(dtype=dtype)
    probe = jnp.zeros((1, 32, 32, 1), dtype)
    variables = jax.jit(lpips.init)(jax.random.PRNGKey(17), probe, probe)
    weights_path = getattr(args, "lpips_weights", "")
    if weights_path:
        # an explicitly configured path that doesn't resolve must FAIL: a
        # silent fallback to random features trains against a materially
        # different perceptual objective with only an info line as evidence
        if not os.path.exists(weights_path):
            raise FileNotFoundError(
                f"lpips_weights is set to {weights_path!r} but the file does not "
                "exist (tools/convert_lpips.py produces it); unset the key to "
                "train with fixed-seed LPIPS features deliberately")
        from flax import serialization

        with open(weights_path, "rb") as f:
            variables = serialization.from_bytes(variables, f.read())
        log.info("loaded LPIPS weights from %s", weights_path)
    else:
        log.info("using fixed-seed LPIPS features (no pretrained weights configured)")

    def lpips_apply(a, b):
        return lpips.apply(variables, a, b)

    return lpips_apply


def main(argv=None):
    parser = build_parser("TPU VAE-GAN training (stage 1)")
    args = parser.parse_args(argv)
    args, mesh = setup(args)
    if mesh.shape.get("stage", 1) > 1:
        raise ValueError("--pipeline applies to stage 2 (the UNet's uniform mid_depth "
                         "stack); the VAE-GAN has no uniform stack to pipeline — use "
                         "--spatial/--tensor/--fsdp for stage 1 (docs/SCALING.md)")
    dt = model_dtype(args)
    world = mesh.shape["data"]
    train_cfg = args.autoencoder_train

    # data ---------------------------------------------------------------
    size_divisible = 2 ** (len(args.autoencoder_def["channels"]) - 1)
    batch_size = global_batch_size(train_cfg["batch_size"], mesh)
    train_loader, val_loader = prepare_dataloader(
        args, batch_size, train_cfg["patch_size"], randcrop=True, size_divisible=size_divisible
    )
    steps_per_epoch = max(1, train_loader.steps_per_epoch())
    log.info("global batch %d, %d steps/epoch", batch_size, steps_per_epoch)

    # models ---------------------------------------------------------------
    ae = define_instance(args, "autoencoder_def").clone(dtype=dt, **({'remat': args.remat} if args.remat else {}))
    disc = PatchDiscriminator3D(num_layers_d=3, channels=32, in_channels=args.image_channels,
                                out_channels=1, dtype=dt)
    rng = jax.random.PRNGKey(env_seed(args))
    sample_shape = (1, *train_cfg["patch_size"], args.image_channels)
    g_vars = jax.jit(ae.init)({"params": rng, "sample": rng}, jnp.zeros(sample_shape, dt))
    d_vars = jax.jit(disc.init)(rng, jnp.zeros(sample_shape, dt))

    lpips_apply = build_lpips(args, dt) if train_cfg.get("perceptual_weight", 0) else None

    # optimization ---------------------------------------------------------
    max_epochs = args.max_epochs or train_cfg["max_epochs"]
    val_interval = train_cfg["val_interval"]
    lr = scale_lr_for_world(train_cfg["lr"], world)
    schedule = build_lr_schedule(train_cfg.get("lr_scheduler"), lr, max_epochs, steps_per_epoch)
    s1cfg = Stage1Config(
        recon_loss=train_cfg.get("recon_loss", "l1"),
        kl_weight=train_cfg["kl_weight"],
        perceptual_weight=train_cfg.get("perceptual_weight", 0.0),
        # schema-documented knobs must actually take effect (the reference
        # hardcodes both — 0.01 at :410 and epoch>5 at :304)
        adv_weight=train_cfg.get("adv_weight", 0.01),
        warmup_epochs=train_cfg.get("warmup_epochs", 5),
    )
    g_state = TrainState.create(ae.apply, g_vars["params"],
                                make_optimizer(schedule, s1cfg.grad_clip, grad_accum=args.grad_accum))
    d_state = TrainState.create(disc.apply, d_vars["params"],
                                make_optimizer(schedule, s1cfg.grad_clip, grad_accum=args.grad_accum))

    # checkpoints ------------------------------------------------------------
    g_ckpt = CheckpointManager(args.model_dir, StageArtifacts.AUTOENCODER)
    d_ckpt = CheckpointManager(args.model_dir, StageArtifacts.DISCRIMINATOR)
    start_epoch = 0
    if args.resume_ckpt:
        # G and D live in ONE 'last' checkpoint (single atomic orbax save), so
        # a hard kill can never leave a half-updated G/D pair behind (advisor
        # finding, round 1: two independent saves could resume mismatched)
        full = {
            "g": {"params": g_state.params, "opt_state": g_state.opt_state, "step": g_state.step},
            "d": {"params": d_state.params, "opt_state": d_state.opt_state, "step": d_state.step},
        }
        restored, ok = g_ckpt.try_restore("last", full, sharding=replicated_sharding(mesh))
        if ok:
            g_state = g_state.replace(**restored["g"])
            d_state = d_state.replace(**restored["d"])
            meta = g_ckpt.load_meta("last")
            start_epoch = int(meta.get("epoch", -1)) + 1
            log.info("resumed autoencoder from epoch %d", start_epoch)
        else:
            log.info("train autoencoder from scratch")

    if mesh.shape.get("model", 1) > 1:
        # tensor parallel: GSPMD-shard weight/optimizer channels for BOTH the
        # generator and the discriminator (docs/SCALING.md)
        from ldm3d_tpu.parallel import shard_train_state_tp

        g_state = shard_train_state_tp(g_state, mesh)
        d_state = shard_train_state_tp(d_state, mesh)
        log.info("tensor parallel: G+D params + optimizer sharded over %d devices",
                 mesh.shape["model"])

    if getattr(args, "fsdp", False) and mesh.shape["data"] > 1:
        # FSDP/ZeRO-3: params + moments sharded over data (parallel/fsdp.py)
        from ldm3d_tpu.parallel import shard_train_state_fsdp

        if getattr(args, "zero", False):
            log.info("--zero is redundant under --fsdp (moments are FSDP-sharded)")
        g_state = shard_train_state_fsdp(g_state, mesh)
        d_state = shard_train_state_fsdp(d_state, mesh)
        log.info("FSDP: G+D params + optimizer state sharded over %d data-parallel devices",
                 mesh.shape["data"])
    elif getattr(args, "zero", False) and mesh.shape["data"] > 1:
        # ZeRO-1: optimizer moments sharded over the data axis (parallel/zero.py)
        from ldm3d_tpu.parallel import shard_train_state_zero

        g_state = shard_train_state_zero(g_state, mesh)
        d_state = shard_train_state_zero(d_state, mesh)
        log.info("ZeRO-1: G+D optimizer state sharded over %d data-parallel devices",
                 mesh.shape["data"])

    if mesh.shape.get("spatial", 1) > 1:
        # dp x sp: volume depth sharded over the spatial axis (docs/SCALING.md)
        from ldm3d_tpu.parallel import validate_spatial_divisibility
        from ldm3d_tpu.training.stage1 import make_stage1_train_step_spatial

        validate_spatial_divisibility(train_cfg["patch_size"][0], mesh.shape["spatial"],
                                      len(args.autoencoder_def["channels"]) - 1)
        train_step = make_stage1_train_step_spatial(ae, disc, lpips_apply, s1cfg, mesh)
        # validation must be depth-sharded too: the unsharded eval step would
        # materialize full-volume activations per chip — OOM at exactly the
        # sizes --spatial exists for
        from ldm3d_tpu.training.stage1 import make_stage1_eval_step_spatial

        eval_step = make_stage1_eval_step_spatial(ae, lpips_apply, s1cfg, mesh)

        def place_images(b):
            return b  # jitted shard_map places P('data','spatial') itself
    else:
        train_step = make_stage1_train_step(ae, disc, lpips_apply, s1cfg)
        eval_step = make_stage1_eval_step(ae, lpips_apply, s1cfg)

        def place_images(b):
            return shard_batch(mesh, b)

    writer = MetricsWriter(os.path.join(args.tfevent_path, "autoencoder"))
    profiler = StepProfiler("./profiler_logs", enabled=args.profile)
    stop = GracefulShutdown()  # SIGTERM (preemption) -> save 'last' + exit 0
    best_val = float("inf")
    total_step = 0

    with mesh:
        for epoch in range(start_epoch, max_epochs):
            t0 = time.time()
            adv_active = epoch > s1cfg.warmup_epochs
            accum: dict[str, list] = {}
            for step, batch in enumerate(train_loader.epoch(epoch)):
                if stop.requested_global:
                    break
                images = place_images(batch["image"])
                rng, step_rng = jax.random.split(rng)
                g_state, d_state, metrics = train_step(g_state, d_state, images, step_rng, adv_active=adv_active)
                for k, v in metrics.items():
                    accum.setdefault(k, []).append(v)
                profiler.step()
                if step % 10 == 0:
                    total_step += 1
                    writer.add_scalar("train_recon_loss_iter", metrics["recon_loss"], total_step)
                    writer.add_scalar("train_kl_loss_iter", metrics["kl_loss"], total_step)
                    writer.add_scalar("train_perceptual_loss_iter", metrics["perceptual_loss"], total_step)
                    if adv_active:
                        writer.add_scalar("train_adv_loss_iter", metrics["adv_loss"], total_step)
                    writer.add_scalar("lr_generator", schedule(int(g_state.step)), total_step)
                if step % 50 == 0:
                    writer.add_scalar("grad_norm_autoencoder", metrics["g_grad_norm"], total_step)

            if stop.requested_global:
                # preemption: full resumable 'last' save; the interrupted
                # epoch replays on restart (meta epoch = epoch - 1)
                meta = {"epoch": epoch - 1, "best_val": best_val, "preempted": True}
                g_ckpt.save("last", _gan_last(g_state, d_state), meta)
                log.warning("preempted during epoch %d: saved resumable 'last' checkpoint", epoch)
                break

            epoch_means = {k: float(np.mean([np.asarray(x) for x in v])) for k, v in accum.items()}
            epoch_time = time.time() - t0
            log.info(
                "Epoch %d/%d (%.2fs) - Recon: %.4f, KL: %.4f, Perceptual: %.4f, Adv: %.4f",
                epoch, max_epochs, epoch_time,
                epoch_means.get("recon_loss", 0), epoch_means.get("kl_loss", 0),
                epoch_means.get("perceptual_loss", 0), epoch_means.get("adv_loss", 0),
            )
            writer.add_scalar("train_recon_loss_epoch", epoch_means.get("recon_loss", 0), epoch)
            writer.add_scalar("train_kl_loss_epoch", epoch_means.get("kl_loss", 0), epoch)
            writer.add_scalar("train_perceptual_loss_epoch", epoch_means.get("perceptual_loss", 0), epoch)
            writer.add_scalar("epoch_time", epoch_time, epoch)
            if adv_active:
                writer.add_scalar("train_adv_loss_epoch", epoch_means.get("adv_loss", 0), epoch)

            # validation ------------------------------------------------------
            if epoch % val_interval == 0:
                val_losses = []
                recon = images = None
                for batch in val_loader.epoch(epoch):
                    images = place_images(batch["image"])
                    rng, vrng = jax.random.split(rng)
                    vm, recon = eval_step(g_state.params, images, vrng)
                    val_losses.append(vm["val_recon_loss"])
                if val_losses:
                    val_loss = float(np.mean([np.asarray(v) for v in val_losses]))
                    log.info("Epoch %d val_recon_loss: %.4f", epoch, val_loss)
                    writer.add_scalar("val_recon_loss", val_loss, epoch)
                    is_best = val_loss < best_val
                    best_val = min(best_val, val_loss)
                    meta = {"epoch": epoch, "val_loss": val_loss, "best_val": best_val}
                    # async: the combined G+D 'last' write overlaps the next
                    # epoch's steps; 'best' stays per-model params-only (the
                    # deployment artifacts stage 2 / inference load)
                    g_ckpt.save("last", _gan_last(g_state, d_state), meta, block=False)
                    if is_best:
                        g_ckpt.save("best", {"params": g_state.params}, meta)
                        d_ckpt.save("best", {"params": d_state.params}, meta)
                        log.info("Got best val recon loss; saved best checkpoints to %s", args.model_dir)
                    if not args.no_images and recon is not None and epoch % (val_interval * 5) == 0:
                        img0 = np.asarray(images[0, ..., 0], dtype=np.float32)
                        rec0 = np.asarray(recon[0, ..., 0], dtype=np.float32)
                        for axis in range(3):
                            writer.add_image(f"val_img_{axis}", visualize_one_slice_in_3d_image(img0, axis), epoch)
                            writer.add_image(f"val_recon_{axis}", visualize_one_slice_in_3d_image(rec0, axis), epoch)

    g_ckpt.wait()  # drain in-flight async saves before exit
    d_ckpt.wait()
    stop.restore()
    profiler.stop()
    writer.close()
    if stop.requested_global:
        # exit 75 (EX_TEMPFAIL): wrappers (train_ldm.sh, pipelines) must NOT
        # treat a preempted stage as success and move on; the Job restarts
        # with resume_ckpt and replays the interrupted epoch
        log.warning("preempted: resumable state saved; exiting 75 for restart")
        raise SystemExit(75)
    track_run(args, "autoencoder", {"best_val_recon_loss": best_val})
    log.info("training complete; best val %.4f", best_val)
    return best_val


from ldm3d_tpu.cli.common import script_entry

script_main = script_entry(main)


if __name__ == "__main__":
    main()
