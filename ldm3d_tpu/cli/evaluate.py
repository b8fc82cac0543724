"""Evaluation CLI: score the trained LDM on the validation set, gate CI.

The reference's CI invokes a ``model_evaluation`` step and registers the
model only when "performance > 0.8" (``mlops-pipeline.yml:212-227``), but the
module does not exist in its repo (SURVEY.md §3.5). This driver is that step,
for real: it loads both stage checkpoints, samples conditioned volumes for
the validation pairs (same compiled reverse-loop + decode program as
:mod:`ldm3d_tpu.cli.inference`), scores them with jitted 3-D
SSIM / MS-SSIM / PSNR / MAE plus a VAE-latent Fréchet distance, writes
``evaluation_report.json``, and — with ``--gate`` — exits non-zero when the
composite score is below ``--threshold`` so the CI job fails closed.

Usage: python -m ldm3d_tpu.cli.evaluate -c CONFIG -e ENV [-n NUM]
       [--sampler ddim --steps 50] [--gate --threshold 0.8]
"""

from __future__ import annotations

import logging
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from ldm3d_tpu.cli.common import build_parser, env_seed, model_dtype, setup
from ldm3d_tpu.cli.inference import build_sampler_fn
from ldm3d_tpu.data import prepare_dataloader
from ldm3d_tpu.evaluation import evaluate_pairs
from ldm3d_tpu.utils.config_merge import TrainContext

log = logging.getLogger("evaluate")


def main(argv=None):
    parser = build_parser("TPU latent diffusion model evaluation")
    parser.add_argument("-n", "--num", type=int, default=8,
                        help="max validation pairs to evaluate")
    from ldm3d_tpu.cli.common import SAMPLERS

    parser.add_argument("--sampler", choices=SAMPLERS, default="ddim")
    from ldm3d_tpu.cli.common import TIMESTEP_SPACINGS

    parser.add_argument("--timestep-spacing", choices=TIMESTEP_SPACINGS, default=None,
                        help="leading = MONAI parity (default); trailing covers the "
                             "highest-noise band on few-step grids; karras = EDM "
                             "sigma-spaced grid (ddim/dpm/dpm3 only)")
    parser.add_argument("--steps", type=int, default=None,
                        help="inference steps (50 for ddim/dpm; full schedule for ddpm)")
    parser.add_argument("--batch", type=int, default=1, help="volumes per compiled sample call")
    parser.add_argument("--guidance", type=float, default=1.0,
                        help="classifier-free guidance scale (1.0 = off)")
    parser.add_argument("--use-ema", action="store_true", help="evaluate the EMA UNet weights")
    parser.add_argument("--use-distilled", action="store_true",
                        help="evaluate the progressively-distilled student on its few-step "
                             "grid (cli.distill) — quantifies the distillation quality trade "
                             "with the same gate metrics")
    parser.add_argument("--threshold", type=float, default=0.8,
                        help="composite-score gate (reference CI uses 0.8)")
    parser.add_argument("--gate", action="store_true",
                        help="exit non-zero when score <= threshold (CI registration gate)")
    parser.add_argument("--report", default=None,
                        help="report path (default: <model_dir>/evaluation_report.json)")
    args = parser.parse_args(argv)
    args, mesh = setup(args)
    if mesh.shape.get("stage", 1) > 1:
        raise ValueError("--pipeline is a training-time axis; sampling scales via "
                         "the data axis (and --spatial for oversize volumes)")
    dt = model_dtype(args)
    ctx = TrainContext(args)
    rng = jax.random.PRNGKey(env_seed(args))

    patch_size = args.diffusion_train["patch_size"]

    # models + checkpoints + scheduler (shared with cli.inference) ------------
    from ldm3d_tpu.cli.common import load_two_stage, make_sampling_scheduler

    if args.use_distilled and args.use_ema:
        raise ValueError("--use-distilled and --use-ema are mutually exclusive roles")
    ae, ae_params, unet, u_params, latent_shape, scale_factor = load_two_stage(
        args, mesh, dt, rng, use_ema=args.use_ema)
    if args.use_distilled:
        from ldm3d_tpu.cli.common import load_distilled, load_distilled_meta
        from ldm3d_tpu.parallel import replicated_sharding

        if args.guidance != 1.0:
            # meta-only peek: fail BEFORE paying the params restore
            baked = float(load_distilled_meta(args.model_dir).get("guidance_scale", 1.0))
            raise ValueError(
                f"--guidance is unavailable with --use-distilled: the student bakes "
                f"guidance w={baked} in")
        u_params, scheduler, dmeta = load_distilled(
            args.model_dir, u_params, ctx.scheduler_config(),
            sharding=replicated_sharding(mesh))
        scale_factor = float(dmeta.get("scale_factor", scale_factor))
        if args.steps is not None or args.sampler != "ddim" or args.timestep_spacing:
            log.info("--use-distilled overrides --sampler/--steps/--timestep-spacing")
        log.info("evaluating distilled student: %d steps on grid %s",
                 len(dmeta["timesteps"]), dmeta["timesteps"])
    else:
        scheduler = make_sampling_scheduler(args.sampler, args.steps, ctx.scheduler_config(),
                                            timestep_spacing=getattr(args, "timestep_spacing", None))

    if mesh.shape.get("spatial", 1) > 1:
        # depth-sharded sampling + encoding, like cli.inference: the
        # unsharded path would OOM at exactly the sizes --spatial exists for
        from ldm3d_tpu.parallel import (make_spatial_encoder, make_spatial_sampler,
                                        validate_spatial_divisibility)

        validate_spatial_divisibility(latent_shape[0], mesh.shape["spatial"],
                                      len(args.diffusion_def["channels"]) - 1)
        if args.batch % mesh.shape["data"]:
            raise ValueError(f"--batch {args.batch} must be divisible by the data axis "
                             f"({mesh.shape['data']} = devices/spatial)")
        sp_sampler = make_spatial_sampler(unet, ae, scheduler, mesh,
                                          scale_factor=scale_factor,
                                          guidance_scale=args.guidance)

        def sampler(noise, srng, condition=None):
            return sp_sampler(u_params, ae_params, noise, srng, condition)

        _sp_encoder = make_spatial_encoder(ae, mesh)

        def encode_condition(images, crng):
            return _sp_encoder(ae_params, images, crng)
    else:
        sampler = build_sampler_fn(args, ae, ae_params, unet, u_params, scheduler,
                                   scale_factor, mesh=mesh)

        def encode_condition(images, crng):
            return ae.apply({"params": ae_params}, images,
                            method="encode_stage_2_inputs", rngs={"sample": crng})
    conditional = unet.in_channels > ae.latent_channels
    if not conditional:
        log.warning("unconditional UNet: paired metrics compare unconditional samples "
                    "to validation labels — expect a low score")

    # validation pairs ---------------------------------------------------------
    _, val_loader = prepare_dataloader(
        args, args.batch, patch_size, randcrop=False,
        size_divisible=2 ** (len(args.autoencoder_def["channels"])
                             + len(args.diffusion_def["channels"]) - 2))

    generated, references = [], []
    n_done = 0
    noise_shape = (args.batch, *latent_shape, ae.latent_channels)
    for batch in val_loader.epoch(0):
        if n_done >= args.num:
            break
        images = jnp.clip(jnp.asarray(batch["image"]), 0, 1).astype(dt)
        labels = jnp.clip(jnp.asarray(batch["label"]), 0, 1).astype(jnp.float32)
        rng, crng, nrng, srng = jax.random.split(rng, 4)
        condition = None
        if conditional:
            condition = encode_condition(images, crng)
        noise = jax.random.normal(nrng, noise_shape, jnp.float32).astype(dt)
        vols = jax.block_until_ready(sampler(noise, srng, condition))
        # trim to --num, to the real PER-HOST sample count (the val loader
        # pads partial batches by repeating the last sample, and on pods each
        # host iterates only its shard), so nothing is double-weighted in the
        # gate score
        host_samples = len(val_loader.dataset) // jax.process_count()
        take = min(args.batch, args.num - n_done, host_samples - n_done)
        if take <= 0:
            break
        generated.append(np.asarray(vols, np.float32)[:take])
        references.append(np.asarray(labels, np.float32)[:take])
        n_done += take
        log.info("evaluated %d/%d pairs", n_done, args.num)

    if not generated:
        log.error("validation set produced no full batches of size %d", args.batch)
        sys.exit(3)  # distinct from argparse's usage-error exit code 2

    report = evaluate_pairs(generated, references, ae=ae, ae_params=ae_params)
    path = args.report or os.path.join(args.model_dir, "evaluation_report.json")
    report.save(path)
    log.info("wrote %s (score=%.4f, threshold=%.2f)", path, report.score, args.threshold)

    if args.gate and not report.passed(args.threshold):
        log.error("GATE FAILED: score %.4f <= threshold %.2f", report.score, args.threshold)
        sys.exit(1)
    return report


from ldm3d_tpu.cli.common import script_entry

script_main = script_entry(main)


if __name__ == "__main__":
    main()
