"""Inference CLI: generate volumes with the trained two-stage LDM.

Mirrors the reference driver (``3d_ldm/inference.py``): loads both best
checkpoints (:71-77), builds the scheduler (:79-84), samples noise at
``latent_shape = patch_size // downsample_factor`` (:88-89), runs the reverse
loop + decode (:94-99), and writes volumes to ``output_dir`` (:100-102) —
NIfTI when nibabel is available, ``.npy`` otherwise.

TPU-native differences (deliberate, SURVEY.md 2.4.3 and BASELINE.md):
  * the whole reverse loop + decode is ONE compiled XLA program (lax.scan),
    not 1000 Python-stepped UNet calls,
  * ``--sampler ddim --steps 50`` enables the fast path (reference has none),
  * conditioning is coherent: a UNet trained with concat conditioning
    (in_channels > latent_channels) gets a low-count conditioning volume
    (from the validation NPZ set or synthetic data); the reference would
    crash here since it always samples unconditionally,
  * the training-time ``scale_factor`` is restored from checkpoint metadata
    (the reference silently uses 1.0).

Usage: python -m ldm3d_tpu.cli.inference -c CONFIG -e ENV [-n NUM]
       [--sampler ddpm|ddim] [--steps N]
"""

from __future__ import annotations

import logging
import os
import time
from datetime import datetime

import jax
import jax.numpy as jnp
import numpy as np

from ldm3d_tpu.cli.common import build_parser, env_seed, model_dtype, setup
from ldm3d_tpu.data import prepare_dataloader
from ldm3d_tpu.diffusion import inferer
from ldm3d_tpu.utils.config_merge import TrainContext

log = logging.getLogger("inference")


def save_volume(vol: np.ndarray, out_dir: str, stem: str) -> str:
    """NIfTI output (reference parity, ``inference.py:100-102``): nibabel
    when installed, else the built-in dependency-free NIfTI-1 writer."""
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, stem + ".nii.gz")
    try:
        import nibabel as nib

        nib.save(nib.Nifti1Image(vol.astype(np.float32), np.eye(4)), path)
    except ImportError:
        from ldm3d_tpu.utils.nifti import write_nifti

        write_nifti(path, vol.astype(np.float32))
    return path


def build_sampler_fn(args, ae, ae_params, unet, u_params, scheduler, scale_factor,
                     mesh=None):
    """Compiled sampler: reverse-loop scan (+ decode) programs.

    Default: two dispatches per batch — scan, then decode — vs the
    reference's 1000 Python-stepped UNet calls. ``--fused-decode`` compiles
    the reverse loop AND the VAE decode as literally ONE XLA program (the
    BASELINE.md north star); the two-program default exists because some
    restricted compile services cap program size (docs/PERFORMANCE.md).

    When ``mesh`` has a data axis that divides the batch, the noise (and
    condition) batch dim is sharded over it: each chip denoises+decodes
    batch/N volumes of the SAME compiled program (GSPMD propagates the batch
    sharding; no collectives needed) — N-chip sampling throughput with no
    code changes elsewhere.
    """

    # params are explicit jit args — closing over the weight arrays would
    # inline them as HLO constants and explode compile time/size
    @jax.jit
    def scan_fn(params, noise, rng, condition):
        def unet_apply(z, t):
            return unet.apply({"params": params}, z, t)
        return inferer.sample_latents(unet_apply, scheduler, noise, rng, condition=condition,
                                      guidance_scale=args.guidance)

    def _decode(params, z):
        return ae.apply({"params": params}, z / jnp.asarray(scale_factor, z.dtype),
                        method="decode_stage_2_outputs")

    decode_fn = jax.jit(_decode)

    @jax.jit
    def fused_fn(u_params, ae_params, noise, rng, condition):
        def unet_apply(z, t):
            return unet.apply({"params": u_params}, z, t)
        lat = inferer.sample_latents(unet_apply, scheduler, noise, rng, condition=condition,
                                     guidance_scale=args.guidance)
        return _decode(ae_params, lat)

    from ldm3d_tpu.parallel import dp_sample_placer

    place, n_shards = dp_sample_placer(args.batch, mesh)
    n_data = mesh.shape["data"] if mesh is not None else 1
    if n_shards > 1:
        log.info("data-parallel sampling: batch %d sharded over %d chips",
                 args.batch, n_shards)
    elif n_data > 1 and jax.process_count() == 1:
        log.warning("--batch %d not divisible by %d data-parallel chips; "
                    "sampling runs on one chip (pick --batch as a multiple "
                    "to use the whole mesh)", args.batch, n_data)

    from ldm3d_tpu.cli.common import resolve_decode_chunk

    fused = getattr(args, "fused_decode", False)
    chunk = resolve_decode_chunk(getattr(args, "decode_chunk", 0) or 0, log)
    if chunk and fused:
        log.info("--decode-chunk ignored: --fused-decode compiles the reverse "
                 "loop + whole-batch decode as one program")
        chunk = 0
    if chunk and n_shards > 1:
        log.info("--decode-chunk ignored: batch is data-parallel sharded over "
                 "%d chips (decode stays whole-batch per chip)", n_shards)
        chunk = 0

    def run(noise, rng, condition=None):
        noise = place(noise)
        if condition is not None:
            condition = place(condition)
        if fused:
            return fused_fn(u_params, ae_params, noise, rng, condition)
        lat = scan_fn(u_params, noise, rng, condition)
        if chunk and args.batch > chunk:
            # small-chunk decode is measurably faster on device (31% at 96^3
            # batch 8 with chunk 1 on v5e — docs/PERFORMANCE.md): enqueue all
            # chunk programs; the caller materializes them while the next
            # batch's scan runs, so the extra dispatches stay hidden
            return [decode_fn(ae_params, lat[s:s + chunk])
                    for s in range(0, args.batch, chunk)]
        return decode_fn(ae_params, lat)

    return run


def main(argv=None):
    parser = build_parser("TPU latent diffusion inference")
    parser.add_argument("-n", "--num", type=int, default=1,
                        help="number of generation calls (total volumes = num x batch)")
    from ldm3d_tpu.cli.common import SAMPLERS

    parser.add_argument("--sampler", choices=SAMPLERS, default="ddpm",
                        help="ddpm = full-loop reference parity; ddim = fast path; "
                             "dpm = DPM-Solver++ 2M (fewer steps at equal quality); "
                             "dpm3 = DPM-Solver++ 3M (third-order; use >=20 steps)")
    from ldm3d_tpu.cli.common import TIMESTEP_SPACINGS

    parser.add_argument("--timestep-spacing", choices=TIMESTEP_SPACINGS, default=None,
                        help="inference timestep grid: leading = MONAI set_timesteps "
                             "parity (default); trailing anchors at t_max so few-step "
                             "grids cover the highest-noise band; karras = EDM "
                             "sigma-spaced grid anchored at both ends (most accurate "
                             "few-step spacing; ddim/dpm/dpm3 only)")
    parser.add_argument("--steps", type=int, default=None,
                        help="inference steps (default: 50 for ddim/dpm; full schedule "
                             "for ddpm — an explicit value subsamples ddpm's schedule "
                             "MONAI set_timesteps-style)")
    parser.add_argument("--batch", type=int, default=1,
                        help="volumes per compiled sample call (prefer multiples of 8: "
                             "the batch dim pads to the next sublane multiple, so e.g. "
                             "batch 12 pays batch-16 cost — docs/PERFORMANCE.md)")
    parser.add_argument("--guidance", type=float, default=1.0,
                        help="classifier-free guidance scale (1.0 = off; train with --cond-dropout)")
    parser.add_argument("--use-ema", action="store_true",
                        help="sample with the EMA UNet weights (requires --ema-decay at train time)")
    parser.add_argument("--use-distilled", action="store_true",
                        help="sample the progressively-distilled student (cli.distill) on its "
                             "few-step grid — overrides --sampler/--steps with the GridDDIM "
                             "schedule stored in the 'distilled' checkpoint metadata")
    parser.add_argument("--fused-decode", action="store_true",
                        help="compile reverse loop + VAE decode as ONE XLA program "
                             "(one dispatch per batch; needs a compile service without "
                             "program-size caps — production TPU runtimes are fine)")
    parser.add_argument("--decode-chunk", default="0",
                        help="decode the sampled batch in chunks of this many volumes "
                             "(0 = whole batch; 'auto' probes the device->host rate and "
                             "picks whole-batch on fast links, chunk 1 on slow ones "
                             "whose per-chunk readbacks overlap the next batch's "
                             "reverse scan — docs/PERFORMANCE.md)")
    args = parser.parse_args(argv)
    args, mesh = setup(args)
    if mesh.shape.get("stage", 1) > 1:
        raise ValueError("--pipeline is a training-time axis; sampling scales via "
                         "the data axis (and --spatial for oversize volumes)")
    dt = model_dtype(args)
    ctx = TrainContext(args)
    rng = jax.random.PRNGKey(env_seed(args))

    patch_size = args.diffusion_train["patch_size"]

    # models + checkpoints + scheduler (shared with cli.evaluate) --------------
    from ldm3d_tpu.cli.common import load_two_stage, make_sampling_scheduler

    if args.use_distilled and args.use_ema:
        raise ValueError("--use-distilled and --use-ema are mutually exclusive roles")
    ae, ae_params, unet, u_params, latent_shape, scale_factor = load_two_stage(
        args, mesh, dt, rng, use_ema=args.use_ema)
    if args.use_distilled:
        from ldm3d_tpu.cli.common import load_distilled, load_distilled_meta
        from ldm3d_tpu.parallel import replicated_sharding

        if args.guidance != 1.0:
            # the student's guidance level is fixed at distillation time
            # (1.0, or --guidance-distill's baked weight) — same rule the
            # server enforces. Meta-only peek: fail BEFORE the params restore.
            baked = float(load_distilled_meta(args.model_dir).get("guidance_scale", 1.0))
            raise ValueError(
                f"--guidance is unavailable with --use-distilled: the student "
                f"bakes guidance w={baked} in "
                f"(re-run ldm3d-distill --guidance-distill to change it)")
        u_params, scheduler, dmeta = load_distilled(
            args.model_dir, u_params, ctx.scheduler_config(),
            sharding=replicated_sharding(mesh))
        scale_factor = float(dmeta.get("scale_factor", scale_factor))
        if args.steps is not None or args.sampler != "ddpm":
            log.info("--use-distilled overrides --sampler/--steps")
        log.info("distilled sampler: %d steps on grid %s",
                 len(dmeta["timesteps"]), dmeta["timesteps"])
    else:
        scheduler = make_sampling_scheduler(args.sampler, args.steps, ctx.scheduler_config(),
                                            timestep_spacing=getattr(args, "timestep_spacing", None))

    conditional = unet.in_channels > ae.latent_channels
    condition = None
    if conditional:
        # concat-conditioned UNet: fetch a low-count conditioning volume
        _, val_loader = prepare_dataloader(args, args.batch, patch_size, randcrop=False,
                                           size_divisible=2 ** (len(args.autoencoder_def["channels"])
                                                                + len(args.diffusion_def["channels"]) - 2))
        batch = next(iter(val_loader.epoch(0)))
        images = jnp.clip(jnp.asarray(batch["image"]), 0, 1).astype(dt)
        rng, crng = jax.random.split(rng)
        if mesh.shape.get("spatial", 1) > 1:
            # depth-sharded encode: the unsharded model would OOM at exactly
            # the volume sizes --spatial exists for
            from ldm3d_tpu.parallel import make_spatial_encoder

            condition = make_spatial_encoder(ae, mesh)(ae_params, images, crng)
        else:
            condition = ae.apply({"params": ae_params}, images,
                                 method="encode_stage_2_inputs", rngs={"sample": crng})
        log.info("conditional sampling (concat) with condition shape %s", condition.shape)

    if mesh.shape.get("spatial", 1) > 1:
        # depth-sharded sampling: one sample spread over the spatial axis
        # (halo convs / psum norms / gathered-kv attention, docs/SCALING.md)
        from ldm3d_tpu.parallel import make_spatial_sampler, validate_spatial_divisibility

        validate_spatial_divisibility(latent_shape[0], mesh.shape["spatial"],
                                      len(args.diffusion_def["channels"]) - 1)
        if args.batch % mesh.shape["data"]:
            raise ValueError(
                f"--batch {args.batch} must be divisible by the data axis "
                f"({mesh.shape['data']} = devices/spatial); e.g. use -g {mesh.shape['spatial']} "
                f"--spatial {mesh.shape['spatial']} to devote all devices to one volume"
            )
        sampler = make_spatial_sampler(unet, ae, scheduler, mesh, scale_factor=scale_factor,
                                       guidance_scale=args.guidance)

        def run(noise, rng, condition=None):
            return sampler(u_params, ae_params, noise, rng, condition)
    else:
        run = build_sampler_fn(args, ae, ae_params, unet, u_params, scheduler, scale_factor,
                               mesh=mesh)

    noise_shape = (args.batch, *latent_shape, ae.latent_channels)
    os.makedirs(args.output_dir, exist_ok=True)
    n_steps = len(np.asarray(scheduler.timesteps))

    written: list[str] = []

    def flush(i, vols_dev, t_enq):
        """Materialize + write one batch (called while the NEXT batch computes
        on device, so host readback and NIfTI IO overlap device compute)."""
        if isinstance(vols_dev, (list, tuple)):  # --decode-chunk programs
            vols = np.concatenate([np.asarray(v, dtype=np.float32) for v in vols_dev])
        else:
            vols = np.asarray(vols_dev, dtype=np.float32)
        log.info("sample %d: %s in %.2fs since enqueue (%s, %d steps)",
                 i, vols.shape, time.perf_counter() - t_enq, args.sampler, n_steps)
        for b in range(vols.shape[0]):
            stem = datetime.now().strftime(f"synimg_%Y%m%d_%H%M%S_{i}_{b}")
            # single-channel models write bare (D,H,W) volumes; multi-channel
            # variants (reference config_train_16g is 2-channel) keep the
            # channel axis as a 4-D NIfTI instead of silently dropping it
            vol = vols[b, ..., 0] if vols.shape[-1] == 1 else vols[b]
            path = save_volume(vol, args.output_dir, stem)
            written.append(path)
            log.info("wrote %s", path)

    pending = None
    for i in range(args.num):
        rng, nrng, srng = jax.random.split(rng, 3)
        noise = jax.random.normal(nrng, noise_shape, jnp.float32).astype(dt)
        t0 = time.perf_counter()
        cur = run(noise, srng, condition)
        if pending is not None:
            flush(*pending)
        pending = (i, cur, t0)
    if pending is not None:
        flush(*pending)
    return written


from ldm3d_tpu.cli.common import script_entry

script_main = script_entry(main)


if __name__ == "__main__":
    main()
