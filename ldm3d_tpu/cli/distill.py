"""Progressive-distillation CLI (stage 3, optional): halve sampler steps.

Loads the trained two-stage artifacts (frozen VAE + 'best' diffusion UNet),
then runs R halving rounds of Salimans-&-Ho progressive distillation
(:mod:`ldm3d_tpu.training.distill`): round r trains a student (initialized
from the current teacher) to match two teacher DDIM steps with one, on a
grid of ``teacher_steps / 2^(r+1)`` steps; the student becomes the next
round's teacher. Saves the final student as the ``distilled`` checkpoint
role with its sampling grid in the metadata — ``inference --use-distilled``
samples it through :class:`ldm3d_tpu.diffusion.GridDDIMScheduler`.

The reference has no fast-sampling path at all (1000-step Python DDPM loop,
``3d_ldm/inference.py:79-99``); this is a capability beyond DDIM/DPM-Solver++:
a distilled 4-8 step sampler cuts serving latency another ~6-12x below
DDIM-50 at a quality cost the distillation loss makes explicit.

Usage: python -m ldm3d_tpu.cli.distill -c CONFIG -e ENV \
         [--teacher-steps 64] [--rounds 3] [--steps-per-round 2000] [--amp]
"""

from __future__ import annotations

import logging
import time

import jax
import jax.numpy as jnp
import numpy as np

from ldm3d_tpu.ckpt import CheckpointManager, StageArtifacts
from ldm3d_tpu.cli.common import (
    build_parser,
    env_seed,
    global_batch_size,
    load_two_stage,
    model_dtype,
    setup,
    track_run,
)
from ldm3d_tpu.data import prepare_dataloader
from ldm3d_tpu.diffusion import DDPMScheduler
from ldm3d_tpu.parallel import shard_batch
from ldm3d_tpu.training import (
    DistillConfig,
    TrainState,
    make_diffusion_optimizer,
    make_distillation_step,
    student_timesteps,
)
from ldm3d_tpu.utils.config_merge import TrainContext

log = logging.getLogger("distill")


def main(argv=None):
    parser = build_parser("Progressive distillation of the diffusion UNet (stage 3)")
    parser.add_argument("--teacher-steps", type=int, default=64,
                        help="starting DDIM grid size N; each round halves it "
                             "(final sampler = N / 2^rounds steps)")
    parser.add_argument("--rounds", type=int, default=3,
                        help="number of halvings (e.g. 64 -> 8 with 3 rounds)")
    parser.add_argument("--steps-per-round", type=int, default=2000,
                        help="optimizer steps per halving round")
    parser.add_argument("--lr", type=float, default=None,
                        help="distillation learning rate (default: config diffusion lr / 10 — "
                             "fine-tuning regime)")
    parser.add_argument("--student-prediction", choices=("epsilon", "sample", "v_prediction"),
                        default=None,
                        help="student regression parameterization (default: the teacher's). "
                             "v_prediction is better behaved at very few steps")
    parser.add_argument("--unconditional", action="store_true",
                        help="distill without concat conditioning")
    parser.add_argument("--guidance-distill", type=float, default=1.0,
                        help="bake classifier-free guidance at this weight into the student "
                             "(guidance distillation, first round only): the sampled student "
                             "then produces w-guided volumes with ONE UNet pass per step. "
                             "Requires a conditional model trained with --cond-dropout")
    parser.add_argument("--use-ema", action="store_true",
                        help="distill from the EMA teacher weights (what --use-ema serves "
                             "at inference; requires --ema-decay at stage-2 train time)")
    args = parser.parse_args(argv)
    args, mesh = setup(args)
    if mesh.shape.get("stage", 1) > 1 or mesh.shape.get("spatial", 1) > 1 \
            or mesh.shape.get("model", 1) > 1:
        raise ValueError("distillation runs data-parallel; drop --pipeline/--spatial/--tensor")
    dt = model_dtype(args)
    train_cfg = args.diffusion_train
    ctx = TrainContext(args)
    rng = jax.random.PRNGKey(env_seed(args))

    if args.rounds < 1:
        raise ValueError("--rounds must be >= 1")
    if args.teacher_steps % (1 << args.rounds):
        raise ValueError(f"--teacher-steps {args.teacher_steps} must be divisible by "
                         f"2^rounds = {1 << args.rounds}")
    if args.unconditional and args.guidance_distill != 1.0:
        # fail BEFORE checkpoint restore / dataloader setup, with the other
        # argument contracts (DistillConfig would raise it rounds later)
        raise ValueError("--guidance-distill needs a conditional model "
                         "(incompatible with --unconditional)")

    # data: same pairs/crops as stage 2 (conditions must match training)
    size_divisible = 2 ** (
        len(args.autoencoder_def["channels"]) + len(args.diffusion_def["channels"]) - 2
    )
    batch_size = global_batch_size(train_cfg["batch_size"], mesh)
    train_loader, _ = prepare_dataloader(
        args, batch_size, train_cfg["patch_size"], randcrop=False,
        size_divisible=size_divisible)

    # trained artifacts: frozen VAE + teacher UNet + its scale factor
    # (--use-ema distills the weights the user actually serves)
    ae, ae_params, unet, teacher_params, _, scale_factor = load_two_stage(
        args, mesh, dt, rng, use_ema=args.use_ema)

    sched_cfg = ctx.scheduler_config()
    scheduler = DDPMScheduler.create(
        num_train_timesteps=sched_cfg["num_train_timesteps"],
        schedule=sched_cfg.get("schedule", "scaled_linear_beta"),
        beta_start=sched_cfg["beta_start"], beta_end=sched_cfg["beta_end"],
        prediction_type=sched_cfg["prediction_type"])
    if args.student_prediction and args.student_prediction != scheduler.prediction_type:
        # the student regresses its own parameterization from round 1 on;
        # rounds > 1 then distill student->student in that parameterization
        log.info("student parameterization: %s (teacher: %s)",
                 args.student_prediction, scheduler.prediction_type)

    lr = args.lr if args.lr is not None else train_cfg["lr"] * 0.1
    losses_final = float("nan")
    with mesh:
        for r in range(args.rounds):
            n_teacher = args.teacher_steps >> r
            # round 0 distills the original (epsilon) teacher; later rounds
            # distill the previous student, which already regresses the
            # student parameterization
            teacher_sched = scheduler if r == 0 else scheduler.replace(
                prediction_type=args.student_prediction or scheduler.prediction_type)
            cfg = DistillConfig(
                teacher_steps=n_teacher,
                conditional=not args.unconditional,
                student_prediction_type=args.student_prediction,
                # guided teacher on the FIRST round only: later rounds
                # distill the already-guided student at 1.0
                guidance_scale=args.guidance_distill if r == 0 else 1.0,
            )
            step = make_distillation_step(unet, ae, teacher_sched, cfg)
            student = TrainState.create(
                unet.apply, jax.tree_util.tree_map(jnp.array, teacher_params),
                make_diffusion_optimizer(lambda _: lr))
            t0, seen, losses = time.time(), 0, []
            epoch = 0
            while seen < args.steps_per_round:
                seen_before = seen
                for batch in train_loader.epoch(epoch):
                    if seen >= args.steps_per_round:
                        break
                    sb = shard_batch(mesh, {"image": batch["image"], "label": batch["label"]})
                    rng, srng = jax.random.split(rng)
                    student, metrics = step(student, teacher_params, ae_params, sb,
                                            jnp.float32(scale_factor), srng)
                    # keep the loss LAZY: a float() here would block host
                    # dispatch on every step (async-dispatch overlap lost)
                    losses.append(metrics["distill_loss"])
                    seen += 1
                if seen == seen_before:
                    raise RuntimeError(
                        "train loader yielded no batches this epoch — dataset "
                        "smaller than the global batch? (would loop forever)")
                epoch += 1
            losses = [float(np.asarray(x)) for x in losses]
            losses_final = float(np.mean(losses[-10:])) if losses else float("nan")
            log.info("round %d: %d-step teacher -> %d-step student, %d steps, "
                     "loss %.5f -> %.5f (%.1fs)", r, n_teacher, n_teacher // 2,
                     seen, float(np.mean(losses[:10])), losses_final, time.time() - t0)
            teacher_params = student.params

        final_steps = args.teacher_steps >> args.rounds
        grid = student_timesteps(scheduler.num_train_timesteps, 2 * final_steps)
        ckpt = CheckpointManager(args.model_dir, StageArtifacts.DIFFUSION)
        ckpt.save("distilled", {"params": teacher_params}, meta={
            "timesteps": [int(t) for t in grid],
            "num_steps": int(final_steps),
            "teacher_steps": int(args.teacher_steps),
            "rounds": int(args.rounds),
            "scale_factor": float(scale_factor),
            "prediction_type": args.student_prediction or scheduler.prediction_type,
            "teacher_role": "ema" if args.use_ema else "best",
            "guidance_scale": float(args.guidance_distill),
            "final_loss": losses_final,
        })
    log.info("saved %d-step distilled sampler (grid %s) to %s",
             final_steps, list(grid), ckpt.path("distilled"))
    track_run(args, "diffusion", {"distill_final_loss": losses_final,
                                  "distilled_steps": final_steps})
    return losses_final


from ldm3d_tpu.cli.common import script_entry

script_main = script_entry(main)


if __name__ == "__main__":
    main()
