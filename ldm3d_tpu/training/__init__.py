from ldm3d_tpu.training.lr_schedules import build_lr_schedule, scale_lr_for_world
from ldm3d_tpu.training.preemption import GracefulShutdown
from ldm3d_tpu.training.state import TrainState
from ldm3d_tpu.training.stage1 import (
    Stage1Config,
    make_optimizer,
    make_stage1_eval_step,
    make_stage1_train_step,
)
from ldm3d_tpu.training.distill import (
    DistillConfig,
    make_distillation_step,
    student_timesteps,
)
from ldm3d_tpu.training.stage2 import (
    Stage2Config,
    compute_scale_factor,
    make_diffusion_optimizer,
    make_stage2_eval_step,
    make_stage2_train_step,
    make_stage2_train_step_latents,
)

__all__ = [
    "build_lr_schedule",
    "scale_lr_for_world",
    "TrainState",
    "GracefulShutdown",
    "Stage1Config",
    "make_optimizer",
    "make_stage1_train_step",
    "make_stage1_eval_step",
    "Stage2Config",
    "compute_scale_factor",
    "make_diffusion_optimizer",
    "make_stage2_train_step",
    "make_stage2_train_step_latents",
    "make_stage2_eval_step",
    "DistillConfig",
    "make_distillation_step",
    "student_timesteps",
]
