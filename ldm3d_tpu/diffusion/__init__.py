from ldm3d_tpu.diffusion.schedulers import (
    DDIMScheduler,
    DDPMScheduler,
    DPMSolverPPScheduler,
    GridDDIMScheduler,
    distillation_grid,
    karras_timestep_grid,
    make_betas,
    make_timestep_grid,
)
from ldm3d_tpu.diffusion import inferer

__all__ = ["DDPMScheduler", "DDIMScheduler", "DPMSolverPPScheduler", "GridDDIMScheduler",
           "distillation_grid", "karras_timestep_grid", "make_betas", "make_timestep_grid",
           "inferer"]
