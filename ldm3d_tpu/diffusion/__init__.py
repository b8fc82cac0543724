from ldm3d_tpu.diffusion.schedulers import DDIMScheduler, DDPMScheduler, DPMSolverPPScheduler, make_betas
from ldm3d_tpu.diffusion import inferer

__all__ = ["DDPMScheduler", "DDIMScheduler", "DPMSolverPPScheduler", "make_betas", "inferer"]
