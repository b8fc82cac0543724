from ldm3d_tpu.diffusion.schedulers import DDIMScheduler, DDPMScheduler, make_betas
from ldm3d_tpu.diffusion import inferer

__all__ = ["DDPMScheduler", "DDIMScheduler", "make_betas", "inferer"]
