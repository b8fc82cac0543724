"""ldm3d_tpu — a TPU-native 3D Latent Diffusion Model framework.

A ground-up JAX / Flax / Pallas / pjit rebuild of the capabilities of the
reference ``sanazkaviani/3d-latent-diffusion-model`` repository (a MONAI +
PyTorch-DDP two-stage 3D latent diffusion pipeline for paired low/high-count
volumetric medical images).

The compute path is pure XLA: 3D convolutional VAE-GAN (stage 1), conditional
latent diffusion UNet (stage 2), and a reverse-diffusion sampler compiled as a
single ``lax.scan`` program. Distribution rides a ``jax.sharding.Mesh``
(data-parallel by default) instead of NCCL/DDP.

Package layout (see SURVEY.md section 7 for the design rationale):
  configs/    config system with reference-dialect parity (@ref / $expr / _target_)
  nn/         Flax modules (AutoencoderKL, DiffusionUNet3D, PatchDiscriminator3D, LPIPS)
  ops/        XLA/Pallas kernels (volumetric attention, conv wrappers)
  diffusion/  DDPM/DDIM schedulers + latent inferer (train-step fn + scan sampler)
  losses/     L1/L2, KL, LSGAN patch-adversarial, 2.5D perceptual
  data/       NPZ pair dataset, transforms, host->device pipeline, synthetic data
  parallel/   mesh construction, shardings, collective helpers
  training/   train states, stage-1 / stage-2 train steps, LR schedules
  ckpt/       orbax checkpoint management (best/last, full train state)
  obs/        TensorBoard writing, slice visualization, profiling hooks
  cli/        entry points mirroring the reference scripts
  serving/    FastAPI model server (optional deps gated)
"""

# single-sourced from pyproject.toml (the installed distribution metadata);
# the literal fallback covers running from a source tree without installing
try:
    from importlib.metadata import version as _dist_version

    __version__ = _dist_version("ldm3d-tpu")
except Exception:  # noqa: BLE001 - not installed: source-tree run
    __version__ = "0.1.0"
