"""CLI entry points mirroring the reference scripts:

  python -m ldm3d_tpu.cli.train_autoencoder  (ref: 3d_ldm/train_autoencoder.py)
  python -m ldm3d_tpu.cli.train_diffusion    (ref: 3d_ldm/train_diffusion.py)
  python -m ldm3d_tpu.cli.inference          (ref: 3d_ldm/inference.py)
  python -m ldm3d_tpu.cli.check_system       (ref: 3d_ldm/check_system.py)
"""
