"""CLI entry points mirroring (and extending) the reference scripts:

  python -m ldm3d_tpu.cli.train_autoencoder  (ref: 3d_ldm/train_autoencoder.py)
  python -m ldm3d_tpu.cli.train_diffusion    (ref: 3d_ldm/train_diffusion.py)
  python -m ldm3d_tpu.cli.inference          (ref: 3d_ldm/inference.py)
  python -m ldm3d_tpu.cli.check_system       (ref: 3d_ldm/check_system.py)
  python -m ldm3d_tpu.cli.evaluate           (ref CI's model_evaluation step,
                                              which its repo never shipped)
  python -m ldm3d_tpu.cli.prepare_data       (ref DAG's data_preprocessing step,
                                              which its repo never shipped)
  python -m ldm3d_tpu.cli.import_checkpoint  (migrate reference torch .pt
                                              checkpoints onto TPU)
"""
