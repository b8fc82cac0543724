"""Evaluation subsystem: real image-quality metrics + the CI registration gate.

The reference promises this layer (CI invokes ``model_evaluation`` and gates
registration on score > 0.8, ``mlops-pipeline.yml:212-227``) but never ships
it; its monitoring metrics are mocked. Here it is a first-class component:
jitted 3-D SSIM/MS-SSIM/PSNR/MAE, a VAE-latent Fréchet distance, and an
:class:`EvalReport` the pipeline and CLI gate on.
"""

from ldm3d_tpu.evaluation.evaluator import (
    EvalReport,
    composite_score,
    evaluate_pairs,
    latent_features,
)
from ldm3d_tpu.evaluation.metrics import (
    frechet_distance,
    mae,
    ms_ssim3d,
    mse,
    psnr,
    ssim3d,
)

__all__ = [
    "EvalReport",
    "composite_score",
    "evaluate_pairs",
    "latent_features",
    "frechet_distance",
    "mae",
    "mse",
    "ms_ssim3d",
    "psnr",
    "ssim3d",
]
