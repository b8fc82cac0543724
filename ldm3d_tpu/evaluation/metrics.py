"""Jitted 3D image-quality metrics: PSNR, SSIM, MS-SSIM, Fréchet distance.

The reference's CI/CD gates model registration on an evaluation score
(``mlops-pipeline.yml:212-227`` — "performance > 0.8") computed by a
``model_evaluation`` module that does not exist in its repo (SURVEY.md §3.5);
its monitoring layer likewise mocks the metrics
(``mlops/monitoring/model_monitoring.py:177-191``). This module supplies the
real thing, TPU-first: every paired metric is a single jitted XLA program
over ``(B, D, H, W, C)`` volumes (channels-last, fp32 accumulation), so a
whole validation batch is scored in one device dispatch.

Volumes are assumed intensity-scaled to ``[0, 1]`` (the pipeline's
``ScaleIntensityRangePercentiles`` output range); pass ``data_range`` to
override.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "mae",
    "mse",
    "psnr",
    "ssim3d",
    "ms_ssim3d",
    "frechet_distance",
    "gaussian_kernel1d",
]


def _flat_reduce(x: jax.Array) -> jax.Array:
    """Mean over everything but the leading batch axis."""
    return jnp.mean(x.reshape(x.shape[0], -1), axis=1)


def mae(pred: jax.Array, target: jax.Array) -> jax.Array:
    """Per-sample mean absolute error, shape ``(B,)``."""
    return _flat_reduce(jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32)))


def mse(pred: jax.Array, target: jax.Array) -> jax.Array:
    """Per-sample mean squared error, shape ``(B,)``."""
    d = pred.astype(jnp.float32) - target.astype(jnp.float32)
    return _flat_reduce(d * d)


def psnr(pred: jax.Array, target: jax.Array, data_range: float = 1.0) -> jax.Array:
    """Per-sample peak signal-to-noise ratio in dB, shape ``(B,)``.

    Identical volumes give ``inf`` (kept, not clamped — callers that need a
    finite composite score should clip; see :mod:`evaluator`).
    """
    m = mse(pred, target)
    return 10.0 * jnp.log10((data_range * data_range) / m)


def gaussian_kernel1d(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    """Normalized 1-D Gaussian window (the SSIM standard 11/1.5)."""
    half = (size - 1) / 2.0
    x = np.arange(size, dtype=np.float64) - half
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return (k / k.sum()).astype(np.float32)


def _filter3d(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """Separable depthwise Gaussian filter along D, H, W of ``(B,D,H,W,C)``.

    Three rank-5 depthwise convs (feature_group_count=C) rather than one
    k^3 conv: O(3k) work per voxel instead of O(k^3), and each pass is a
    dense contraction XLA tiles onto the MXU.
    """
    c = x.shape[-1]
    k = kernel.shape[0]
    dn = jax.lax.conv_dimension_numbers(x.shape, (k, 1, 1, 1, c), ("NDHWC", "DHWIO", "NDHWC"))
    for axis in range(3):
        shape = [1, 1, 1]
        shape[axis] = k
        # DHWIO with I=1, O=C and feature_group_count=C → per-channel filter
        w = jnp.broadcast_to(kernel.reshape(shape + [1, 1]), tuple(shape) + (1, c))
        x = jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1, 1), padding="VALID",
            dimension_numbers=dn, feature_group_count=c,
        )
    return x


@functools.partial(jax.jit, static_argnames=("window_size", "sigma", "return_cs"))
def ssim3d(
    pred: jax.Array,
    target: jax.Array,
    data_range: float = 1.0,
    window_size: int = 11,
    sigma: float = 1.5,
    return_cs: bool = False,
):
    """Per-sample 3-D SSIM over ``(B,D,H,W,C)`` volumes, shape ``(B,)``.

    Gaussian-window SSIM (Wang et al. 2004) with the standard 11-tap, σ=1.5
    window applied separably along depth/height/width; constants
    ``C1=(0.01·L)²``, ``C2=(0.03·L)²``. fp32 throughout.
    """
    x = pred.astype(jnp.float32)
    y = target.astype(jnp.float32)
    # VALID filtering with a window longer than a spatial dim produces an
    # EMPTY map (mean of nothing = NaN, silently failing the CI gate for
    # thin-slab volumes); clamp to the smallest spatial extent, kept odd
    window_size = min(window_size, *pred.shape[1:4])
    window_size = window_size if window_size % 2 == 1 else window_size - 1
    kern = jnp.asarray(gaussian_kernel1d(window_size, sigma))

    mu_x = _filter3d(x, kern)
    mu_y = _filter3d(y, kern)
    mu_xx = mu_x * mu_x
    mu_yy = mu_y * mu_y
    mu_xy = mu_x * mu_y
    sigma_xx = _filter3d(x * x, kern) - mu_xx
    sigma_yy = _filter3d(y * y, kern) - mu_yy
    sigma_xy = _filter3d(x * y, kern) - mu_xy

    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    cs_map = (2.0 * sigma_xy + c2) / (sigma_xx + sigma_yy + c2)
    ssim_map = ((2.0 * mu_xy + c1) / (mu_xx + mu_yy + c1)) * cs_map
    if return_cs:
        return _flat_reduce(ssim_map), _flat_reduce(cs_map)
    return _flat_reduce(ssim_map)


# standard MS-SSIM level weights (Wang et al. 2003), truncated+renormalized
# when the volume is too small for all five scales
_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _avg_pool2(x: jax.Array) -> jax.Array:
    """2× average-pool along D/H/W (channels-last)."""
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 2, 1), (1, 2, 2, 2, 1), "VALID"
    ) / 8.0


def max_msssim_levels(min_spatial: int, window_size: int = 11) -> int:
    """Largest level count such that the coarsest scale still fits the window."""
    levels = 0
    size = min_spatial
    while size >= window_size and levels < 5:
        levels += 1
        size //= 2
    return max(levels, 1)


def ms_ssim3d(
    pred: jax.Array,
    target: jax.Array,
    data_range: float = 1.0,
    window_size: int = 11,
    sigma: float = 1.5,
    levels: int | None = None,
) -> jax.Array:
    """Per-sample multi-scale SSIM, shape ``(B,)``.

    ``levels`` defaults to as many of the standard 5 scales as the volume
    supports (each scale must keep ≥ ``window_size`` voxels per axis);
    truncated weights are renormalized to sum to 1.
    """
    if levels is None:
        levels = max_msssim_levels(min(pred.shape[1:4]), window_size)
    weights = np.asarray(_MSSSIM_WEIGHTS[:levels], np.float32)
    weights = weights / weights.sum()

    x, y = pred, target
    vals = []
    for lvl in range(levels):
        s, cs = ssim3d(x, y, data_range=data_range, window_size=window_size,
                       sigma=sigma, return_cs=True)
        vals.append(s if lvl == levels - 1 else cs)
        if lvl != levels - 1:
            x, y = _avg_pool2(x), _avg_pool2(y)
    # product of cs^w over coarse scales times ssim^w at the final scale;
    # relu the factors first — small-sample cs can dip slightly negative
    out = jnp.ones_like(vals[0])
    for w, v in zip(weights, vals):
        out = out * jnp.power(jnp.maximum(v, 0.0), w)
    return out


def frechet_distance(feats_a: np.ndarray, feats_b: np.ndarray, eps: float = 1e-6) -> float:
    """Fréchet distance between Gaussians fit to two feature sets ``(N, F)``.

    ``d² = |μ_a − μ_b|² + tr(Σ_a + Σ_b − 2·(Σ_a^{1/2} Σ_b Σ_a^{1/2})^{1/2})``,
    the FID formula, computed host-side in float64 with symmetric-PSD square
    roots via eigendecomposition (no scipy dependency). Feature extraction is
    the caller's job — see :func:`evaluator.latent_features`, which uses the
    frozen stage-1 VAE encoder as the domain-appropriate feature network
    (there is no pretrained 3-D Inception to match FID exactly, and the
    reference has no FID path at all).
    """
    a = np.asarray(feats_a, np.float64)
    b = np.asarray(feats_b, np.float64)
    if a.ndim != 2 or b.ndim != 2 or a.shape[1] != b.shape[1]:
        raise ValueError(f"need (N,F) feature arrays with equal F, got {a.shape} vs {b.shape}")
    mu_a, mu_b = a.mean(0), b.mean(0)
    cov_a = np.cov(a, rowvar=False)
    cov_b = np.cov(b, rowvar=False)
    cov_a = np.atleast_2d(cov_a) + eps * np.eye(a.shape[1])
    cov_b = np.atleast_2d(cov_b) + eps * np.eye(b.shape[1])

    def _sqrtm_psd(m: np.ndarray) -> np.ndarray:
        vals, vecs = np.linalg.eigh((m + m.T) / 2.0)
        vals = np.clip(vals, 0.0, None)
        return (vecs * np.sqrt(vals)) @ vecs.T

    sa = _sqrtm_psd(cov_a)
    covmean = _sqrtm_psd(sa @ cov_b @ sa)
    diff = mu_a - mu_b
    d2 = float(diff @ diff + np.trace(cov_a) + np.trace(cov_b) - 2.0 * np.trace(covmean))
    return max(d2, 0.0)
