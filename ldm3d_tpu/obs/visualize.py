"""Slice visualization for TensorBoard, parity with the reference.

Reference behavior (``3d_ldm/visualize_image.py:32-76``): take the center
slice per axis (axis 2 uses center-10), min-max normalize to [0, 1], return a
(1, H, W) array for TB. Input here is a (D, H, W) numpy array or jax array.
"""

from __future__ import annotations

import numpy as np

__all__ = ["normalize_image_to_uint8", "visualize_one_slice_in_3d_image"]


def normalize_image_to_uint8(image: np.ndarray) -> np.ndarray:
    draw = np.asarray(image, dtype=np.float32)
    if draw.min() < 0:
        draw = draw - draw.min()
    if draw.max() > 1:
        draw = draw / draw.max()
    return (255 * draw).astype(np.uint8)


def visualize_one_slice_in_3d_image(image, axis: int = 2):
    """Return a (1, H, W) float array in [0, 1] for TB, or None on bad input."""
    img = np.asarray(image, dtype=np.float32)
    if img.ndim != 3 or axis not in (0, 1, 2):
        return None
    center = img.shape[axis] // 2
    if axis == 0:
        draw = img[center, :, :]
    elif axis == 1:
        draw = img[:, center, :]
    elif axis == 2:
        draw = img[:, :, max(0, center - 10)]
    else:
        return None
    if draw.min() < 0:
        draw = draw - draw.min()
    if draw.max() > 0:
        draw = draw / draw.max()
    return draw[None, ...]
