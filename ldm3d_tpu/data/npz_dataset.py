"""Paired low/high-count NPZ dataset with reference-parity semantics.

Parity targets (reference ``3d_ldm/utils.py:109-193``):
  * NPZ files hold one array under ``arr0``/``arr_0`` (or the first key) of
    shape ``(2, D, H, W)``: index 0 = low-count ("image"), 1 = high-count
    ("label"),
  * explicit train/val dirs, or a single dir split by a seeded shuffle with
    ``val_fraction`` (val falls back to one sample when the fraction is 0),
  * per-replica sharding with drop-last semantics (DistributedSampler parity).

Output layout is NDHWC (channels-last) — the TPU-native layout — rather than
the reference's NCDHW.
"""

from __future__ import annotations

import os
from glob import glob
from typing import Optional, Sequence

import numpy as np

from ldm3d_tpu.data.transforms import (
    center_crop_np,
    random_crop_pair_np,
    scale_intensity_percentiles_np,
)

__all__ = ["NPZPairDataset", "build_file_lists"]


def _load_pair(path: str, use_native: bool = True) -> tuple[np.ndarray, np.ndarray]:
    if use_native:
        from ldm3d_tpu.data import native_loader

        pair = native_loader.load_pair(path)
        if pair is not None:
            return pair
    with np.load(path) as data:
        if "arr0" in data:
            key = "arr0"
        elif "arr_0" in data:
            key = "arr_0"
        else:
            keys = list(data.keys())
            if not keys:
                raise RuntimeError(f"NPZ {path} is empty; expected 'arr0' or 'arr_0'")
            key = keys[0]
        arr = data[key]
    if arr.ndim < 4 or arr.shape[0] < 2:
        raise RuntimeError(f"NPZ {path} expected shape (2, D, H, W), got {arr.shape}")
    low = np.asarray(arr[0], dtype=np.float32)
    high = np.asarray(arr[1], dtype=np.float32)
    return low, high


def build_file_lists(
    npz_dir_train: Optional[str],
    npz_dir_val: Optional[str],
    npz_dir: Optional[str],
    val_fraction: float = 0.1,
    seed: int = 0,
) -> tuple[list[str], list[str]]:
    """Reference file-discovery/split logic (``utils.py:162-184``)."""
    if npz_dir_train and npz_dir_val and os.path.isdir(npz_dir_train) and os.path.isdir(npz_dir_val):
        train_files = sorted(glob(os.path.join(npz_dir_train, "*.npz")))
        val_files = sorted(glob(os.path.join(npz_dir_val, "*.npz")))
        if not train_files:
            raise ValueError(f"no .npz files in train dir {npz_dir_train}")
        if not val_files:
            raise ValueError(f"no .npz files in val dir {npz_dir_val}")
        return train_files, val_files
    if not npz_dir or not os.path.isdir(npz_dir):
        raise ValueError("provide (npz_dir_train and npz_dir_val) or npz_dir")
    all_files = sorted(glob(os.path.join(npz_dir, "*.npz")))
    if not all_files:
        raise ValueError(f"no .npz files in {npz_dir}")
    rng = np.random.RandomState(seed)
    indices = np.arange(len(all_files))
    rng.shuffle(indices)
    n_val = int(len(indices) * val_fraction)
    val_idx = indices[:n_val]
    train_idx = indices[n_val:]
    train_files = [all_files[i] for i in train_idx]
    val_files = [all_files[i] for i in val_idx] if n_val > 0 else [all_files[indices[0]]]
    return train_files, val_files


class NPZPairDataset:
    """Map-style dataset yielding ``{"image": (D,H,W,1), "label": (D,H,W,1)}``.

    ``scale_on_host=False`` defers the percentile intensity scaling to the
    device path (fused into the jitted step); True reproduces the reference's
    in-loader scaling for parity tests.
    """

    def __init__(
        self,
        files: Sequence[str],
        patch_size: Optional[Sequence[int]] = None,
        randcrop: bool = False,
        scale_on_host: bool = True,
        seed: int = 0,
        use_native: bool = True,
    ):
        self.files = list(files)
        self.patch_size = list(patch_size) if patch_size is not None else None
        self.randcrop = randcrop
        self.scale_on_host = scale_on_host
        self.use_native = use_native
        self._rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        return len(self.files)

    def set_epoch_seed(self, seed: int) -> None:
        self._rng = np.random.default_rng(seed)

    def __getitem__(self, idx: int) -> dict[str, np.ndarray]:
        low, high = _load_pair(self.files[idx], use_native=self.use_native)
        low = low[..., None]  # channels-last
        high = high[..., None]
        if self.patch_size is not None:
            if self.randcrop:
                low, high = random_crop_pair_np(low, high, self.patch_size, self._rng)
            else:
                low = center_crop_np(low, self.patch_size)
                high = center_crop_np(high, self.patch_size)
        if self.scale_on_host:
            low = scale_intensity_percentiles_np(low)
            high = scale_intensity_percentiles_np(high)
        return {"image": low.astype(np.float32), "label": high.astype(np.float32)}
