from ldm3d_tpu.data.latent_cache import LatentCache
from ldm3d_tpu.data.loader import BatchLoader, device_prefetch
from ldm3d_tpu.data.npz_dataset import NPZPairDataset, build_file_lists
from ldm3d_tpu.data.synthetic import make_pair, write_synthetic_npz_dir
from ldm3d_tpu.data.transforms import (
    center_crop_np,
    random_crop_pair_np,
    scale_intensity_percentiles,
    scale_intensity_percentiles_np,
    val_patch_size,
)
from ldm3d_tpu.data.pipeline import prepare_dataloader

__all__ = [
    "LatentCache",
    "BatchLoader",
    "device_prefetch",
    "NPZPairDataset",
    "build_file_lists",
    "make_pair",
    "write_synthetic_npz_dir",
    "center_crop_np",
    "random_crop_pair_np",
    "scale_intensity_percentiles",
    "scale_intensity_percentiles_np",
    "val_patch_size",
    "prepare_dataloader",
]
