from ldm3d_tpu.obs.profiling import StepProfiler, Stopwatch
from ldm3d_tpu.obs.tb import MetricsWriter
from ldm3d_tpu.obs.visualize import normalize_image_to_uint8, visualize_one_slice_in_3d_image

__all__ = [
    "StepProfiler",
    "Stopwatch",
    "MetricsWriter",
    "normalize_image_to_uint8",
    "visualize_one_slice_in_3d_image",
]
