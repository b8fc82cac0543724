from ldm3d_tpu.ops.attention import volumetric_attention
from ldm3d_tpu.ops.conv3d import conv3d_igemm, conv3d_xla

__all__ = ["volumetric_attention", "conv3d_igemm", "conv3d_xla"]
