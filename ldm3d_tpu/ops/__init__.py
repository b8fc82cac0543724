from ldm3d_tpu.ops.attention import volumetric_attention

__all__ = ["volumetric_attention"]
