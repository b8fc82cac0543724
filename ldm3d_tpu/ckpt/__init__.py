from ldm3d_tpu.ckpt.manager import CheckpointManager, StageArtifacts

__all__ = ["CheckpointManager", "StageArtifacts"]
