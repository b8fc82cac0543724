from ldm3d_tpu.mlops.pipelines.training_pipeline import (
    BatchInferencePipeline,
    TrainingPipeline,
)

__all__ = ["TrainingPipeline", "BatchInferencePipeline"]
