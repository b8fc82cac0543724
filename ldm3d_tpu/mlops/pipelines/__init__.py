from ldm3d_tpu.mlops.pipelines.training_pipeline import TrainingPipeline

__all__ = ["TrainingPipeline"]
