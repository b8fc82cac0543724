from ldm3d_tpu.mlops.monitoring.model_monitoring import DriftDetector, ModelMonitoring

__all__ = ["DriftDetector", "ModelMonitoring"]
