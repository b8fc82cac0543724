from ldm3d_tpu.serving.model_server import ModelServer
from ldm3d_tpu.serving.metrics import REGISTRY, Counter, Gauge, Histogram

__all__ = ["ModelServer", "REGISTRY", "Counter", "Gauge", "Histogram"]
