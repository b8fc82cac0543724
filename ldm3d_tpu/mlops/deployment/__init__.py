from ldm3d_tpu.mlops.deployment.deploy_model import ModelDeployment

__all__ = ["ModelDeployment"]
