"""MLOps shell: experiment tracking, model registry, monitoring, pipelines.

Capability parity with the reference's ``3d_ldm/mlops/`` tree (SURVEY.md 2.1):
tracking/registry (``mlflow_integration.py``), drift/performance monitoring
(``monitoring/model_monitoring.py``), training pipeline orchestration
(``pipelines/azure_ml_pipeline.py``), and deployment
(``deployment/deploy_model.py``) — re-homed for a TPU/GKE world. Cloud SDKs
(mlflow, google-cloud, azure) are optional: every module degrades to local
file-based behavior so the APIs stay testable offline.
"""
