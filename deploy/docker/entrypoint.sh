#!/usr/bin/env bash
# Container entrypoint — mode dispatch parity with the reference's
# mlops/docker/entrypoint.sh (api / train / train-diffusion / inference /
# health / bash modes).
set -euo pipefail

MODE="${1:-api}"
shift || true

CONFIG="${LDM_CONFIG_FILE:-/app/ldm3d_tpu/configs/presets/config_train_32g.json}"
ENVFILE="${LDM_ENVIRONMENT_FILE:-/app/ldm3d_tpu/configs/presets/environment.json}"

case "$MODE" in
  api)
    exec python -m ldm3d_tpu.serving.api_server \
      --host "${API_HOST:-0.0.0.0}" --port "${API_PORT:-8000}" \
      -c "$CONFIG" -e "$ENVFILE" \
      --sampler "${LDM_SAMPLER:-ddim}" --steps "${LDM_STEPS:-50}" "$@"
    ;;
  train|train-autoencoder)
    exec python -m ldm3d_tpu.cli.train_autoencoder -c "$CONFIG" -e "$ENVFILE" --amp "$@"
    ;;
  train-diffusion)
    exec python -m ldm3d_tpu.cli.train_diffusion -c "$CONFIG" -e "$ENVFILE" --amp "$@"
    ;;
  pipeline)
    exec python -m ldm3d_tpu.mlops.pipelines.training_pipeline -c "$CONFIG" -e "$ENVFILE" "$@"
    ;;
  inference)
    exec python -m ldm3d_tpu.cli.inference -c "$CONFIG" -e "$ENVFILE" "$@"
    ;;
  health)
    exec python -m ldm3d_tpu.serving.health_check "$@"
    ;;
  jupyter)
    # reference parity (its entrypoint.sh jupyter mode); optional dependency
    exec python -m jupyter lab --ip 0.0.0.0 --port "${JUPYTER_PORT:-8888}" \
      --no-browser --allow-root --NotebookApp.token="${JUPYTER_TOKEN:-}" "$@"
    ;;
  bash)
    exec /bin/bash "$@"
    ;;
  *)
    echo "unknown mode: $MODE (api|train|train-diffusion|pipeline|inference|health|jupyter|bash)" >&2
    exit 2
    ;;
esac
