#!/usr/bin/env bash
# One-command Docker setup: build the image, create the network/volumes, and
# start a container in the requested mode.
#
# TPU-native analog of the reference's mlops/docker/setup_docker.ps1
# (build image, named network, persistent volumes, per-mode port mapping,
# quick-command summary). GPU passthrough (`--gpus all`) becomes TPU VM
# device passthrough: on a Cloud TPU VM the accelerator is exposed through
# /dev/accel* + the libtpu runtime, so training/inference modes run with
# `--privileged` and the host's /dev mounted (the supported way to hand a
# container the TPU until the device plugin lands outside Kubernetes; on GKE
# use deploy/kubernetes/ instead, which requests google.com/tpu resources).
#
# Usage: ./setup_docker.sh [dev|prod] [api|train|train-autoencoder|train-diffusion|inference|jupyter]
set -euo pipefail

ENVIRONMENT="${1:-dev}"
MODE="${2:-api}"

case "$ENVIRONMENT" in dev|prod) ;; *) echo "environment must be dev|prod" >&2; exit 1 ;; esac
case "$MODE" in api|train|train-autoencoder|train-diffusion|inference|jupyter) ;;
  *) echo "mode must be api|train|train-autoencoder|train-diffusion|inference|jupyter" >&2; exit 1 ;; esac

command -v docker >/dev/null || { echo "docker not installed" >&2; exit 1; }
docker info >/dev/null 2>&1 || { echo "docker daemon not running" >&2; exit 1; }

REPO_ROOT="$(cd "$(dirname "$0")/../.." && pwd)"
IMAGE_TAG="ldm3d-tpu:${ENVIRONMENT}"
NETWORK="ldm3d-network"
CONTAINER="ldm3d-${MODE}"

if [ "$MODE" = jupyter ] && [ "$ENVIRONMENT" = prod ]; then
  echo "jupyter is a dev-image mode (the production image doesn't ship it): ./setup_docker.sh dev jupyter" >&2
  exit 1
fi

BUILD_ARGS=()
[ "$ENVIRONMENT" = "prod" ] && BUILD_ARGS+=(--target production)
[ "$ENVIRONMENT" = "dev" ] && BUILD_ARGS+=(--target development)
echo "building ${IMAGE_TAG} ..."
docker build "${BUILD_ARGS[@]+"${BUILD_ARGS[@]}"}" -t "$IMAGE_TAG" \
  -f "$REPO_ROOT/deploy/docker/Dockerfile" "$REPO_ROOT"

docker network inspect "$NETWORK" >/dev/null 2>&1 || docker network create "$NETWORK"
for v in ldm3d-models ldm3d-data ldm3d-outputs ldm3d-logs; do
  docker volume inspect "$v" >/dev/null 2>&1 || docker volume create "$v"
done

RUN_ARGS=(-d --name "$CONTAINER" --network "$NETWORK"
  -v ldm3d-models:/app/checkpoints -v ldm3d-data:/app/dataset
  -v ldm3d-outputs:/app/results -v ldm3d-logs:/app/runs)

# TPU passthrough for compute modes (no-op off a TPU VM: JAX falls back to CPU)
case "$MODE" in
  train|train-autoencoder|train-diffusion|inference)
    RUN_ARGS+=(--privileged -v /dev:/dev -e "JAX_PLATFORMS=${JAX_PLATFORMS:-}")
    ;;
  # JAX_PLATFORMS= (empty) overrides the image's tpu pin -> auto-detect, so
  # the same command works on and off a TPU VM (CPU fallback)
  api) RUN_ARGS+=(--privileged -v /dev:/dev -p "${API_PORT:-8000}:8000"
                  -e "JAX_PLATFORMS=${JAX_PLATFORMS:-}") ;;
  jupyter) RUN_ARGS+=(-p "${JUPYTER_PORT:-8888}:8888") ;;
esac

if docker ps -a --format '{{.Names}}' | grep -qx "$CONTAINER"; then
  echo "replacing existing container $CONTAINER"
  docker stop "$CONTAINER" >/dev/null 2>&1 || true
  docker rm "$CONTAINER" >/dev/null
fi

docker run "${RUN_ARGS[@]}" "$IMAGE_TAG" "$MODE"
sleep 2
docker ps --filter "name=$CONTAINER" --format 'table {{.Names}}\t{{.Status}}\t{{.Ports}}'

cat <<EOF

quick commands:
  logs:   docker logs -f $CONTAINER
  stop:   docker stop $CONTAINER
  remove: docker rm $CONTAINER
EOF
if [ "$MODE" = api ]; then
  cat <<EOF
api endpoints (port ${API_PORT:-8000}):
  GET  /health     GET /metrics     GET /model/info
  POST /generate   POST /model/reload
EOF
fi
