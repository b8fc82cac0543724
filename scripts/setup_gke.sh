#!/usr/bin/env bash
# Cluster bootstrap — counterpart of the reference's mlops/azure/setup_workspace.py
# (workspace + GPU training cluster + CPU inference cluster + environment):
# creates the GKE cluster, TPU node pools, storage buckets, and artifact
# registry described by deploy/gcp/infrastructure.yaml, then applies the
# Kubernetes stack. Requires gcloud + kubectl with project credentials.
set -euo pipefail

PROJECT="${PROJECT:-ldm3d-tpu}"
REGION="${REGION:-us-central1}"
CLUSTER="${CLUSTER:-ldm3d-cluster}"

echo "== creating GKE cluster $CLUSTER in $PROJECT/$REGION =="
gcloud container clusters create "$CLUSTER" \
  --project "$PROJECT" --region "$REGION" \
  --release-channel regular --num-nodes 1 --machine-type n2-standard-8

echo "== TPU serving pool (1-chip v5e) =="
gcloud container node-pools create tpu-serving-pool \
  --project "$PROJECT" --region "$REGION" --cluster "$CLUSTER" \
  --machine-type ct5lp-hightpu-1t --num-nodes 0 \
  --enable-autoscaling --min-nodes 0 --max-nodes 8

echo "== TPU training pool (v5e-8 slices, spot) =="
gcloud container node-pools create tpu-train-pool \
  --project "$PROJECT" --region "$REGION" --cluster "$CLUSTER" \
  --machine-type ct5lp-hightpu-8t --tpu-topology 2x4 --num-nodes 0 \
  --enable-autoscaling --min-nodes 0 --max-nodes 2 --spot

echo "== storage buckets =="
for b in ldm3d-datasets ldm3d-checkpoints ldm3d-outputs; do
  gsutil mb -p "$PROJECT" -l "$REGION" "gs://$b" || true
done

echo "== artifact registry =="
gcloud artifacts repositories create ldm3d --repository-format=docker \
  --project "$PROJECT" --location "$REGION" || true

# the manifests reference the bare image name; nodes can only pull it from
# the registry created above, so build+push and rewrite the image ref —
# without this every pod sits in ImagePullBackOff
IMAGE="${REGION}-docker.pkg.dev/${PROJECT}/ldm3d/ldm3d-tpu:latest"
REPO_ROOT="$(cd "$(dirname "$0")/.." && pwd)"
if command -v docker >/dev/null && docker info >/dev/null 2>&1; then
  echo "== building and pushing $IMAGE =="
  gcloud auth configure-docker "${REGION}-docker.pkg.dev" --quiet
  docker build --target production -t "$IMAGE" \
    -f "$REPO_ROOT/deploy/docker/Dockerfile" "$REPO_ROOT"
  docker push "$IMAGE"
else
  echo "WARNING: docker unavailable — push $IMAGE yourself (e.g. via Cloud Build:" >&2
  echo "  gcloud builds submit --tag $IMAGE $REPO_ROOT) before pods can start" >&2
fi

echo "== applying kubernetes stack (image -> $IMAGE) =="
gcloud container clusters get-credentials "$CLUSTER" --project "$PROJECT" --region "$REGION"
for m in deployment jobs ingress; do
  sed "s|image: ldm3d-tpu:latest|image: ${IMAGE}|g" \
    "$REPO_ROOT/deploy/kubernetes/${m}.yaml" | kubectl apply -f -
done

echo "done."
