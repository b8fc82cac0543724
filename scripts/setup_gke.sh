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

echo "== applying kubernetes stack =="
gcloud container clusters get-credentials "$CLUSTER" --project "$PROJECT" --region "$REGION"
kubectl apply -f "$(dirname "$0")/../deploy/kubernetes/deployment.yaml"
kubectl apply -f "$(dirname "$0")/../deploy/kubernetes/jobs.yaml"
kubectl apply -f "$(dirname "$0")/../deploy/kubernetes/ingress.yaml"

echo "done."
