#!/usr/bin/env bash
# Two-stage LDM training launcher — the TPU counterpart of the reference's
# SLURM/torchrun scripts (3d_ldm/train_LDM.sh). One python process per HOST
# drives all local chips via the mesh; no torchrun, no NCCL env tuning, no
# per-GPU process spawning. Multi-host slices: run this same script on every
# host (GKE/SLURM array) — jax.distributed picks up the TPU topology from the
# runtime environment.
set -euo pipefail

CONFIG="${CONFIG:-ldm3d_tpu/configs/presets/config_train_32g.json}"
ENVFILE="${ENVFILE:-ldm3d_tpu/configs/presets/environment.json}"
STAGE="${1:-all}"           # all | autoencoder | diffusion | inference
shift || true

echo "== ldm3d_tpu launcher: stage=$STAGE config=$CONFIG env=$ENVFILE =="
python -m ldm3d_tpu.cli.check_system --output /tmp/config_probe.json --json >/dev/null || true

case "$STAGE" in
  all)
    python -m ldm3d_tpu.cli.train_autoencoder -c "$CONFIG" -e "$ENVFILE" --amp "$@"
    python -m ldm3d_tpu.cli.train_diffusion   -c "$CONFIG" -e "$ENVFILE" --amp "$@"
    ;;
  autoencoder)
    exec python -m ldm3d_tpu.cli.train_autoencoder -c "$CONFIG" -e "$ENVFILE" --amp "$@"
    ;;
  diffusion)
    exec python -m ldm3d_tpu.cli.train_diffusion -c "$CONFIG" -e "$ENVFILE" --amp "$@"
    ;;
  inference)
    exec python -m ldm3d_tpu.cli.inference -c "$CONFIG" -e "$ENVFILE" "$@"
    ;;
  *)
    echo "usage: $0 [all|autoencoder|diffusion|inference] [extra flags]" >&2
    exit 2
    ;;
esac
