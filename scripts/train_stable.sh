#!/usr/bin/env bash
# Conservative-stability launcher — counterpart of the reference's
# train_stable.sh (small channels, low LR, debug-friendly env,
# 3d_ldm/train_stable.sh:44-49). On TPU the fp16 NaN hazards that script
# works around do not exist (bf16 end to end); what remains useful is the
# conservative config preset and a NaN trap for debugging new configs.
set -euo pipefail

CONFIG="${CONFIG:-ldm3d_tpu/configs/presets/config_train_stable.json}"
ENVFILE="${ENVFILE:-ldm3d_tpu/configs/presets/environment.json}"
STAGE="${1:-all}"
shift || true

# --debug-nans = jax_debug_nans: the compiled-program analog of the
# reference's CUDA_LAUNCH_BLOCKING/TORCH_USE_CUDA_DSA debug env
FLAGS=(--amp --debug-nans)

case "$STAGE" in
  all)
    python -m ldm3d_tpu.cli.train_autoencoder -c "$CONFIG" -e "$ENVFILE" "${FLAGS[@]}" "$@"
    python -m ldm3d_tpu.cli.train_diffusion   -c "$CONFIG" -e "$ENVFILE" "${FLAGS[@]}" "$@"
    ;;
  autoencoder|diffusion)
    exec python -m "ldm3d_tpu.cli.train_${STAGE}" -c "$CONFIG" -e "$ENVFILE" "${FLAGS[@]}" "$@"
    ;;
  *)
    echo "usage: $0 [all|autoencoder|diffusion] [extra flags]" >&2
    exit 2
    ;;
esac
