#!/usr/bin/env bash
# Launch TensorBoard on the training event directory.
#
# Analog of the reference's run_tensorboard_windows.bat (which ships empty —
# this one works). Reads tfevent_path from the environment JSON so it always
# points where the trainers write (obs/tb.py), or takes an explicit dir.
#
# Usage: ./tensorboard.sh [logdir|environment.json] [port]
set -euo pipefail

ARG="${1:-}"
PORT="${2:-6006}"

if [ -z "$ARG" ]; then
  ENVFILE="$(cd "$(dirname "$0")/.." && pwd)/ldm3d_tpu/configs/presets/environment.json"
  LOGDIR=$(python -c "import json,sys;print(json.load(open(sys.argv[1]))['tfevent_path'])" "$ENVFILE")
elif [ -f "$ARG" ]; then
  LOGDIR=$(python -c "import json,sys;print(json.load(open(sys.argv[1]))['tfevent_path'])" "$ARG")
else
  LOGDIR="$ARG"
fi

echo "tensorboard --logdir $LOGDIR --port $PORT"
exec python -m tensorboard.main --logdir "$LOGDIR" --port "$PORT" --bind_all
