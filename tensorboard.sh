#!/usr/bin/env bash
# Serve training metrics (reference tensorboard.sh, port 6006).
# ZeroLearner writes TensorBoard events when use_tensorboard=True;
# the JSONL stream at $LOG_DIR/train_metrics.jsonl is always written.
set -euo pipefail
LOGDIR="${1:-${LOG_DIR:-runs/zero_small/logs}/tensorboard}"
exec tensorboard --logdir "$LOGDIR" --host 0.0.0.0 --port "${PORT:-6006}"
