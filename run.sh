#!/usr/bin/env bash
# Run the batch experiment (reference run.sh: compose up + python3 main.py).
# Usage: ./run.sh [extra main.py args]  — config via CONFIG_FILE_PATH.
set -euo pipefail
cd "$(dirname "$0")"
export CONFIG_FILE_PATH="${CONFIG_FILE_PATH:-ipp_rl_tpu/config/example.yaml}"
exec python main.py "$@"
