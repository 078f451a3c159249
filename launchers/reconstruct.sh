#!/bin/bash
# Reconstruction job (replaces ref run_reconstruction.slrm, 2h 1×A100).
set -euo pipefail
EXP=${1:?usage: reconstruct.sh <experiment_dir> [checkpoint]}
CKPT=${2:-latest}
python reconstruct.py -e "$EXP" -c "$CKPT" --skip
python evaluate.py -e "$EXP" -c "$CKPT"
