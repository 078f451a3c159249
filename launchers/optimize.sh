#!/bin/bash
# Structure-optimization job (replaces ref optimization.slrm, 72h 100G).
set -euo pipefail
FOLDER=${1:?usage: optimize.sh <optimization_folder>}
shift || true
python run_optimization.py "$FOLDER" "$@"
