#!/bin/bash
# End-of-round TPU validation batch (run with the chip otherwise idle;
# serialize after the fixture queue — concurrent heavy tunnel jobs
# stall, CLAUDE.md). Each step appends to /tmp/tpu_validations.log and
# its own artifact; all are safe to re-run.
set -x
cd "$(dirname "$0")/.."
LOG=/tmp/tpu_validations.log
{
  echo "=== $(date -u) fused kernel hardware validation ==="
  timeout 1800 python scripts/validate_fused_tpu.py
  echo "=== $(date -u) step breakdown ==="
  timeout 1800 python scripts/step_breakdown.py
  echo "=== $(date -u) chairs-scale throughput ==="
  timeout 1800 python scripts/validate_chairs_scale.py
  echo "=== $(date -u) SPMD overhead (1-device mesh) ==="
  timeout 1800 python scripts/scaling_proxy.py --tpu-overhead
  echo "=== $(date -u) bench ==="
  timeout 3600 python bench.py
  echo "=== $(date -u) done ==="
} >> "$LOG" 2>&1
