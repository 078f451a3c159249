#!/bin/bash
# TPU training launcher (replaces ref training.slrm:1-9, a 72h 1×A100
# SLURM job). Run the SAME script on every host of the slice; JAX
# auto-detects the TPU topology and initializes the mesh.
#
# Single host:   ./launchers/train.sh experiments/double_lattice_3D
# Multi-host:    gcloud compute tpus tpu-vm ssh $TPU --worker=all \
#                  --command="cd $REPO && ./launchers/train.sh $EXP"
set -euo pipefail
EXP=${1:?usage: train.sh <experiment_dir> [extra args]}
shift || true
python train_deep_sdf.py -e "$EXP" "$@"
