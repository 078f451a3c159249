#!/usr/bin/env python3
"""Reconstruct every training latent to PLY + interpolation sweeps
(CLI parity: ref create_ply_files_from_latent.py:100-110)."""

import argparse

from deepsdf_tpu.recon.latent_recon import reconstruct_training_latents

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--experiment_directory", "-e", type=str, required=True)
    parser.add_argument("--checkpoint", "-c", type=str, default="latest")
    parser.add_argument("--max_batch", "-b", type=int, default=32)
    parser.add_argument("--resolution", "-N", type=int, default=256)
    parser.add_argument("--sparse", action="store_true",
                        help="two-level surface-band grid eval (4-10x fewer "
                             "decoder FLOPs at N>=192; see eval_sdf_grid_sparse)")
    args = parser.parse_args()
    reconstruct_training_latents(
        args.experiment_directory, args.checkpoint,
        N=args.resolution, max_batch=int(args.max_batch) ** 3,
        sparse=args.sparse)
