#!/usr/bin/env python3
"""Reconstruct test-split shapes by latent inference (restores the
upstream reconstruct.py CLI the fork deleted; ref README.md:139-143)."""

import argparse
import json

import deepsdf_tpu.utils
from deepsdf_tpu import ws
from deepsdf_tpu.recon.driver import reconstruct_split
from deepsdf_tpu.recon.reconstruct import ReconstructConfig

if __name__ == "__main__":
    p = argparse.ArgumentParser(description="Use a trained DeepSDF decoder to "
                                "reconstruct shapes from SDF samples")
    p.add_argument("--experiment", "-e", dest="experiment_directory", required=True)
    p.add_argument("--checkpoint", "-c", dest="checkpoint", default="latest")
    p.add_argument("--data", "-d", dest="data_source", default=None)
    p.add_argument("--split", "-s", dest="split_filename", default=None)
    p.add_argument("--iters", type=int, default=800,
                   help="number of latent optimization iterations")
    p.add_argument("--resolution", type=int, default=256)
    p.add_argument("--skip", action="store_true", help="skip existing meshes")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--sparse", action="store_true",
                   help="two-level surface-band grid eval for the meshes")
    deepsdf_tpu.utils.add_common_args(p)
    args = p.parse_args()
    deepsdf_tpu.utils.configure_logging(args)

    specs = ws.load_experiment_specifications(args.experiment_directory)
    split_file = args.split_filename or specs.get("TestSplit")
    with open(split_file) as f:
        split = json.load(f)
    reconstruct_split(
        args.experiment_directory, args.checkpoint, split,
        data_source=args.data_source, skip=args.skip,
        mesh_resolution=args.resolution, seed=args.seed,
        rcfg=ReconstructConfig(num_iterations=args.iters), sparse=args.sparse)
