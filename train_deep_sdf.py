#!/usr/bin/env python3
"""Train a DeepSDF auto-decoder (CLI parity: ref train_deep_sdf.py:584-622)."""

import argparse

import deepsdf_tpu.utils
from deepsdf_tpu.parallel.mesh import initialize_distributed
from deepsdf_tpu.train.loop import main_function

if __name__ == "__main__":
    arg_parser = argparse.ArgumentParser(description="Train a DeepSDF autodecoder")
    arg_parser.add_argument(
        "--experiment", "-e", dest="experiment_directory", required=True,
        help="The experiment directory. This directory should include "
             "experiment specifications in 'specs.json', and logging will be "
             "done in this directory as well.")
    arg_parser.add_argument(
        "--continue", "-c", dest="continue_from",
        help="A snapshot to continue from. This can be 'latest' to continue "
             "from the latest running snapshot, or an integer corresponding to "
             "an epochal snapshot.")
    arg_parser.add_argument(
        "--batch_split", dest="batch_split", default=1,
        help="This splits the batch into separate subbatches which are "
             "processed separately, with gradients accumulated across all "
             "subbatches (lax.scan microbatching on TPU).")
    arg_parser.add_argument("--seed", type=int, default=0)
    arg_parser.add_argument("--fused", action="store_true",
                            help="use the Pallas fused MLP kernel (TPU)")
    arg_parser.add_argument("--cpu", action="store_true",
                            help="force the CPU jax backend (keeps the run "
                                 "independent of the TPU tunnel)")
    deepsdf_tpu.utils.add_common_args(arg_parser)
    args = arg_parser.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    deepsdf_tpu.utils.configure_logging(args)
    # multi-host init BEFORE first jax use (auto-detects pod/SLURM
    # environments, no-op single-host; SURVEY.md §5.8)
    initialize_distributed()
    main_function(args.experiment_directory, args.continue_from,
                  int(args.batch_split), seed=args.seed, fused=args.fused)
