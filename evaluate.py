#!/usr/bin/env python3
"""Chamfer evaluation of reconstructions (restores the upstream
evaluate.py CLI; ref README.md:145-158)."""

import argparse
import json

import deepsdf_tpu.utils
from deepsdf_tpu import ws
from deepsdf_tpu.eval.evaluate import evaluate

if __name__ == "__main__":
    p = argparse.ArgumentParser(description="Evaluate reconstructions vs "
                                "ground-truth surface samples (chamfer)")
    p.add_argument("--experiment", "-e", dest="experiment_directory", required=True)
    p.add_argument("--checkpoint", "-c", dest="checkpoint", default="latest")
    p.add_argument("--data", "-d", dest="data_source", default=None)
    p.add_argument("--split", "-s", dest="split_filename", default=None)
    p.add_argument("--emd", action="store_true",
                   help="also compute Sinkhorn EMD (fills the reserved "
                        "Evaluation/<ckpt>/emd slot)")
    deepsdf_tpu.utils.add_common_args(p)
    args = p.parse_args()
    deepsdf_tpu.utils.configure_logging(args)

    specs = ws.load_experiment_specifications(args.experiment_directory)
    split_file = args.split_filename or specs.get("TestSplit")
    with open(split_file) as f:
        split = json.load(f)
    evaluate(args.experiment_directory, args.checkpoint,
             args.data_source or specs["DataSource"], split,
             with_emd=args.emd)
