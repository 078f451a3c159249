#!/usr/bin/env python3
"""Export a trained decoder for C++ inference (CLI parity:
ref create_libtorch_executable.py:4-33, plus StableHLO output)."""

import argparse

from deepsdf_tpu.tools.export import (
    export_stablehlo, export_torchscript_from_experiment,
)
from deepsdf_tpu import ws

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--experiment", "-e", dest="experiment_directory", required=True)
    p.add_argument("--checkpoint", "-c", default="latest")
    p.add_argument("--stablehlo", action="store_true",
                   help="also write a portable StableHLO artifact")
    args = p.parse_args()
    path = export_torchscript_from_experiment(
        args.experiment_directory, args.checkpoint)
    print(f"wrote {path}")
    if args.stablehlo:
        config, params = ws.load_trained_model(
            args.experiment_directory, args.checkpoint)
        out = path.replace(".pt", ".stablehlo")
        export_stablehlo(config, params, out)
        print(f"wrote {out}")
