#!/usr/bin/env python3
"""Plot compliance/volume convergence of an optimization run
(CLI parity: ref plot_optimization_convergence.py)."""

import argparse
import pathlib

from deepsdf_tpu.opt.driver import load_results
from deepsdf_tpu.tools.plotting import plot_convergence

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("optimization_folder", type=str)
    p.add_argument("--out", default=None)
    args = p.parse_args()
    results = load_results(args.optimization_folder)
    out = args.out or str(pathlib.Path(args.optimization_folder) / "convergence.png")
    plot_convergence(results, savefig=out)
    print(f"wrote {out}")
