#!/usr/bin/env python3
"""Optimization screenshot set (role parity with ref
evaluation_scripts/wccm2024/generate_optimization_screenshots.py):
renders the initial and final design meshes of an optimization run and
the normalized compliance/volume progress curve — the reference's
initial_mesh.png / optimized_mesh.png / optimization_progress.png
asset types, from committed simulation_*/surf*.ply + results.json.

    python evaluation_scripts/optimization_screenshots.py \
        optimization_runs/opti_double_lattice_8x4 --out /tmp/shots
"""

import argparse
import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _sim_plys(run_folder: str) -> dict[int, str]:
    out = {}
    for p in glob.glob(os.path.join(run_folder, "simulation_*", "surf*.ply")):
        m = re.search(r"surf(\d+)\.ply$", p)
        if m:
            out[int(m.group(1))] = p
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_folder")
    ap.add_argument("--out", default=None,
                    help="output dir (default <run_folder>/figures)")
    args = ap.parse_args()

    from deepsdf_tpu.mesh.ply import read_ply
    from deepsdf_tpu.tools.plotting import _plt, screenshot_mesh

    out = args.out or os.path.join(args.run_folder, "figures")
    os.makedirs(out, exist_ok=True)

    plys = _sim_plys(args.run_folder)
    if not plys:
        raise SystemExit(f"no simulation_*/surf*.ply under {args.run_folder}")
    first, last = min(plys), max(plys)
    for it, name in ((first, "initial_mesh.png"), (last, "optimized_mesh.png")):
        verts, faces = read_ply(plys[it])
        screenshot_mesh(verts, faces, os.path.join(out, name))
        print(f"iteration {it} -> {name}")

    results_path = os.path.join(args.run_folder, "results.json")
    if os.path.isfile(results_path):
        r = json.load(open(results_path))
        comp = np.asarray(r["compliance"], dtype=float)
        vol = np.asarray(r["volume"], dtype=float)
        plt = _plt()
        fig, ax = plt.subplots(1, 1, figsize=(12 / 2.5, 8 / 2.5))
        ax.plot(comp / max(abs(comp[0]), 1e-300), c="#007E71")
        ax.plot(vol / max(vol[0], 1e-300), c="#E18922")
        ax.legend(["Objective (Compliance)", "Constraint (Volume)"])
        ax.grid(True, alpha=0.4)
        ax.set_xlabel("Iteration")
        ax.set_ylabel("Normalized Objective/Constraint")
        fig.savefig(os.path.join(out, "optimization_progress.png"),
                    dpi=300, bbox_inches="tight")
        plt.close(fig)
        print(f"{len(comp)} iterations -> optimization_progress.png")
    print(f"figures in {out}")


if __name__ == "__main__":
    main()
