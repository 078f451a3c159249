#!/usr/bin/env python3
"""Ours-vs-reference optimization-trajectory comparison figure.

One panel per optimization family: normalized compliance (C/C_0, log scale)
and volume fraction over MMA iterations, our committed trajectory overlaid
on the reference's committed artifact
(ref: optimization_runs/*/results.json — absolute compliance scales are NOT
comparable across the two codebases, see optimization_runs/PARITY_NOTES.md
item 1; the normalized trajectory shape is the parity target).

Usage: python evaluation_scripts/trajectory_parity_figure.py \
           [--out optimization_runs/trajectory_parity.png] [--ref DIR]
"""

import argparse
import json
import pathlib

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

FAMILIES = [
    "opti_double_lattice_8x4",
    "opti_double_lattice_8x4_no_topo",
    "opti_double_lattice",
    "test_opti",
    "round_cross_base",
    "round_cross_different_start",
    "round_cross_more_knot_vecs",
    "round_cross_more_knot_vecs_limit",
]


def _load(folder):
    p = pathlib.Path(folder) / "results.json"
    if not p.exists():
        return None
    r = json.loads(p.read_text())
    c = np.asarray(r["compliance"], dtype=float)
    v = np.asarray(r["volume"], dtype=float)
    return c, v


def main(out, ours_root, ref_root):
    fig, axes = plt.subplots(2, 4, figsize=(18, 8), sharex=False)
    for ax, fam in zip(axes.ravel(), FAMILIES):
        axv = ax.twinx()
        for root, color, tag in ((ref_root, "0.6", "reference"),
                                 (ours_root, "C0", "ours")):
            data = _load(pathlib.Path(root) / fam)
            if data is None:
                continue
            c, v = data
            it = np.arange(len(c))
            # normalize by the first finite compliance; the absolute scale
            # differs between codebases (units artifact, PARITY_NOTES #1)
            c0 = c[np.isfinite(c) & (c > 0)]
            cn = c / (c0[0] if len(c0) else 1.0)
            ax.plot(it, cn, color=color, lw=1.5,
                    label=f"{tag} ({len(c)} it)")
            axv.plot(it, v, color=color, lw=1.0, ls="--", alpha=0.6)
        ax.set_yscale("log")
        ax.set_title(fam, fontsize=10)
        ax.set_xlabel("MMA iteration")
        ax.set_ylabel("C / C$_0$")
        axv.set_ylabel("volume (- -)", fontsize=8)
        ax.legend(fontsize=7, loc="best")
    fig.suptitle("Optimization trajectories: normalized compliance (solid, log) "
                 "and volume (dashed) — ours vs reference committed artifacts")
    fig.tight_layout()
    fig.savefig(out, dpi=110)
    print(f"wrote {out}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="optimization_runs/trajectory_parity.png")
    p.add_argument("--ours", default="optimization_runs")
    p.add_argument("--ref", default="/root/reference/optimization_runs")
    a = p.parse_args()
    main(a.out, a.ours, a.ref)
