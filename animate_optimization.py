#!/usr/bin/env python3
"""Animate optimization-history surface meshes into a GIF
(CLI parity: ref animate_optimization.py:1-21, opti.py:284-384)."""

import argparse
import glob
import os
import pathlib
import re

from deepsdf_tpu.mesh.ply import read_ply
from deepsdf_tpu.tools.gif import write_gif
from deepsdf_tpu.tools.plotting import screenshot_mesh

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("optimization_folder", type=str)
    p.add_argument("--out", default=None)
    p.add_argument("--fps", type=float, default=4.0)
    args = p.parse_args()

    folder = pathlib.Path(args.optimization_folder)
    plys = []
    for sim in sorted(folder.glob("simulation_*"),
                      key=lambda d: int(re.findall(r"\d+", d.name)[0])):
        hits = sorted(glob.glob(str(sim / "surf*.ply")))
        plys.extend(hits)
    if not plys:
        raise SystemExit(f"no surf*.ply files under {folder}/simulation_*")

    shot_dir = folder / "animation_frames"
    os.makedirs(shot_dir, exist_ok=True)
    pngs = []
    for f in plys:
        verts, faces = read_ply(f)
        out = str(shot_dir / (pathlib.Path(f).stem + ".png"))
        screenshot_mesh(verts, faces, out)
        pngs.append(out)
    gif = args.out or str(folder / "optimization.gif")
    write_gif(pngs, gif, fps=args.fps)
    print(f"wrote {gif}")
