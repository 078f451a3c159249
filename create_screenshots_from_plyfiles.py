#!/usr/bin/env python3
"""Screenshot PLY meshes → PNGs → animated GIF
(CLI parity: ref create_screenshots_from_plyfiles.py:17-36, vedo→mpl)."""

import argparse
import glob
import os

from deepsdf_tpu.mesh.ply import read_ply
from deepsdf_tpu.tools.plotting import screenshot_mesh
from deepsdf_tpu.tools.gif import write_gif

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("ply_glob", help="glob of .ply files, e.g. 'Reconstructions/**/*.ply'")
    p.add_argument("--outdir", default="Screenshots")
    p.add_argument("--gif", default=None, help="optional output GIF path")
    p.add_argument("--fps", type=float, default=4.0)
    args = p.parse_args()

    os.makedirs(args.outdir, exist_ok=True)
    pngs = []
    for f in sorted(glob.glob(args.ply_glob, recursive=True)):
        verts, faces = read_ply(f)
        out = os.path.join(args.outdir,
                           os.path.splitext(os.path.basename(f))[0] + ".png")
        screenshot_mesh(verts, faces, out)
        pngs.append(out)
        print(f"wrote {out}")
    if args.gif and pngs:
        write_gif(pngs, args.gif, fps=args.fps)
        print(f"wrote {args.gif}")
