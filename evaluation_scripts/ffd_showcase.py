#!/usr/bin/env python3
"""Free-form-deformation microstructure showcase (parity with ref
evaluation_scripts/07_beam_test_case.py / 09_facade_test_case.py, which
composed spline microtiles through a deformation spline): tile a
microstructure mesh across a macro layout and push every vertex through
a B-spline free-form deformation, producing a curved beam or facade
surface mesh."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import numpy as np


def tiled_mesh(tile_verts, tile_faces, tiling):
    """Replicate a [-1,1]³ tile into a [0,1]³-normalized (tx,ty,tz) grid."""
    verts_list, faces_list = [], []
    offset = 0
    tx, ty, tz = tiling
    unit = (np.asarray(tile_verts) + 1.0) / 2.0  # [0,1] tile
    for i in range(tx):
        for j in range(ty):
            for k in range(tz):
                v = (unit + np.array([i, j, k])) / np.array([tx, ty, tz])
                verts_list.append(v)
                faces_list.append(np.asarray(tile_faces) + offset)
                offset += len(v)
    return np.concatenate(verts_list), np.concatenate(faces_list)


def make_ffd(kind: str, amplitude: float):
    """Deformation spline over [0,1]³ → R³ (quadratic Bezier volume)."""
    from deepsdf_tpu.ops.bspline import Bezier

    grid = np.array([[x, y, z] for z in (0, 0.5, 1) for y in (0, 0.5, 1)
                     for x in (0, 0.5, 1)], dtype=np.float64)
    cps = grid.copy()
    if kind == "beam":  # arched beam: mid-span lifted in z, stretched in x
        cps[:, 0] *= 4.0
        mid = np.isclose(grid[:, 0], 0.5)
        cps[mid, 2] += amplitude
    elif kind == "facade":  # wavy facade: z-bulge varying over (x,y)
        cps[:, 0] *= 3.0
        cps[:, 2] *= 3.0
        bulge = np.sin(np.pi * grid[:, 0]) * np.sin(np.pi * grid[:, 2])
        cps[:, 1] += amplitude * bulge
    else:
        raise ValueError(kind)
    return Bezier([2, 2, 2], cps)


def main(kind, tiling, out, amplitude=0.5, tile="double_lattice", params="0.1,0.1"):
    from deepsdf_tpu.mesh.ply import write_ply
    from deepsdf_tpu.sdf_sampler.tiles import DoubleLatticeExtruded, Snappy3D

    pvals = np.array([[float(v) for v in params.split(",")]])
    if tile == "double_lattice":
        tv, tf = DoubleLatticeExtruded().create_surface_mesh(pvals, resolution=64)
    else:
        tv, tf = Snappy3D().create_surface_mesh(pvals, resolution=10)

    verts, faces = tiled_mesh(tv, tf, tiling)
    ffd = make_ffd(kind, amplitude)
    deformed = ffd.evaluate(np.clip(verts, 0, 1))
    write_ply(out, deformed, faces)
    print(f"wrote {out}: {len(deformed)} verts, {len(faces)} faces "
          f"({kind}, tiling {tiling}, tile {tile})")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("kind", choices=("beam", "facade"))
    p.add_argument("--tiling", default="8,1,4")
    p.add_argument("--tile", choices=("double_lattice", "snappy"),
                   default="double_lattice")
    p.add_argument("--params", default="0.1,0.1")
    p.add_argument("--amplitude", type=float, default=0.5)
    p.add_argument("--out", default="ffd_showcase.ply")
    args = p.parse_args()
    main(args.kind, tuple(int(v) for v in args.tiling.split(",")), args.out,
         args.amplitude, args.tile, args.params)
