#!/usr/bin/env python3
"""Standalone linear-elasticity example (role of ref src/ex2.cpp — the
stock MFEM beam example kept as FEM reference): cantilever beam fixed
at x=0, pull-down load at the tip, solve, report compliance/volume,
export the mesh + solution for inspection."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import numpy as np

from deepsdf_tpu.opt.fem import ElasticitySolver
from deepsdf_tpu.opt.geometry import write_mfem_mesh
from deepsdf_tpu.opt.stuffing import stuff_sdf_grid


def main(nx=33, ny=9, nz=9, L=2.0, h=0.5, out="beam", method="scipy"):
    # structured box tet mesh via the stuffing path (all-inside field)
    field = -np.ones((nx, ny, nz))
    sp = (L / (nx - 1), h / (ny - 1), h / (nz - 1))
    mesh = stuff_sdf_grid(field, sp, (0.0, 0.0, 0.0))

    solver = ElasticitySolver(mesh.vertices, mesh.tets, lam=0.0, mu=105.0)
    verts = mesh.vertices
    solver.set_essential_vertices(verts[:, 0] < 1e-9)
    bf = mesh.boundary_faces()
    tip = bf[verts[bf].mean(axis=1)[:, 0] > L - 1e-9]
    solver.set_surface_load(tip, np.array([0.0, 0.0, -0.01]))
    solver.solve(method=method)

    u = np.asarray(solver.u)
    print(f"mesh: {len(mesh.tets)} tets, {mesh.num_vertices} verts")
    print(f"volume     = {solver.volume():.6f}")
    print(f"compliance = {solver.compliance():.6e}")
    print(f"max |u|    = {np.abs(u).max():.6e} (tip deflection "
          f"{u[np.abs(verts[:, 0] - L) < 1e-9][:, 2].mean():.6e})")

    markers = np.full(len(bf), 3, np.int32)
    markers[verts[bf].max(axis=1)[:, 0] < 1e-9] = 1
    markers[verts[bf].mean(axis=1)[:, 0] > L - 1e-9] = 2
    write_mfem_mesh(out + ".mesh", verts, mesh.tets, bf, markers)
    np.savez(out + "_solution.npz", u=u, vertices=verts, tets=mesh.tets)
    print(f"wrote {out}.mesh, {out}_solution.npz")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--method", choices=("scipy", "jax"), default="scipy")
    p.add_argument("--out", default="beam")
    args = p.parse_args()
    main(method=args.method, out=args.out)
