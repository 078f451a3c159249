#!/usr/bin/env python3
"""Simple analysis-results figures (role parity with ref
evaluation_scripts/paper/06_plot_simple_analysis_results.ipynb): solve
the cantilever elasticity problem on a plain (wedge-distorted) beam,
render displacement-magnitude and strain-energy-density fields, and
check the compliance/volume shape derivatives against the actually
distorted mesh — the notebook's "Delta vs expected" printout.

The reference built its two beams by moving splinepy box control
points and solved with PyMFEM; here the beam is stuffed from an
all-inside SDF grid (opt/stuffing.py) and solved by the in-repo FEM
(opt/fem.py), with the same trilinear bottom-lift distortion.

    python evaluation_scripts/simple_analysis_figure.py --out /tmp/simple
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def beam_mesh(nx, ny, nz, z_lift):
    """[0,2]x[0,1]x[0,1] box beam, bottom face lifted to z=z_lift at
    the x=2 tip (trilinear, the ref's cp[1]/cp[3] z move)."""
    from deepsdf_tpu.opt.stuffing import stuff_sdf_grid

    field = -np.ones((nx, ny, nz))
    sp = (2.0 / (nx - 1), 1.0 / (ny - 1), 1.0 / (nz - 1))
    mesh = stuff_sdf_grid(field, sp, (0.0, 0.0, 0.0))
    v = mesh.vertices
    v[:, 2] = v[:, 2] + (1.0 - v[:, 2]) * (v[:, 0] / 2.0) * z_lift
    mesh.vertices = v
    return mesh


def markers_for(mesh, tolerance=1e-6):
    """Face markers like opt/geometry.py boundary_conditions: 1 = x~0
    (fixed), 2 = z~top (load), 3 = rest."""
    bf = mesh.boundary_faces()
    verts = mesh.vertices
    top = verts[:, 2].max()
    marker = np.full(len(bf), 3, dtype=np.int32)
    is1 = verts[bf].max(axis=1)[:, 0] < tolerance
    is2 = (~is1) & (verts[bf].min(axis=1)[:, 2] > top - tolerance)
    marker[is1] = 1
    marker[is2] = 2
    return bf, marker


def surface_scalar_plot(verts, faces, values, path, title, cmap="viridis"):
    """Boundary-face trisurf colored by a per-vertex scalar."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from mpl_toolkits.mplot3d.art3d import Poly3DCollection

    tri = verts[faces]
    face_val = values[faces].mean(axis=1)
    norm = plt.Normalize(values.min(), values.max() + 1e-30)
    cm = plt.get_cmap(cmap)
    fig = plt.figure(figsize=(9, 4.5))
    ax = fig.add_subplot(111, projection="3d")
    coll = Poly3DCollection(tri, facecolors=cm(norm(face_val)),
                            edgecolors="none")
    ax.add_collection3d(coll)
    ax.set_box_aspect((2, 1, 1))
    ax.set_xlim(0, 2); ax.set_ylim(0, 1); ax.set_zlim(0, 1)
    ax.view_init(elev=20, azim=-60)
    ax.set_title(title)
    m = plt.cm.ScalarMappable(cmap=cm, norm=norm)
    fig.colorbar(m, ax=ax, shrink=0.6)
    fig.savefig(path, dpi=130, bbox_inches="tight")
    plt.close(fig)


def solve_and_plot(mesh, tag, out, dTheta=None, fem_method="scipy"):
    from deepsdf_tpu.opt.problems import CantileverBeam

    bf, marker = markers_for(mesh)
    beam = CantileverBeam()
    beam.set_mesh(mesh.vertices, mesh.tets, bf, marker)
    beam.set_up()
    vol, d_vol = beam.compute_volume(dTheta=dTheta)
    beam.solve(method=fem_method)
    comp, d_comp = beam.compute_compliance(dTheta=dTheta)
    print(f"[{tag}] Vol: {vol:.5g}" +
          (f", dVol: {np.asarray(d_vol).ravel()}" if d_vol is not None else ""))
    print(f"[{tag}] Compliance: {comp:.5g}" +
          (f", dCompliance: {np.asarray(d_comp).ravel()}"
           if d_comp is not None else ""))

    u = beam.u_data
    umag = np.linalg.norm(u, axis=1)
    sed = beam.solver.vertex_sed()
    # deformed configuration (scaled like the ref's GLVis warp view)
    scale = 0.15 / max(umag.max(), 1e-12)
    deformed = mesh.vertices + scale * u
    surface_scalar_plot(deformed, bf, umag,
                        os.path.join(out, f"{tag}_u_mag.png"),
                        f"{tag}: |u| on deformed mesh (warp x{scale:.3g})")
    surface_scalar_plot(mesh.vertices, bf, sed,
                        os.path.join(out, f"{tag}_sed.png"),
                        f"{tag}: strain energy density")
    return vol, d_vol, comp, d_comp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="evaluation_scripts/figures/simple_analysis")
    ap.add_argument("--res", type=int, default=13,
                    help="stuffing grid points along x (y/z scale with it)")
    ap.add_argument("--fem", choices=("scipy", "jax"), default="scipy")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    os.makedirs(args.out, exist_ok=True)
    nx, ny, nz = args.res, (args.res + 1) // 2, (args.res + 1) // 2

    base = beam_mesh(nx, ny, nz, z_lift=0.1)
    dist = beam_mesh(nx, ny, nz, z_lift=0.001)
    dVertices = (dist.vertices - base.vertices)[:, :, None]  # (V, 3, 1)

    _, d_vol, comp, d_comp = solve_and_plot(
        base, "base", args.out, dTheta=dVertices, fem_method=args.fem)
    vol2, _, comp2, _ = solve_and_plot(
        dist, "distorted", args.out, fem_method=args.fem)
    print(f"Delta compliance: {comp2 - comp:.5g}, "
          f"expected (shape derivative): {float(np.ravel(d_comp)[0]):.5g}")


if __name__ == "__main__":
    main()
