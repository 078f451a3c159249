#!/usr/bin/env python3
"""Training-set screenshot panels (role parity with ref
evaluation_scripts/wccm2024/generate_training_screenshots.py and
paper/01_generate_training_screenshots.py): sweep a tile family's
design parameter, and emit the reference's two asset types —

  training_tiles.png  grid of shaded tile surface renders
  training_sdfs.png   grid of SDF z-slice filled contours

Families: ``snappy`` (Snappy3D spline tile swept over the mid-layer
bow thickness, the ref's wccm sweep t in [0, 0.7]), ``cross``
(CrossMsSDF radius sweep) and ``corner`` (CornerSpheresSDF radius
sweep) — the analytic microstructure training sets.

    python evaluation_scripts/training_screenshots.py --family snappy \
        --out evaluation_scripts/figures
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _tile_sdfs(family: str, values):
    """Yield (label, sdf_callable, (verts, faces) or None) per sweep value."""
    from deepsdf_tpu.sdf_sampler.framework import BoxSDF, SummedSDF
    from deepsdf_tpu.sdf_sampler.mesh_sdf import SDFfromMesh
    from deepsdf_tpu.sdf_sampler.microstructures import (CornerSpheresSDF,
                                                         CrossMsSDF)
    from deepsdf_tpu.sdf_sampler.tiles import Snappy3D

    for t in values:
        if family == "snappy":
            verts, faces = Snappy3D().create_surface_mesh(
                parameters=np.array([[t]]), resolution=12)
            # ref combines the mesh SDF with the negated unit box so the
            # empty exterior of [-1,1]^3 reads as "outside"
            sdf = SummedSDF(SDFfromMesh(vertices=verts, faces=faces),
                            -BoxSDF())
            yield f"t={t:.2f}", sdf, (verts, faces)
        elif family == "cross":
            yield f"r={t:.2f}", CrossMsSDF(t), None
        else:
            yield f"r={t:.2f}", CornerSpheresSDF(t), None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", choices=["snappy", "cross", "corner"],
                    default="snappy")
    ap.add_argument("--values", type=float, nargs="+", default=None,
                    help="sweep values (default: family-specific linspace)")
    ap.add_argument("--res", type=int, default=120, help="contour resolution")
    ap.add_argument("--mesh-n", type=int, default=48,
                    help="marching-cubes grid for analytic families")
    ap.add_argument("--z", type=float, default=0.0, help="contour z level")
    ap.add_argument("--out", default="evaluation_scripts/figures")
    ap.add_argument("--cpu", action="store_true",
                    help="run the SDF evals on the CPU jax backend")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from deepsdf_tpu.mesh.marching import marching_tetrahedra
    from deepsdf_tpu.tools.plotting import scatter_contour_at_z_level

    if args.values is None:
        values = {"snappy": np.linspace(0.0, 0.7, 6),
                  "cross": np.linspace(0.1, 0.4, 6),
                  "corner": np.linspace(0.35, 0.8, 6)}[args.family]
    else:
        values = np.asarray(args.values, dtype=float)

    os.makedirs(args.out, exist_ok=True)
    n = len(values)
    ncols = min(3, n)
    nrows = (n + ncols - 1) // ncols

    # ---- training_sdfs.png: z-slice contour grid (ref training_sdfs.png)
    fig, axes = plt.subplots(nrows, ncols, figsize=(3.2 * ncols, 3.0 * nrows))
    axes = np.atleast_1d(axes).ravel()
    entries = list(_tile_sdfs(args.family, values))
    for ax, (label, sdf, _) in zip(axes, entries):
        scatter_contour_at_z_level(sdf, z_level=args.z, res=args.res,
                                   custom_axis=ax, clim=(-0.5, 0.5))
        ax.set_title(label, fontsize=9)
    for ax in axes[len(entries):]:
        ax.set_axis_off()
    sdf_path = os.path.join(args.out, f"training_sdfs_{args.family}.png")
    fig.tight_layout()
    fig.savefig(sdf_path, dpi=130)
    plt.close(fig)
    print("wrote", sdf_path)

    # ---- training_tiles.png: shaded tile renders (ref training_tiles.png)
    from mpl_toolkits.mplot3d.art3d import Poly3DCollection

    fig = plt.figure(figsize=(3.2 * ncols, 3.0 * nrows))
    for i, (label, sdf, mesh) in enumerate(entries):
        ax = fig.add_subplot(nrows, ncols, i + 1, projection="3d")
        if mesh is None:
            # analytic family: extract the zero level set on a small grid
            g = np.linspace(-1.0, 1.0, args.mesh_n)
            h = g[1] - g[0]
            pts = np.stack(np.meshgrid(g, g, g, indexing="ij"), -1)
            vals = np.asarray(sdf(pts.reshape(-1, 3))).reshape(pts.shape[:3])
            verts, faces, _, _ = marching_tetrahedra(
                vals, spacing=(h, h, h), compute_normals=False)
            verts, faces = np.asarray(verts) - 1.0, np.asarray(faces)
        else:
            verts, faces = mesh
        if len(faces) == 0:
            ax.set_axis_off()
            ax.set_title(f"{label} (empty)", fontsize=9)
            continue
        tri = verts[faces]
        fn = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
        fn /= np.maximum(np.linalg.norm(fn, axis=1, keepdims=True), 1e-12)
        shade = 0.35 + 0.65 * np.clip(np.abs(fn @ [0.4, 0.3, 0.87]), 0, 1)
        pc = Poly3DCollection(tri, linewidths=0.0)
        pc.set_facecolor(np.outer(shade, [0.5, 0.6, 0.8]))
        ax.add_collection3d(pc)
        ax.set_xlim(-1, 1), ax.set_ylim(-1, 1), ax.set_zlim(-1, 1)
        ax.set_box_aspect((1, 1, 1))
        ax.set_axis_off()
        ax.set_title(label, fontsize=9)
    tiles_path = os.path.join(args.out, f"training_tiles_{args.family}.png")
    fig.tight_layout()
    fig.savefig(tiles_path, dpi=130)
    plt.close(fig)
    print("wrote", tiles_path)


if __name__ == "__main__":
    main()
