#!/usr/bin/env python3
"""Boundary-condition schematic figures (role parity with ref
evaluation_scripts/paper/09_boundary_conditions_plots.{py,ipynb}): the
cantilever problem setup as publication schematics — (a) the 3D design
domain with the clamped x=0 plane and the distributed tip load on the
top face (ref 09_...py, gustaf/vedo arrows + black fix slab), and (b)
a 2D side view with the clamp hatching and load arrows over a
microstructure outline (ref 09_....ipynb). Pure matplotlib.

    python evaluation_scripts/boundary_conditions_figure.py --out /tmp/bc
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
from mpl_toolkits.mplot3d.art3d import Poly3DCollection


def domain_3d(path):
    """3D schematic: domain box, black clamp slab at x=0, load arrows
    pointing down onto the loaded strip of the top face."""
    fig = plt.figure(figsize=(8, 4.5))
    ax = fig.add_subplot(111, projection="3d")

    def box_faces(lo, hi):
        (x0, y0, z0), (x1, y1, z1) = lo, hi
        c = np.array([[x0, y0, z0], [x1, y0, z0], [x1, y1, z0], [x0, y1, z0],
                      [x0, y0, z1], [x1, y0, z1], [x1, y1, z1], [x0, y1, z1]])
        quads = [[0, 1, 2, 3], [4, 5, 6, 7], [0, 1, 5, 4],
                 [2, 3, 7, 6], [1, 2, 6, 5], [0, 3, 7, 4]]
        return [c[q] for q in quads]

    ax.add_collection3d(Poly3DCollection(
        box_faces((0, 0, 0), (2, 1, 1)), facecolors=(0.93, 0.93, 0.95, 0.55),
        edgecolors="0.35", linewidths=0.8))
    # clamp slab (slightly oversized, like the ref's fix box)
    ax.add_collection3d(Poly3DCollection(
        box_faces((-0.04, -0.12, -0.12), (0.0, 1.12, 1.12)),
        facecolors=(0.1, 0.1, 0.1, 0.9), edgecolors="k"))

    # distributed load: arrows onto the top-face strip at the tip
    # (marker-2 area; the ref's raster of gus arrow edges)
    strip_x0 = 2.0 - 2.0 / 24 * 2           # same order as ref's 2/24 strip
    xs = np.linspace(strip_x0, 2.0, 4)
    ys = np.linspace(0.0, 1.0, 5)
    X, Y = np.meshgrid(xs, ys)
    L = 0.28
    ax.quiver(X, Y, 1.0 + L, 0 * X, 0 * Y, -L + 0 * X,
              color="#547fab", linewidth=1.6, arrow_length_ratio=0.3)
    ax.text(2.05, 0.5, 1.35, r"$\bar t = (0,0,-0.01)$", color="#3a5a80")
    ax.text(-0.45, 0.5, 1.2, r"$u = 0$", color="k")

    ax.set_box_aspect((2, 1, 1))
    ax.set_xlim(-0.1, 2.15); ax.set_ylim(-0.15, 1.15); ax.set_zlim(-0.15, 1.35)
    ax.view_init(elev=18, azim=-65)
    ax.set_axis_off()
    ax.set_title("Cantilever problem: clamped plane + tip surface load")
    fig.savefig(path, dpi=140, bbox_inches="tight")
    plt.close(fig)


def side_view_2d(path, experiment=None, checkpoint="1000", tiling=(4, 2),
                 res=120, cpu=False):
    """2D x-z side view: clamp hatching at x=0, load arrows at the tip
    top, and (if an experiment is given) the microstructure SDF
    zero-contour as the structure outline."""
    fig, ax = plt.subplots(figsize=(8, 4.2))

    # structure outline: z-slice of the tiled decoder SDF, or plain box
    if experiment is not None:
        if cpu:
            import jax
            jax.config.update("jax_platforms", "cpu")
        import jax.numpy as jnp

        from deepsdf_tpu.networks.decoder import decoder_forward
        from deepsdf_tpu.ops.tiling import tile_transform3
        from deepsdf_tpu.workspace import load_trained_model
        from deepsdf_tpu.train.checkpoint import load_latent_vectors

        config, params = load_trained_model(experiment, checkpoint)
        lat, _ = load_latent_vectors(experiment, checkpoint)
        lat0 = np.asarray(lat)[0]
        xs = np.linspace(-1, 1, 2 * res)
        zs = np.linspace(-1, 1, res)
        X, Z = np.meshgrid(xs, zs)
        pts = np.stack([X.ravel(), np.zeros(X.size), Z.ravel()], 1)
        tiled = tile_transform3(jnp.asarray(pts, jnp.float32),
                                (tiling[0], 1, tiling[1]))
        q = jnp.concatenate([jnp.tile(jnp.asarray(lat0, jnp.float32),
                                      (len(pts), 1)), tiled], axis=1)
        sdf = np.asarray(decoder_forward(config, params, q)).reshape(X.shape)
        # plot in beam coords: x in [0,2] (aspect x2), z in [0,1]
        ax.contourf((X + 1), (Z + 1) / 2, sdf, levels=[-10, 0],
                    colors=["#c8d4e0"])
        ax.contour((X + 1), (Z + 1) / 2, sdf, levels=[0],
                   colors="#3a5a80", linewidths=1.0)
    else:
        ax.add_patch(plt.Rectangle((0, 0), 2, 1, facecolor="#e8ecf2",
                                   edgecolor="0.3"))

    # clamp hatching at x=0 (the ref's interleaved short lines)
    n = 26
    off = 0.05
    for z in np.linspace(0, 1, n):
        ax.plot([0, -off], [z, z - off], color="k", lw=1.0)
    ax.plot([0, 0], [0, 1], color="k", lw=2.0)

    # load arrows at tip top
    strip = 2.0 / 24
    for x in np.linspace(2 - strip, 2, 4):
        ax.annotate("", xy=(x, 1.0), xytext=(x, 1.15),
                    arrowprops=dict(arrowstyle="-|>", color="k", lw=1.4))
    ax.text(1.82, 1.2, r"$\bar t$", fontsize=12)
    ax.text(-0.28, 1.05, r"$u=0$", fontsize=11)

    ax.set_xlim(-0.35, 2.2)
    ax.set_ylim(-0.15, 1.3)
    ax.set_aspect("equal")
    ax.set_axis_off()
    fig.savefig(path, dpi=140, bbox_inches="tight")
    plt.close(fig)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="evaluation_scripts/figures/boundary_conditions")
    ap.add_argument("--experiment", "-e", default=None,
                    help="optional experiment for the microstructure outline "
                         "(e.g. experiments/round_cross_big_network)")
    ap.add_argument("--checkpoint", "-c", default="1000")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    domain_3d(os.path.join(args.out, "boundary_conditions_3d.png"))
    side_view_2d(os.path.join(args.out, "boundary_conditions_side.png"),
                 experiment=args.experiment, checkpoint=args.checkpoint,
                 cpu=args.cpu)
    print(f"wrote 2 figures to {args.out}")


if __name__ == "__main__":
    main()
