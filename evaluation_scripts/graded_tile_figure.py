#!/usr/bin/env python3
"""Graded single-tile interpolation figure (role parity with ref
evaluation_scripts/paper/02_generate_single_interpolation.py): decode
ONE microstructure tile under a latent B-spline control grid, once
with uniform control points and once with the top layer graded, and
emit the reference's asset types — latent-field map, SDF z-slice
contours, and shaded mesh renders (ref outputs structure_latent*.png,
structure_sdf*.png, structure_mesh*.png).

    python evaluation_scripts/graded_tile_figure.py \
        -e experiments/double_lattice_3D_no_topo -c 1000 \
        --latent-base 0 -0.4 --grade 0.2 --out /tmp/graded_tile
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--experiment", "-e", default="experiments/double_lattice_3D_no_topo")
    ap.add_argument("--checkpoint", "-c", default="1000")
    ap.add_argument("--latent-base", type=float, nargs="+", default=[0.0, -0.4])
    ap.add_argument("--grade", type=float, default=0.2,
                    help="offset added to the top-z control-point layer")
    ap.add_argument("--res", type=int, default=160, help="slice resolution")
    ap.add_argument("--mesh-n", type=int, default=64, help="marching grid")
    ap.add_argument("--out", default="evaluation_scripts/figures")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from deepsdf_tpu.mesh.microstructure import (
        cap_items_tuple, create_mesh_microstructure, domain_basis_matrix,
        microstructure_sdf,
    )
    from deepsdf_tpu.ops.bspline import latent_field_spline
    from deepsdf_tpu.tools.plotting import _plt, screenshot_mesh
    from deepsdf_tpu.workspace import load_trained_model

    config, params = load_trained_model(args.experiment, args.checkpoint)
    base = np.asarray(args.latent_base, dtype=np.float64)
    if base.shape[0] != config.latent_size:
        raise SystemExit(f"--latent-base needs {config.latent_size} values")

    os.makedirs(args.out, exist_ok=True)
    spline = latent_field_spline(config.latent_size, [1, 1, 1], [0, 0, 0])
    cp_grid_shape = tuple(spline.control_mesh_resolutions)  # (2,2,2)

    def cps(graded: bool) -> np.ndarray:
        cp = np.tile(base, (int(np.prod(cp_grid_shape)), 1))
        if graded:
            # grade the top-z control layer (last-axis-major ordering:
            # z slowest — matches latent_field_spline's grid layout)
            half = cp.shape[0] // 2
            cp[half:] += args.grade
        return cp

    plt = _plt()
    for label, graded in (("", False), ("_graded", True)):
        spline.control_points = cps(graded)

        # latent-field map over the z=0 midplane
        lin = np.linspace(-1, 1, args.res)
        X, Y = np.meshgrid(lin, lin, indexing="ij")
        plane = np.stack([X.ravel(), Y.ravel(), np.zeros(X.size)], 1)
        lat = np.asarray(spline.evaluate(plane)).reshape(args.res, args.res, -1)
        fig, axes = plt.subplots(1, lat.shape[-1],
                                 figsize=(4 * lat.shape[-1], 3.5))
        axes = np.atleast_1d(axes)
        for k, ax in enumerate(axes):
            im = ax.imshow(lat[..., k].T, origin="lower", extent=(-1, 1, -1, 1))
            ax.set_title(f"latent[{k}] @ z=0")
            fig.colorbar(im, ax=ax, shrink=0.8)
        fig.savefig(os.path.join(args.out, f"structure_latent{label}.png"),
                    dpi=150, bbox_inches="tight")
        plt.close(fig)

        # SDF z-slice contour (single tile, no border caps — ref 02
        # plots the raw tile SDF)
        basis = jnp.asarray(domain_basis_matrix(spline, plane))
        sdf = np.asarray(microstructure_sdf(
            config, params, jnp.asarray(spline.control_points, jnp.float32),
            basis, jnp.asarray(plane, jnp.float32), (1, 1, 1),
            cap_items_tuple({}))).reshape(args.res, args.res)
        fig, ax = plt.subplots(figsize=(4.5, 4))
        cs = ax.contourf(X, Y, sdf, levels=21, cmap="RdBu")
        ax.contour(X, Y, sdf, levels=[0.0], colors="k", linewidths=1.5)
        ax.set_aspect("equal")
        ax.set_title(f"SDF @ z=0{' (graded)' if graded else ''}")
        fig.colorbar(cs, ax=ax, shrink=0.85)
        fig.savefig(os.path.join(args.out, f"structure_sdf{label}.png"),
                    dpi=150, bbox_inches="tight")
        plt.close(fig)

        # shaded mesh render
        verts, faces = create_mesh_microstructure(
            (1, 1, 1), config, params, spline, N=args.mesh_n,
            cap_border_dict={})
        if len(faces):
            screenshot_mesh(verts, faces,
                            os.path.join(args.out, f"structure_mesh{label}.png"))
        else:
            print(f"warning: empty mesh for {label or 'base'} variant")
        print(f"{label or 'base'}: latent/sdf/mesh figures written")

    print(f"figures in {args.out}")


if __name__ == "__main__":
    main()
