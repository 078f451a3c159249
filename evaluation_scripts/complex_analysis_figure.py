#!/usr/bin/env python3
"""Complex analysis-results figures (role parity with ref
evaluation_scripts/paper/07_plot_complex_analysis_results.ipynb):
build a DeepSDF microstructure beam from a trained experiment,
tetrahedralize it, solve the cantilever problem, and render
displacement-magnitude / strain-energy-density fields plus the
normal-projected design-velocity (dVertices) arrow field. Ends with
the notebook's stretched-mesh check: re-solve on vertices+dVertices
and compare against compliance + derivative.

The reference drove gustaf/vedo + TetGen + PyMFEM; here the whole
chain is in-repo (opt/geometry.py DeepSDFMesh -> opt/stuffing ->
opt/fem) and the renders are matplotlib.

    python evaluation_scripts/complex_analysis_figure.py \
        -e experiments/round_cross_big_network --out /tmp/complex --cpu
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from simple_analysis_figure import surface_scalar_plot

DEFAULT_CAPS = {
    "x0": {"cap": 1, "measure": 0.05}, "x1": {"cap": -1, "measure": 0.05},
    "y0": {"cap": -1, "measure": 0.1}, "y1": {"cap": -1, "measure": 0.1},
    "z0": {"cap": -1, "measure": 0.1}, "z1": {"cap": 1, "measure": 0.1},
}


def arrow_plot(verts, faces, dverts, path, title, scale=None, stride=23):
    """Surface mesh + design-velocity arrows (ref's gus arrow_data view)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from mpl_toolkits.mplot3d.art3d import Poly3DCollection

    fig = plt.figure(figsize=(9, 4.5))
    ax = fig.add_subplot(111, projection="3d")
    coll = Poly3DCollection(verts[faces], facecolors=(0.8, 0.8, 0.85, 0.35),
                            edgecolors="none")
    ax.add_collection3d(coll)
    mag = np.linalg.norm(dverts, axis=1)
    # draw where the design actually moves: every vertex above 10% of
    # the peak velocity, thinned to ~400 arrows (a uniform stride
    # mostly sampled near-zero cap/interior vertices)
    sel = np.flatnonzero(mag > 0.1 * mag.max())
    sel = sel[:: max(1, len(sel) // 400)]
    if scale is None:  # longest drawn arrow ~0.15 domain units
        scale = 0.15 / max(mag.max(), 1e-12)
    if len(sel):
        v, d = verts[sel], scale * dverts[sel]
        ax.quiver(v[:, 0], v[:, 1], v[:, 2], d[:, 0], d[:, 1], d[:, 2],
                  color="crimson", linewidth=0.7, arrow_length_ratio=0.25)
    ax.set_box_aspect((2, 1, 1))
    ax.set_xlim(0, 2); ax.set_ylim(0, 1); ax.set_zlim(0, 1)
    ax.view_init(elev=20, azim=-60)
    ax.set_title(title)
    fig.savefig(path, dpi=130, bbox_inches="tight")
    plt.close(fig)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--experiment", "-e",
                    default="experiments/round_cross_big_network")
    ap.add_argument("--checkpoint", "-c", default="1000")
    ap.add_argument("--tiling", type=int, nargs=3, default=[2, 1, 1],
                    help="the ref notebook's small [2,1,1] demo tiling")
    ap.add_argument("--n-base", type=int, default=20)
    ap.add_argument("--design-var", type=int, default=0,
                    help="which design variable's dVertices to draw")
    ap.add_argument("--fem", choices=("scipy", "jax"), default="scipy")
    ap.add_argument("--out", default="evaluation_scripts/figures/complex_analysis")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from deepsdf_tpu.opt.geometry import DeepSDFMesh
    from deepsdf_tpu.opt.problems import CantileverBeam

    os.makedirs(args.out, exist_ok=True)
    geo = DeepSDFMesh({
        "experiment_directory": args.experiment,
        "checkpoint": args.checkpoint,
        "degrees": [1, 1, 1], "refinement": [],
        "N_base_reconstruction": args.n_base,
        "tiling": list(args.tiling),
        "cap_border_dict": DEFAULT_CAPS,
        "decimate_mesh": True, "remove_orphans": True,
    })
    cps = np.zeros((geo.get_n_control_points(), geo.get_latent_shape()))
    geo.generate_surface_mesh(cps)
    geo.tetrahedralize_surface()
    bf, marker = geo.boundary_conditions()
    dTheta = geo.get_dTheta()                      # (V, 3, D)
    print(f"mesh: {geo.volumes.num_vertices} verts, "
          f"{len(geo.volumes.tets)} tets, {dTheta.shape[2]} design vars")

    beam = CantileverBeam()
    beam.set_mesh(geo.volumes.vertices, geo.volumes.tets, bf, marker)
    beam.set_up()
    vol, d_vol = beam.compute_volume(dTheta=dTheta)
    beam.solve(method=args.fem)
    comp, d_comp = beam.compute_compliance(dTheta=dTheta)
    print(f"Vol: {vol:.5g}, dVol[:4]: {np.asarray(d_vol).ravel()[:4]}")
    print(f"Compliance: {comp:.5g}, "
          f"dCompliance[:4]: {np.asarray(d_comp).ravel()[:4]}")

    u = beam.u_data
    umag = np.linalg.norm(u, axis=1)
    sed = beam.solver.vertex_sed()
    verts = geo.volumes.vertices
    scale = 0.1 / max(umag.max(), 1e-12)
    surface_scalar_plot(verts + scale * u, bf, umag,
                        os.path.join(args.out, "u_mag.png"),
                        f"|u| on deformed microstructure (warp x{scale:.3g})")
    surface_scalar_plot(verts, bf, sed,
                        os.path.join(args.out, "sed.png"),
                        "strain energy density", cmap="inferno")
    d = args.design_var
    arrow_plot(verts, bf, dTheta[:, :, d],
               os.path.join(args.out, f"dvertices_{d}.png"),
               f"normal-projected design velocity, design var {d}")

    # stretched-mesh verification (ref cells 8-9): move the mesh along
    # the design velocity of ONE variable and compare the re-solved
    # values against the first-order prediction. The ref stepped by the
    # full unit velocity; surface moves there are O(0.1) — far outside
    # the first-order regime — so we scale to a small step first.
    eps = 0.02 / max(np.abs(dTheta[:, :, d]).max(), 1e-12)
    step = eps * dTheta[:, :, d]
    beam2 = CantileverBeam()
    beam2.set_mesh(verts + step, geo.volumes.tets, bf, marker)
    beam2.set_up()
    vol2, _ = beam2.compute_volume()
    beam2.solve(method=args.fem)
    comp2, _ = beam2.compute_compliance()
    print(f"Volume of deformed mesh (eps={eps:.3g}) {vol2:.6g} "
          f"({vol + eps * float(np.ravel(d_vol)[d]):.6g} expected)")
    print(f"Compliance of deformed mesh: {comp2:.6g} "
          f"({comp + eps * float(np.ravel(d_comp)[d]):.6g} expected)")


if __name__ == "__main__":
    main()
