#!/usr/bin/env python3
"""Finite-difference validation plots of dVerts/dControl
(parity with ref evaluation_scripts/paper/04_plot_derivatives.py /
05_plot_composed_derivatives.py — the analytic vertex jacobians from
the differentiable extraction are compared against central differences
with fixed topology and plotted as scatter + error histogram)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import os

import numpy as np


def main(experiment_directory, checkpoint, out=None, tiling=(1, 1, 1),
         N=16, n_probes=6, eps=1e-3, seed=0):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import jax.numpy as jnp

    from deepsdf_tpu import ws
    from deepsdf_tpu.mesh.diff_mesh import create_mesh_microstructure_diff, diff_grid
    from deepsdf_tpu.mesh.marching import marching_tetrahedra
    from deepsdf_tpu.mesh.microstructure import (
        cap_items_tuple, domain_basis_matrix, microstructure_sdf,
    )
    from deepsdf_tpu.networks.decoder import DecoderConfig
    from deepsdf_tpu.ops.bspline import latent_field_spline
    from deepsdf_tpu.ops.tiling import DEFAULT_CAP_BORDER
    from deepsdf_tpu.train.checkpoint import load_latent_vectors, load_model_parameters

    specs = ws.load_experiment_specifications(experiment_directory)
    config = DecoderConfig.from_specs(specs)
    params, _ = load_model_parameters(experiment_directory, checkpoint, config)
    latents, _ = load_latent_vectors(experiment_directory, checkpoint)
    latents = np.asarray(latents)

    spline = latent_field_spline(latents.shape[1], [1, 1, 1], [0])
    spline.control_points = np.tile(latents[0], (spline.control_points.shape[0], 1))
    C, L = spline.control_points.shape

    verts, faces, jac = create_mesh_microstructure_diff(
        tiling, config, params, spline, N=[N] * 3, compute_derivatives=True)

    # fixed-topology finite differences
    coords_np, dims, spacing, origin = diff_grid((N,) * 3)
    basis = domain_basis_matrix(spline, coords_np)
    caps = cap_items_tuple(DEFAULT_CAP_BORDER)
    sdf0 = np.asarray(microstructure_sdf(
        config, params, jnp.asarray(spline.control_points, jnp.float32),
        jnp.asarray(basis), jnp.asarray(coords_np), tuple(tiling), caps))
    _, _, _, _, topo = marching_tetrahedra(
        sdf0.reshape(dims).astype(np.float64), 0.0, spacing, return_topology=True)
    u_lo, u_hi = topo["u_lo"], topo["u_hi"]
    ny, nz = dims[1], dims[2]

    def verts_from(cpts):
        sdf = np.asarray(microstructure_sdf(
            config, params, jnp.asarray(cpts, jnp.float32), jnp.asarray(basis),
            jnp.asarray(coords_np), tuple(tiling), caps), dtype=np.float64)
        f_lo, f_hi = sdf[u_lo], sdf[u_hi]
        t = f_lo / (f_lo - f_hi)
        def coords_of(flat):
            return np.stack([flat // (ny * nz), (flat // nz) % ny, flat % nz],
                            1).astype(np.float64) * np.asarray(spacing)
        phys = (coords_of(u_lo) * (1 - t[:, None]) + coords_of(u_hi) * t[:, None]
                + np.asarray(origin))
        return (phys + 1) / 2

    rng = np.random.default_rng(seed)
    an_all, fd_all = [], []
    for k in rng.choice(C, min(n_probes, C), replace=False):
        for l in range(L):
            cp, cm = spline.control_points.copy(), spline.control_points.copy()
            cp[k, l] += eps
            cm[k, l] -= eps
            fd = (verts_from(cp) - verts_from(cm)) / (2 * eps)
            an_all.append(jac[:, :, k, l].ravel())
            fd_all.append(fd.ravel())
    an = np.concatenate(an_all)
    fd = np.concatenate(fd_all)
    mask = np.abs(fd) > 1e-5

    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(11, 5))
    ax1.scatter(fd[mask], an[mask], s=3, alpha=0.4)
    lim = max(np.abs(fd[mask]).max(), np.abs(an[mask]).max())
    ax1.plot([-lim, lim], [-lim, lim], "k--", lw=1)
    ax1.set_xlabel("finite difference")
    ax1.set_ylabel("analytic (implicit-function theorem)")
    ax1.set_title("dVerts/dControl validation")
    rel = np.abs(an[mask] - fd[mask]) / np.maximum(np.abs(fd[mask]), 1e-6)
    ax2.hist(np.clip(rel, 0, 0.5), bins=50)
    ax2.set_title(f"relative error (median {np.median(rel):.4f})")
    for ax in (ax1, ax2):
        ax.grid(True, alpha=0.3)
    out = out or os.path.join(experiment_directory, "derivative_validation.png")
    fig.savefig(out, dpi=130, bbox_inches="tight")
    print(f"wrote {out}  (median rel err {np.median(rel):.5f}, "
          f"{mask.sum()} sensitive entries)")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--experiment", "-e", dest="experiment_directory", required=True)
    p.add_argument("--checkpoint", "-c", default="latest")
    p.add_argument("--out", default=None)
    p.add_argument("-N", type=int, default=16)
    args = p.parse_args()
    main(args.experiment_directory, args.checkpoint, args.out, N=args.N)
