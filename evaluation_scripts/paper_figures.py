#!/usr/bin/env python3
"""Paper/figure pipelines (role parity with the reference's
evaluation_scripts/paper/ set):

  interpolation — latent-interpolation SDF cross-section strips between
                  two trained codes (ref paper/02_generate_single_
                  interpolation.py role)
  optimization  — compliance/volume convergence + design-vector heatmap
                  from a run's results.json (ref paper/08_plot_
                  optimization_results.ipynb role)
  level-sets    — schematic SDF level-set contours of one trained shape
                  (ref paper/00_schematic_level_sets.ipynb role)

    python evaluation_scripts/paper_figures.py interpolation -e experiments/snappy3D --ids 0 7
    python evaluation_scripts/paper_figures.py optimization optimization_runs/opti_double_lattice_8x4
    python evaluation_scripts/paper_figures.py level-sets -e experiments/snappy3D --id 0
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import numpy as np


def _decoder(experiment_directory, checkpoint):
    from deepsdf_tpu.workspace import load_latent_vectors, load_trained_model

    config, params = load_trained_model(experiment_directory, checkpoint)
    latents, _ = load_latent_vectors(experiment_directory, checkpoint)
    return config, params, np.asarray(latents)


def _slice_sdf(config, params, latent, z=0.0, n=160):
    import jax.numpy as jnp

    from deepsdf_tpu.networks.decoder import decoder_forward

    lin = np.linspace(-1, 1, n)
    X, Y = np.meshgrid(lin, lin, indexing="ij")
    q = np.stack([X.ravel(), Y.ravel(), np.full(X.size, z)], 1).astype(np.float32)
    lat = np.broadcast_to(latent, (len(q), len(latent)))
    out = decoder_forward(config, params,
                          jnp.asarray(np.concatenate([lat, q], 1)))
    return np.asarray(out).reshape(n, n), lin


def fig_interpolation(args):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    config, params, latents = _decoder(args.experiment, args.checkpoint)
    i, j = args.ids
    steps = args.steps
    fig, axes = plt.subplots(1, steps, figsize=(3 * steps, 3))
    for k, ax in enumerate(axes):
        t = k / (steps - 1)
        lat = (1 - t) * latents[i] + t * latents[j]
        sdf, lin = _slice_sdf(config, params, lat, z=args.z)
        ax.contourf(lin, lin, sdf.T, levels=[-10, 0], colors=["#26547c"])
        ax.contour(lin, lin, sdf.T, levels=[0], colors="k", linewidths=0.8)
        ax.set_title(f"t={t:.2f}")
        ax.set_aspect("equal")
        ax.set_xticks([])
        ax.set_yticks([])
    out = args.out or os.path.join(args.experiment,
                                   f"interpolation_{i}_{j}.png")
    fig.tight_layout()
    fig.savefig(out, dpi=150)
    print(out)


def fig_level_sets(args):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    config, params, latents = _decoder(args.experiment, args.checkpoint)
    sdf, lin = _slice_sdf(config, params, latents[args.id], z=args.z, n=240)
    fig, ax = plt.subplots(figsize=(5, 5))
    cs = ax.contour(lin, lin, sdf.T, levels=np.linspace(-0.08, 0.08, 9),
                    cmap="RdBu")
    ax.clabel(cs, inline=True, fontsize=6, fmt="%.2f")
    ax.contour(lin, lin, sdf.T, levels=[0], colors="k", linewidths=1.6)
    ax.set_aspect("equal")
    ax.set_title(f"SDF level sets, shape {args.id}, z={args.z}")
    out = args.out or os.path.join(args.experiment, f"level_sets_{args.id}.png")
    fig.savefig(out, dpi=150)
    print(out)


def fig_optimization(args):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from deepsdf_tpu.opt.driver import load_results

    res = load_results(args.run_folder)
    comp = np.asarray(res.compliance, dtype=float)
    vol = np.asarray(res.volume, dtype=float)
    dv = np.asarray(res.design_vector, dtype=float)
    it = np.arange(len(comp))

    fig, axes = plt.subplots(1, 3, figsize=(15, 4))
    axes[0].plot(it, comp, "o-", ms=2)
    axes[0].set_xlabel("iteration")
    axes[0].set_ylabel("compliance")
    axes[1].plot(it, vol, "o-", ms=2, color="#ef476f")
    axes[1].axhline(args.volume_constraint, ls="--", color="k", lw=0.8,
                    label=f"constraint {args.volume_constraint}")
    axes[1].legend()
    axes[1].set_xlabel("iteration")
    axes[1].set_ylabel("volume")
    if dv.size:
        im = axes[2].imshow(dv.T, aspect="auto", cmap="coolwarm",
                            vmin=-1, vmax=1, interpolation="nearest")
        fig.colorbar(im, ax=axes[2], shrink=0.85)
        axes[2].set_xlabel("iteration")
        axes[2].set_ylabel("design variable")
    out = args.out or os.path.join(args.run_folder, "convergence_figure.png")
    fig.tight_layout()
    fig.savefig(out, dpi=150)
    print(out)


if __name__ == "__main__":
    if "--cpu" in sys.argv:           # keep the TPU tunnel free
        sys.argv.remove("--cpu")
        import jax
        jax.config.update("jax_platforms", "cpu")
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    sub = p.add_subparsers(dest="cmd", required=True)

    pi = sub.add_parser("interpolation")
    pi.add_argument("--experiment", "-e", required=True)
    pi.add_argument("--checkpoint", "-c", default="latest")
    pi.add_argument("--ids", type=int, nargs=2, default=(0, 1))
    pi.add_argument("--steps", type=int, default=6)
    pi.add_argument("--z", type=float, default=0.0)
    pi.add_argument("--out", default=None)

    pl = sub.add_parser("level-sets")
    pl.add_argument("--experiment", "-e", required=True)
    pl.add_argument("--checkpoint", "-c", default="latest")
    pl.add_argument("--id", type=int, default=0)
    pl.add_argument("--z", type=float, default=0.0)
    pl.add_argument("--out", default=None)

    po = sub.add_parser("optimization")
    po.add_argument("run_folder")
    po.add_argument("--volume-constraint", type=float, default=0.5)
    po.add_argument("--out", default=None)

    args = p.parse_args()
    if args.cmd == "interpolation":
        fig_interpolation(args)
    elif args.cmd == "level-sets":
        fig_level_sets(args)
    else:
        fig_optimization(args)
