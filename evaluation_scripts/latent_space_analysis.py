#!/usr/bin/env python3
"""t-SNE / PCA analysis of trained latent codes
(parity with ref evaluation_scripts/02_tSNE_plots.ipynb)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import os

import numpy as np


def main(experiment_directory, checkpoint, out=None, perplexity=10.0):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from sklearn.decomposition import PCA
    from sklearn.manifold import TSNE

    from deepsdf_tpu.train.checkpoint import load_latent_vectors

    latents, epoch = load_latent_vectors(experiment_directory, checkpoint)
    latents = np.asarray(latents)
    n, d = latents.shape

    fig, axes = plt.subplots(1, 3 if d > 2 else 2, figsize=(15, 5))
    color = np.arange(n)

    if d == 2:
        axes[0].scatter(latents[:, 0], latents[:, 1], c=color, cmap="viridis")
        axes[0].set_title("latent space (2-D, direct)")
    else:
        pca = PCA(n_components=2).fit(latents)
        proj = pca.transform(latents)
        axes[0].scatter(proj[:, 0], proj[:, 1], c=color, cmap="viridis")
        axes[0].set_title(f"PCA (evr {pca.explained_variance_ratio_.sum():.2f})")

    if n > 5:
        tsne = TSNE(n_components=2, perplexity=min(perplexity, (n - 1) / 3),
                    init="pca", random_state=0)
        emb = tsne.fit_transform(latents)
        axes[1].scatter(emb[:, 0], emb[:, 1], c=color, cmap="viridis")
        axes[1].set_title("t-SNE")

    if d > 2 and len(axes) > 2:
        norms = np.linalg.norm(latents, axis=1)
        axes[2].hist(norms, bins=30)
        axes[2].set_title("latent norms")

    for ax in axes:
        ax.grid(True, alpha=0.3)
    out = out or os.path.join(experiment_directory, f"latent_analysis_{epoch}.png")
    fig.savefig(out, dpi=130, bbox_inches="tight")
    print(f"wrote {out}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--experiment", "-e", dest="experiment_directory", required=True)
    p.add_argument("--checkpoint", "-c", default="latest")
    p.add_argument("--out", default=None)
    args = p.parse_args()
    main(args.experiment_directory, args.checkpoint, args.out)
