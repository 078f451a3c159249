#!/usr/bin/env python3
"""Model-evaluation summary (parity with ref
evaluation_scripts/01_model_evaluation.ipynb): reconstruction losses of
test-split latent inference + chamfer table + training-loss curve."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import os

import numpy as np


def main(experiment_directory, checkpoint, out=None):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from deepsdf_tpu import ws
    from deepsdf_tpu.train.checkpoint import load_logs

    fig, axes = plt.subplots(1, 3, figsize=(16, 4.5))

    # training loss history (Logs parity)
    try:
        loss_log, lr_log, timing, lat_mag, pmag, epoch = load_logs(experiment_directory)
        axes[0].plot(loss_log)
        axes[0].set_yscale("log")
        axes[0].set_title(f"training loss (epoch {epoch})")
        axes[2].plot(lat_mag)
        axes[2].set_title("mean latent magnitude")
    except FileNotFoundError:
        axes[0].set_title("no Logs.npz")

    # reconstruction codes/losses written by recon/driver.py
    rec_dir = os.path.join(experiment_directory, ws.reconstructions_subdir)
    losses = []
    if os.path.isdir(rec_dir):
        for root, _, files in os.walk(rec_dir):
            for f in files:
                if f.endswith(".npz") and ws.reconstruction_codes_subdir in root:
                    data = np.load(os.path.join(root, f))
                    if "loss" in data:
                        losses.append(float(data["loss"]))
    if losses:
        axes[1].hist(losses, bins=20)
        axes[1].set_title(f"recon losses (n={len(losses)}, "
                          f"mean {np.mean(losses):.4f})")
    else:
        axes[1].set_title("no reconstruction codes found")

    # chamfer table if evaluate.py ran
    ev = os.path.join(experiment_directory, ws.evaluation_subdir, str(checkpoint),
                      "chamfer.json")
    if os.path.isfile(ev):
        with open(ev) as f:
            ch = json.load(f)
        vals = np.asarray(list(ch.values()))
        print(f"chamfer over {len(vals)} shapes: mean {vals.mean():.6f} "
              f"median {np.median(vals):.6f}")

    for ax in axes:
        ax.grid(True, alpha=0.3)
    out = out or os.path.join(experiment_directory, "model_evaluation.png")
    fig.savefig(out, dpi=130, bbox_inches="tight")
    print(f"wrote {out}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--experiment", "-e", dest="experiment_directory", required=True)
    p.add_argument("--checkpoint", "-c", default="latest")
    p.add_argument("--out", default=None)
    args = p.parse_args()
    main(args.experiment_directory, args.checkpoint, args.out)
