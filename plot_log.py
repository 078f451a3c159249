#!/usr/bin/env python3
"""Plot training logs for an experiment.

Restores the upstream DeepSDF ``plot_log.py`` entry point that the reference
fork deleted but still documents (reference README.md:125).  Reads this
framework's ``Logs.npz`` (deepsdf_tpu/train/checkpoint.py) and, transparently,
a reference ``Logs.pth`` written by the PyTorch code
(reference train_deep_sdf.py:179-199).

Plot types follow upstream: loss (per-step, with per-epoch smoothing),
learning_rate, time (seconds/epoch), lat_mag (mean latent norm), param_mag
(per-parameter weight norms).
"""

import argparse
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

import deepsdf_tpu.workspace as ws
from deepsdf_tpu.train.checkpoint import load_logs


def _load_any_logs(experiment_directory):
    npz_path = os.path.join(experiment_directory, ws.logs_filename)
    if os.path.isfile(npz_path):
        return load_logs(experiment_directory)
    pth_path = os.path.join(experiment_directory, "Logs.pth")
    if os.path.isfile(pth_path):
        import torch

        data = torch.load(pth_path, map_location="cpu", weights_only=False)
        return (
            list(np.asarray(data["loss"], dtype=np.float64)),
            [list(np.atleast_1d(r)) for r in data.get("learning_rate", [])],
            list(np.asarray(data.get("timing", []), dtype=np.float64)),
            list(np.asarray(data.get("latent_magnitude", []), dtype=np.float64)),
            {k: list(v) for k, v in data.get("param_magnitude", {}).items()},
            int(data["epoch"]),
        )
    raise FileNotFoundError(
        f'no log file ("{npz_path}" or "{pth_path}") in experiment directory'
    )


def plot_logs(experiment_directory, plot_type, out_path=None):
    loss_log, lr_log, timing_log, lat_mag_log, param_mag_log, epoch = _load_any_logs(
        experiment_directory
    )

    fig, ax = plt.subplots(figsize=(8, 4.5))
    title = os.path.basename(os.path.normpath(experiment_directory))

    if plot_type == "loss":
        loss = np.asarray(loss_log, dtype=np.float64)
        iters_per_epoch = max(len(loss) // max(epoch, 1), 1)
        x = np.arange(len(loss)) / iters_per_epoch
        ax.plot(x, loss, color="#888888", linewidth=0.5, label="per step")
        n_full = (len(loss) // iters_per_epoch) * iters_per_epoch
        if n_full:
            smooth = loss[:n_full].reshape(-1, iters_per_epoch).mean(axis=1)
            ax.plot(np.arange(1, len(smooth) + 1), smooth, color="#1f77b4",
                    linewidth=1.5, label="per epoch")
        ax.set_yscale("log")
        ax.set_xlabel("epoch")
        ax.set_ylabel("loss")
        ax.legend()
    elif plot_type == "learning_rate":
        for i, series in enumerate(zip(*lr_log)):
            ax.plot(np.arange(1, len(series) + 1), series,
                    label=f"param group {i}")
        ax.set_xlabel("epoch")
        ax.set_ylabel("learning rate")
        ax.legend()
    elif plot_type == "time":
        ax.plot(np.arange(1, len(timing_log) + 1), timing_log)
        ax.set_xlabel("epoch")
        ax.set_ylabel("seconds / epoch")
    elif plot_type == "lat_mag":
        ax.plot(np.arange(1, len(lat_mag_log) + 1), lat_mag_log)
        ax.set_xlabel("epoch")
        ax.set_ylabel("mean latent-vector magnitude")
    elif plot_type == "param_mag":
        for name, series in param_mag_log.items():
            ax.plot(np.arange(1, len(series) + 1), series, label=name)
        ax.set_xlabel("epoch")
        ax.set_ylabel("parameter magnitude")
        ax.legend(fontsize=6)
    else:
        raise ValueError(f"unrecognized plot type: {plot_type}")

    ax.set_title(f"{title} — {plot_type} (epoch {epoch})")
    ax.grid(True, alpha=0.3)
    fig.tight_layout()
    if out_path is None:
        out_path = os.path.join(experiment_directory, f"log_{plot_type}.png")
    fig.savefig(out_path, dpi=150)
    plt.close(fig)
    return out_path


def main():
    parser = argparse.ArgumentParser(description="Plot DeepSDF training logs.")
    parser.add_argument("--experiment", "-e", dest="experiment_directory",
                        required=True, help="experiment directory")
    parser.add_argument("--type", "-t", dest="type", default="loss",
                        choices=["loss", "learning_rate", "time", "lat_mag",
                                 "param_mag"],
                        help="plot type")
    parser.add_argument("--out", "-o", default=None,
                        help="output image path (default: <exp>/log_<type>.png)")
    args = parser.parse_args()
    out = plot_logs(args.experiment_directory, args.type, args.out)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
