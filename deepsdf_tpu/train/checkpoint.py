"""Checkpoint triplet + logs persistence.

Reference contract (ref: train_deep_sdf.py:96-232,299-309,567-581):
per-snapshot ``ModelParameters/<e>``, ``OptimizerParameters/<e>``,
``LatentCodes/<e>`` plus a ``latest`` every LogFrequency epochs, and a
``Logs`` file with loss/lr/timing/latent-magnitude/param-magnitude
histories. We store ``.npz`` archives of numpy arrays (no torch on the
hot path); reference ``.pth`` files are read transparently for
migration via ``networks.torch_import``.
"""

from __future__ import annotations

import json
import os
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp

from .. import workspace as ws

SEP = "||"


def _flatten_pytree(tree: Any) -> dict[str, np.ndarray]:
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = {}
    for path, leaf in flat:
        key = SEP.join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        out[key] = np.asarray(leaf)
    return out


def _unflatten_into(template: Any, arrays: dict[str, np.ndarray]) -> Any:
    paths_leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, leaf in paths_leaves:
        key = SEP.join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        if key not in arrays:
            raise KeyError(f"checkpoint missing array for {key}")
        arr = arrays[key]
        if tuple(arr.shape) != tuple(np.shape(leaf)):
            raise ValueError(f"shape mismatch for {key}: ckpt {arr.shape} vs model {np.shape(leaf)}")
        leaves.append(jnp.asarray(arr, dtype=jnp.asarray(leaf).dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _save_npz(path: str, epoch: int, tree: Any) -> None:
    arrays = _flatten_pytree(tree)
    arrays["__epoch__"] = np.asarray(epoch)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)  # atomic publish — a killed run never corrupts 'latest'


def _load_npz(path: str) -> tuple[dict[str, np.ndarray], int]:
    with np.load(path, allow_pickle=False) as npz:
        arrays = {k: npz[k] for k in npz.files}
    epoch = int(arrays.pop("__epoch__"))
    return arrays, epoch


# ---- model ----

def save_model(experiment_directory: str, filename: str, params: Any, epoch: int) -> None:
    d = ws.get_model_params_dir(experiment_directory, True)
    _save_npz(os.path.join(d, filename + ".npz" if not filename.endswith(".npz") else filename),
              epoch, params)


def load_model_parameters(experiment_directory: str, checkpoint: str, config,
                          template: Any | None = None) -> tuple[Any, int]:
    d = ws.get_model_params_dir(experiment_directory)
    npz_path = os.path.join(d, checkpoint + ".npz")
    pth_path = os.path.join(d, checkpoint + ".pth")
    if os.path.isfile(npz_path):
        arrays, epoch = _load_npz(npz_path)
        if template is None:
            from ..networks.decoder import init_decoder_params
            template = init_decoder_params(jax.random.PRNGKey(0), config)
        return _unflatten_into(template, arrays), epoch
    if os.path.isfile(pth_path):
        from ..networks.torch_import import load_reference_model
        params, epoch = load_reference_model(pth_path, config)
        return params, epoch if epoch is not None else 0
    raise FileNotFoundError(f'model state "{npz_path}" (or .pth) does not exist')


# ---- optimizer ----

def save_optimizer(experiment_directory: str, filename: str, opt_state: Any, epoch: int) -> None:
    d = ws.get_optimizer_params_dir(experiment_directory, True)
    _save_npz(os.path.join(d, filename + ".npz"), epoch, opt_state)


def load_optimizer(experiment_directory: str, checkpoint: str, template: Any) -> tuple[Any, int]:
    path = os.path.join(ws.get_optimizer_params_dir(experiment_directory), checkpoint + ".npz")
    if not os.path.isfile(path):
        raise FileNotFoundError(f'optimizer state "{path}" does not exist')
    arrays, epoch = _load_npz(path)
    return _unflatten_into(template, arrays), epoch


# ---- latents ----

def save_latent_vectors(experiment_directory: str, filename: str, latents, epoch: int) -> None:
    d = ws.get_latent_codes_dir(experiment_directory, True)
    _save_npz(os.path.join(d, filename + ".npz"), epoch, {"weight": latents})


def load_latent_vectors(experiment_directory: str, checkpoint: str) -> tuple[jnp.ndarray, int]:
    d = ws.get_latent_codes_dir(experiment_directory)
    npz_path = os.path.join(d, checkpoint + ".npz")
    pth_path = os.path.join(d, checkpoint + ".pth")
    if os.path.isfile(npz_path):
        arrays, epoch = _load_npz(npz_path)
        return jnp.asarray(arrays["weight"]), epoch
    if os.path.isfile(pth_path):
        from ..networks.torch_import import load_reference_latents
        arr, epoch = load_reference_latents(pth_path)
        return jnp.asarray(arr), epoch if epoch is not None else 0
    raise FileNotFoundError(f'latent state file "{npz_path}" (or .pth) does not exist')


# ---- logs (ref: train_deep_sdf.py:179-232) ----

def save_logs(experiment_directory: str, loss_log, lr_log, timing_log, lat_mag_log,
              param_mag_log, epoch: int) -> None:
    path = os.path.join(experiment_directory, ws.logs_filename)
    payload = {
        "epoch": np.asarray(epoch),
        "loss": np.asarray(loss_log, dtype=np.float64),
        "learning_rate": np.asarray(lr_log, dtype=np.float64),
        "timing": np.asarray(timing_log, dtype=np.float64),
        "latent_magnitude": np.asarray(lat_mag_log, dtype=np.float64),
        "param_magnitude_keys": json.dumps(list(param_mag_log.keys())),
    }
    for k, v in param_mag_log.items():
        payload[f"pm{SEP}{k}"] = np.asarray(v, dtype=np.float64)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **payload)
    os.replace(tmp, path)


def load_logs(experiment_directory: str):
    path = os.path.join(experiment_directory, ws.logs_filename)
    if not os.path.isfile(path):
        raise FileNotFoundError(f'log file "{path}" does not exist')
    with np.load(path, allow_pickle=False) as npz:
        keys = json.loads(str(npz["param_magnitude_keys"]))
        param_mag_log = {k: list(npz[f"pm{SEP}{k}"]) for k in keys}
        return (
            list(npz["loss"]),
            [list(r) for r in npz["learning_rate"]],
            list(npz["timing"]),
            list(npz["latent_magnitude"]),
            param_mag_log,
            int(npz["epoch"]),
        )


def clip_logs(loss_log, lr_log, timing_log, lat_mag_log, param_mag_log, epoch):
    """Trim histories to a restored epoch (ref: train_deep_sdf.py:221-232)."""
    iters_per_epoch = len(loss_log) // max(len(lr_log), 1)
    loss_log = loss_log[: iters_per_epoch * epoch]
    lr_log = lr_log[:epoch]
    timing_log = timing_log[:epoch]
    lat_mag_log = lat_mag_log[:epoch]
    for n in param_mag_log:
        param_mag_log[n] = param_mag_log[n][:epoch]
    return loss_log, lr_log, timing_log, lat_mag_log, param_mag_log
