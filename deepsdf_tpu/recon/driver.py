"""Reconstruction driver: test split → Codes/ + Meshes/ in the
experiment's ``Reconstructions/<epoch>/`` tree.

Parity target: upstream ``reconstruct.py`` CLI behavior documented in
ref README.md:139-143 and consumed by ref
evaluation_scripts/01_model_evaluation.ipynb. Codes are stored as .npz
(key ``latent``) instead of .pth.
"""

from __future__ import annotations

import json
import logging
import os
import pathlib

import numpy as np

from .. import workspace as ws
from ..data.dataset import get_instance_filenames, unpack_sdf_samples
from ..mesh.extract import create_mesh, create_meshes_pipelined
from ..train.checkpoint import load_model_parameters
from ..networks.decoder import DecoderConfig
from .reconstruct import ReconstructConfig, reconstruct_batch

logger = logging.getLogger(__name__)


def reconstruct_split(experiment_directory: str, checkpoint: str, split: dict,
                      data_source: str | None = None, num_samples: int = 8000,
                      skip: bool = True, mesh_resolution: int = 256,
                      seed: int = 0, rcfg: ReconstructConfig = ReconstructConfig(),
                      write_meshes: bool = True,
                      sparse: bool = False,
                      max_shapes: int | None = None) -> dict[str, np.ndarray]:
    """Infer latents for every instance in ``split``; write codes and
    (optionally) 256³ meshes under Reconstructions/<epoch>/.

    ``max_shapes`` caps the run to an evenly-strided subset of the
    split (deterministic; first instance always included) — the full
    400-shape double_lattice splits cost ~80 min of mesh extraction
    each, which a representative subset covers for evaluation.

    Returns {instance_relpath: latent}.
    """
    specs = ws.load_experiment_specifications(experiment_directory)
    config = DecoderConfig.from_specs(specs)
    params, epoch = load_model_parameters(experiment_directory, checkpoint, config)
    data_source = data_source or specs["DataSource"]

    files = get_instance_filenames(data_source, split, strict=True)
    if max_shapes is not None and 0 < max_shapes < len(files):
        idx = np.linspace(0, len(files) - 1, max_shapes).round().astype(int)
        files = [files[i] for i in sorted(set(idx.tolist()))]
    rng = np.random.default_rng(seed)

    # assemble a fixed-size balanced sample stack for the vmapped solver
    stack = []
    for f in files:
        full = os.path.join(data_source, ws.sdf_samples_subdir, f)
        stack.append(unpack_sdf_samples(full, config.geom_dimension, num_samples, rng))
    n_min = min(s.shape[0] for s in stack)
    batch = np.stack([s[:n_min] for s in stack])

    latents, losses = reconstruct_batch(config, params, batch, seed=seed, rcfg=rcfg)
    logger.info("reconstructed %d shapes, mean loss %.5f", len(files), losses.mean())

    out = {}
    jobs = []
    for f, lat, loss in zip(files, latents, losses):
        rel = os.path.splitext(f)[0]
        dataset, class_name, instance = pathlib.Path(rel).parts[-3:]
        code_path = ws.get_reconstructed_code_filename(
            experiment_directory, epoch, dataset, class_name, instance)
        os.makedirs(os.path.dirname(code_path), exist_ok=True)
        np.savez(code_path, latent=lat, loss=loss)
        out[rel] = lat
        if write_meshes:
            mesh_path = ws.get_reconstructed_mesh_filename(
                experiment_directory, epoch, dataset, class_name, instance)
            if skip and os.path.isfile(mesh_path):
                continue
            os.makedirs(os.path.dirname(mesh_path), exist_ok=True)
            jobs.append((lat, mesh_path))
    if jobs:
        done = {"n": 0}

        def progress(fname):
            done["n"] += 1
            logger.info("wrote %s (%d/%d)", fname, done["n"], len(jobs))

        create_meshes_pipelined(config, params, jobs, N=mesh_resolution,
                                sparse=sparse, on_done=progress)
    return out


def load_reconstruction_split(specs: dict) -> dict:
    path = specs.get("ReconstructionSplit") or specs.get("TestSplit")
    if not path or not os.path.isfile(path):
        raise FileNotFoundError(f"no reconstruction/test split file at {path!r}")
    with open(path) as f:
        return json.load(f)
