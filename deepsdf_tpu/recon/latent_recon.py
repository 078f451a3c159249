"""Training-latent reconstruction + interpolation sweeps
(ref: create_ply_files_from_latent.py:10-109, deep_sdf/mesh.py:530-543).

Writes Reconstructions/<ckpt>/Meshes/latent_recon/all/<i>.ply for every
training latent and interpolation sweeps (11 steps between consecutive
index pairs) under .../latent_recon/interpolation/.
"""

from __future__ import annotations

import logging
import os
import pathlib

import numpy as np

from .. import workspace as ws
from ..mesh.extract import create_mesh, create_meshes_pipelined
from ..networks.decoder import DecoderConfig
from ..train.checkpoint import load_latent_vectors, load_model_parameters

logger = logging.getLogger(__name__)


def _load(experiment_directory: str, checkpoint: str):
    specs = ws.load_experiment_specifications(experiment_directory)
    config = DecoderConfig.from_specs(specs)
    params, _ = load_model_parameters(experiment_directory, checkpoint, config)
    latents, _ = load_latent_vectors(experiment_directory, checkpoint)
    return config, params, np.asarray(latents)


def create_mesh_from_latent(experiment_directory: str, epoch, index: int, **kwargs):
    """Reconstruct one training latent to a PLY (ref: mesh.py:530-543)."""
    config, params, latents = _load(experiment_directory, str(epoch))
    fname = pathlib.Path(ws.get_reconstructed_mesh_filename(
        experiment_directory, epoch, "latent_recon", "all", f"{index}"))
    os.makedirs(fname.parent, exist_ok=True)
    create_mesh(config, params, latents[index], str(fname), **kwargs)
    return fname


def reconstruct_training_latents(experiment_directory: str, checkpoint: str,
                                 N: int = 256, max_batch: int = 32 ** 3,
                                 interpolation_indices=(1, 2, 3, 4, 5, 6, 7, 8),
                                 interpolation_steps: int = 11,
                                 skip_existing: bool = True,
                                 sparse: bool = False) -> list[str]:
    """Full driver parity with create_ply_files_from_latent.main."""
    config, params, latents = _load(experiment_directory, checkpoint)

    # assemble the sweep, then extract with the pipelined helper (next
    # grid eval dispatches while the previous mesh marches on host)
    jobs = []
    for i, latent in enumerate(latents):
        fname = pathlib.Path(ws.get_reconstructed_mesh_filename(
            experiment_directory, checkpoint, "latent_recon", "all", f"{i}"))
        os.makedirs(fname.parent, exist_ok=True)
        if skip_existing and fname.is_file():
            logger.info("Skipping %s", fname)
            continue
        jobs.append((latent, str(fname)))

    # interpolation sweeps between consecutive latent pairs (ref :59-97)
    idx = [i for i in interpolation_indices if i < len(latents)]
    for a, b in zip(idx[:-1], idx[1:]):
        for i in range(interpolation_steps):
            latent_in = latents[a] + (latents[b] - latents[a]) * i / (interpolation_steps - 1)
            fname = pathlib.Path(ws.get_reconstructed_mesh_filename(
                experiment_directory, checkpoint, "latent_recon", "interpolation",
                f"interpolate_{a}_{b}_{i}"))
            os.makedirs(fname.parent, exist_ok=True)
            if skip_existing and fname.is_file():
                continue
            jobs.append((latent_in, str(fname)))

    done = {"n": 0}

    def progress(fname):
        done["n"] += 1
        logger.info("Reconstructed %s (%d/%d)", fname, done["n"], len(jobs))

    return create_meshes_pipelined(config, params, jobs, N=N,
                                   max_batch=max_batch, sparse=sparse,
                                   on_done=progress)
