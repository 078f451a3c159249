"""Experiment-directory contract.

Byte-compatible at the JSON level with the reference layout
(ref: deep_sdf/workspace.py:8-22, README.md:55-71):

    <experiment>/
      specs.json
      ModelParameters/<epoch|latest>.npz      (ref uses .pth)
      OptimizerParameters/<epoch|latest>.npz
      LatentCodes/<epoch|latest>.npz
      Logs.npz                                (ref: Logs.pth)
      Reconstructions/<epoch>/{Meshes,Codes}/...
      Evaluation/

Checkpoints are flat .npz archives of numpy arrays (TPU framework is
torch-free on the hot path); ``deepsdf_tpu.networks.torch_import`` can
ingest reference ``.pth`` checkpoints for parity.
"""

from __future__ import annotations

import json
import os

screenshots_subdir = "Screenshots"
model_params_subdir = "ModelParameters"
optimizer_params_subdir = "OptimizerParameters"
latent_codes_subdir = "LatentCodes"
logs_filename = "Logs.npz"
reconstructions_subdir = "Reconstructions"
reconstruction_meshes_subdir = "Meshes"
reconstruction_codes_subdir = "Codes"
specifications_filename = "specs.json"
data_source_map_filename = ".datasources.json"
evaluation_subdir = "Evaluation"
sdf_samples_subdir = "SdfSamples"
surface_samples_subdir = "SurfaceSamples"
normalization_param_subdir = "NormalizationParameters"
training_meshes_subdir = "TrainingMeshes"


def load_experiment_specifications(experiment_directory: str) -> dict:
    """Load specs.json (ref: workspace.py:25-35)."""
    filename = os.path.join(experiment_directory, specifications_filename)
    if not os.path.isfile(filename):
        raise FileNotFoundError(
            f'experiment directory "{experiment_directory}" does not include '
            f'specifications file "{specifications_filename}"'
        )
    with open(filename) as f:
        return json.load(f)


def _subdir(experiment_dir: str, name: str, create: bool) -> str:
    d = os.path.join(experiment_dir, name)
    if create:
        os.makedirs(d, exist_ok=True)
    return d


def get_model_params_dir(experiment_dir: str, create_if_nonexistent: bool = False) -> str:
    return _subdir(experiment_dir, model_params_subdir, create_if_nonexistent)


def get_optimizer_params_dir(experiment_dir: str, create_if_nonexistent: bool = False) -> str:
    return _subdir(experiment_dir, optimizer_params_subdir, create_if_nonexistent)


def get_latent_codes_dir(experiment_dir: str, create_if_nonexistent: bool = False) -> str:
    return _subdir(experiment_dir, latent_codes_subdir, create_if_nonexistent)


def get_evaluation_dir(experiment_dir: str, checkpoint: str, create_if_nonexistent: bool = False) -> str:
    return _subdir(experiment_dir, os.path.join(evaluation_subdir, checkpoint), create_if_nonexistent)


def get_screenshots_dir(experiment_dir: str, create_if_nonexistent: bool = True) -> str:
    return _subdir(experiment_dir, screenshots_subdir, create_if_nonexistent)


def get_reconstructed_mesh_filename(experiment_dir, epoch, dataset, class_name, instance_name) -> str:
    """ref: workspace.py:122-134"""
    return os.path.join(
        experiment_dir, reconstructions_subdir, str(epoch),
        reconstruction_meshes_subdir, dataset, class_name, instance_name + ".ply",
    )


def get_reconstructed_code_filename(experiment_dir, epoch, dataset, class_name, instance_name) -> str:
    """ref: workspace.py:137-149 (we store codes as .npz, ref uses .pth)"""
    return os.path.join(
        experiment_dir, reconstructions_subdir, str(epoch),
        reconstruction_codes_subdir, dataset, class_name, instance_name + ".npz",
    )


def get_normalization_params_filename(data_dir, dataset_name, class_name, instance_name) -> str:
    return os.path.join(
        data_dir, normalization_param_subdir, dataset_name, class_name,
        instance_name + ".npz",
    )


def get_data_source_map_filename(data_dir: str) -> str:
    return os.path.join(data_dir, data_source_map_filename)


def load_trained_model(experiment_directory: str, checkpoint: str):
    """Load (decoder_config, params) from an experiment checkpoint.

    Accepts either this framework's .npz checkpoints or reference .pth
    ones (via torch import). ref: workspace.py:212-242.
    """
    from .networks.decoder import DecoderConfig
    from .train.checkpoint import load_model_parameters

    specs = load_experiment_specifications(experiment_directory)
    config = DecoderConfig.from_specs(specs)
    params, _epoch = load_model_parameters(experiment_directory, checkpoint, config)
    return config, params


def load_latent_vectors(experiment_directory: str, checkpoint: str):
    """Load the latent-code table as an (num_shapes, L) array.

    ref: workspace.py:83-115 (supports both Embedding-state and legacy
    stacked-tensor formats for .pth; .npz stores the table directly).
    """
    from .train.checkpoint import load_latent_vectors as _load

    return _load(experiment_directory, checkpoint)


def print_model_specifications(experiment_directory: str) -> None:
    specs = load_experiment_specifications(experiment_directory)
    print("Model Specifications:")
    for key in specs:
        print(f"  {key}: {specs[key]}")
    print()
