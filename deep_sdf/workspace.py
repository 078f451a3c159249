"""deep_sdf.workspace facade (ref: deep_sdf/workspace.py)."""

from __future__ import annotations

import numpy as np

from deepsdf_tpu.workspace import (  # noqa: F401
    data_source_map_filename,
    evaluation_subdir,
    get_data_source_map_filename,
    get_evaluation_dir,
    get_latent_codes_dir,
    get_model_params_dir,
    get_normalization_params_filename,
    get_optimizer_params_dir,
    get_reconstructed_code_filename,
    get_reconstructed_mesh_filename,
    get_screenshots_dir,
    latent_codes_subdir,
    load_experiment_specifications,
    logs_filename,
    model_params_subdir,
    normalization_param_subdir,
    optimizer_params_subdir,
    print_model_specifications,
    reconstruction_codes_subdir,
    reconstruction_meshes_subdir,
    reconstructions_subdir,
    screenshots_subdir,
    sdf_samples_subdir,
    specifications_filename,
    surface_samples_subdir,
    training_meshes_subdir,
)


class LoadedDecoder:
    """Callable decoder handle (plays the role of the reference's torch
    module: ``decoder(inputs) -> (N,1)``; ref workspace.py:212-242)."""

    def __init__(self, config, params):
        self.config = config
        self.params = params
        self.geom_dimension = config.geom_dimension

    def __call__(self, inputs):
        import jax.numpy as jnp

        from deepsdf_tpu.networks.decoder import decoder_forward

        return decoder_forward(self.config, self.params, jnp.asarray(inputs))

    def eval(self):
        return self

    def train(self):
        return self


def load_trained_model(experiment_directory: str, checkpoint: str) -> LoadedDecoder:
    from deepsdf_tpu.workspace import load_trained_model as _load

    config, params = _load(experiment_directory, checkpoint)
    return LoadedDecoder(config, params)


def load_decoder(experiment_directory, experiment_specs, checkpoint,
                 data_parallel=True):
    """ref workspace.py:69-80 — returns (decoder, epoch)."""
    from deepsdf_tpu.networks.decoder import DecoderConfig
    from deepsdf_tpu.train.checkpoint import load_model_parameters

    config = DecoderConfig.from_specs(experiment_specs)
    params, epoch = load_model_parameters(experiment_directory, str(checkpoint), config)
    return LoadedDecoder(config, params), epoch


def load_latent_vectors(experiment_directory: str, checkpoint: str):
    """ref workspace.py:83-115 — returns the (num, L) latent array."""
    from deepsdf_tpu.train.checkpoint import load_latent_vectors as _load

    latents, _epoch = _load(experiment_directory, str(checkpoint))
    return np.asarray(latents)
