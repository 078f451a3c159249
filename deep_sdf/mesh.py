"""deep_sdf.mesh facade (ref: deep_sdf/mesh.py)."""

from __future__ import annotations

import numpy as np

from deepsdf_tpu.mesh.extract import convert_sdf_samples_to_ply  # noqa: F401
from deepsdf_tpu.ops.tiling import DEFAULT_CAP_BORDER as CapBorderDict  # noqa: F401
from deepsdf_tpu.ops.tiling import location_lookup  # noqa: F401


def _split_decoder(decoder):
    return decoder.config, decoder.params


def create_mesh(decoder, latent_vec, filename, N=256, max_batch=32 ** 3,
                offset=None, scale=None, device=None, **kw):
    """ref mesh.py:26-85 (device arg accepted and ignored — placement is
    jax's job)."""
    from deepsdf_tpu.mesh.extract import create_mesh as _create

    config, params = _split_decoder(decoder)
    return _create(config, params, np.asarray(latent_vec).reshape(-1), filename,
                   N=N, max_batch=max_batch, offset=offset, scale=scale, **kw)


def create_mesh_microstructure(tiling, decoder, latent_vec_interpolation, filename,
                               N=256, max_batch=32 ** 3, offset=None, scale=None,
                               cap_border_dict=None, save_ply_file=False,
                               device=None, **kw):
    """ref mesh.py:177-342."""
    from deepsdf_tpu.mesh.microstructure import create_mesh_microstructure as _cm

    config, params = _split_decoder(decoder)
    return _cm(tiling, config, params, latent_vec_interpolation, filename,
               N=N, max_batch=max_batch, offset=offset, scale=scale,
               cap_border_dict=cap_border_dict, save_ply_file=save_ply_file)


def create_mesh_microstructure_diff(tiling, decoder, latent_vec_interpolation,
                                    N=256, max_batch=32 ** 3, offset=None,
                                    scale=None, cap_border_dict=None, device=None,
                                    output_tetmesh=False, compute_derivatives=False):
    """ref mesh.py:346-528."""
    from deepsdf_tpu.mesh.diff_mesh import create_mesh_microstructure_diff as _cmd

    config, params = _split_decoder(decoder)
    return _cmd(tiling, config, params, latent_vec_interpolation, N=N,
                max_batch=max_batch, cap_border_dict=cap_border_dict,
                compute_derivatives=compute_derivatives)


def create_mesh_from_latent(experiment_directory, epoch, index, **kwargs):
    """ref mesh.py:530-543."""
    from deepsdf_tpu.recon.latent_recon import create_mesh_from_latent as _cmfl

    return _cmfl(experiment_directory, epoch, index, **kwargs)
