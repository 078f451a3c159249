"""Microstructure mesh generation (forward path).

Parity surface of ref deep_sdf/mesh.py:177-342
(``create_mesh_microstructure``): tiled decoder evaluation with a
B-spline latent field over the macro domain, per-face border caps,
unit-cube trim, level-set extraction, verts mapped to [0,1] scale.

TPU-native: grid coordinates, tiling transform, latent-field spline
evaluation, decoder and caps all run inside one jitted device program;
only the final level-set extraction runs on host.
"""

from __future__ import annotations

import logging
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..networks.decoder import DecoderConfig, decoder_forward
from ..ops.tiling import (
    DEFAULT_CAP_BORDER, apply_border_caps, apply_unit_cube_trim, tile_transform3,
)
from .extract import convert_sdf_samples_to_ply
from .marching import marching_tetrahedra

logger = logging.getLogger(__name__)


def _normalize_tiling(tiling):
    if isinstance(tiling, (list, tuple, np.ndarray)):
        if len(tiling) != 3:
            raise ValueError("Tiling must be a list of 3 integers")
        return tuple(int(t) for t in tiling)
    if isinstance(tiling, (int, np.integer)):
        return (int(tiling),) * 3
    raise ValueError("Tiling must be a list or an integer")


def _normalize_N(N):
    if isinstance(N, (list, tuple, np.ndarray)):
        if len(N) != 3:
            raise ValueError("Number of grid points must be a list of 3 integers")
        return tuple(int(n) for n in N)
    if isinstance(N, (int, np.integer)):
        return (int(N),) * 3
    raise ValueError("Number of grid points must be a list or an integer")


def microstructure_grid(N):
    """Grid with 2 ghost layers: voxel_size 2/(N-3) per dim, origin
    -1-voxel_size (ref mesh.py:192-237). Returns (coords (M,3),
    voxel_size (3,), origin (3,)); N already includes the +2."""
    voxel_size = tuple(2.0 / (n - 1 - 2) for n in N)
    origin = tuple(-1.0 - v for v in voxel_size)
    idx = jnp.arange(int(np.prod(N)))
    iz = idx % N[2]
    iy = (idx // N[2]) % N[1]
    ix = (idx // N[2]) // N[1] % N[0]
    coords = jnp.stack([
        ix * voxel_size[0] + origin[0],
        iy * voxel_size[1] + origin[1],
        iz * voxel_size[2] + origin[2],
    ], axis=1)
    return coords, voxel_size, origin


@partial(jax.jit, static_argnames=("config", "tiling", "cap_items", "chunk"))
def microstructure_sdf(config: DecoderConfig, params, control_points: jax.Array,
                       basis_matrix: jax.Array, samples_orig: jax.Array,
                       tiling, cap_items, chunk: int = 32768) -> jax.Array:
    """Capped microstructure SDF at macro points ``samples_orig``.

    ``basis_matrix``: (M, C) latent-spline basis at samples_orig,
    pre-zeroed outside [-1,1]³ (matches ref mesh.py:257-259 where the
    latent field is 0 outside the domain).
    latent field = basis @ control_points; decoder input =
    [latent ‖ tile_transform(samples_orig)].
    """
    cap_dict = {loc: {"cap": c, "measure": m} for (loc, c, m) in cap_items}
    tiled = tile_transform3(samples_orig, tiling)

    M = samples_orig.shape[0]
    pad = (-M) % chunk
    lat = basis_matrix @ control_points
    lat_p = jnp.pad(lat, ((0, pad), (0, 0)))
    tiled_p = jnp.pad(tiled, ((0, pad), (0, 0)))
    n_chunks = lat_p.shape[0] // chunk

    def body(args):
        lat_c, xyz_c = args
        return decoder_forward(config, params,
                               jnp.concatenate([lat_c, xyz_c], axis=1))[:, 0]

    sdf = jax.lax.map(body, (
        lat_p.reshape(n_chunks, chunk, -1), tiled_p.reshape(n_chunks, chunk, -1),
    )).reshape(-1)[:M]

    sdf = apply_border_caps(sdf, samples_orig, cap_dict)
    sdf = apply_unit_cube_trim(sdf, samples_orig)
    return sdf


def domain_basis_matrix(spline, samples_orig: np.ndarray) -> np.ndarray:
    """Latent-spline basis at macro points, zeroed outside [-1,1]³
    (ref mesh.py:257-259: latent field is 0 beyond the domain)."""
    inside = np.all((samples_orig >= -1) & (samples_orig <= 1), axis=1)
    B = np.zeros((samples_orig.shape[0], spline.control_points.shape[0]), np.float32)
    if inside.any():
        B[inside] = np.asarray(spline.basis_matrix(samples_orig[inside]))
    return B


def cap_items_tuple(cap_border_dict) -> tuple:
    return tuple(sorted(
        (loc, int(d["cap"]), float(d["measure"])) for loc, d in cap_border_dict.items()
    ))


def create_mesh_microstructure(tiling, config: DecoderConfig, params,
                               latent_vec_interpolation, filename: str | None = None,
                               N=256, max_batch: int = 32 ** 3, offset=None, scale=None,
                               cap_border_dict=None, save_ply_file: bool = False):
    """Forward microstructure mesh (ref mesh.py:177-342, marching path).

    Returns (verts, faces) with verts in [0,1]-scaled coordinates
    (phys+1)/2, unless ``save_ply_file`` — then writes the PLY like the
    reference and returns None.
    """
    cap_border_dict = cap_border_dict or DEFAULT_CAP_BORDER
    tiling = _normalize_tiling(tiling)
    N = tuple(n + 2 for n in _normalize_N(N))  # ghost layers (ref :192-198)

    start = time.time()
    coords, voxel_size, origin = microstructure_grid(N)
    samples_orig = np.asarray(coords)
    spline = latent_vec_interpolation
    basis = jnp.asarray(domain_basis_matrix(spline, samples_orig))
    cpts = jnp.asarray(spline.control_points, dtype=jnp.float32)

    sdf = microstructure_sdf(config, params, cpts, basis, coords, tiling,
                             cap_items_tuple(cap_border_dict), chunk=max_batch)
    sdf_grid = np.asarray(sdf, dtype=np.float64).reshape(N)
    logger.debug("sampling takes: %f", time.time() - start)

    if save_ply_file:
        convert_sdf_samples_to_ply(sdf_grid, origin, list(voxel_size),
                                   str(filename) + ".ply", offset, scale)
        return None

    verts, faces, _, _ = marching_tetrahedra(sdf_grid, 0.0, voxel_size)
    # index-space → physical → [0,1] (ref :333-341: (verts − voxel_size)/2)
    verts = (verts + np.asarray(origin) + 1.0) / 2.0
    return verts, faces
