"""Mesh extraction: dense SDF eval → level-set mesh → PLY.

Parity surface of ref deep_sdf/mesh.py:26-155 (``create_mesh``,
``convert_sdf_samples_to_ply``) with the TPU grid evaluator and the
vectorized extractor/PLY writer.
"""

from __future__ import annotations

import logging
import os
import pathlib
import time

import numpy as np

import jax.numpy as jnp

from ..networks.decoder import DecoderConfig
from .grid_eval import eval_sdf_grid, eval_sdf_grid_sparse, grid_coords
from .marching import marching_cubes
from .ply import write_ply

logger = logging.getLogger(__name__)


def _resolve_fused(config: DecoderConfig, fused) -> bool:
    """``"auto"`` → Pallas kernel only on TPU-like backends (the kernel
    uses pltpu primitives) for supported architectures."""
    if fused != "auto":
        return bool(fused)
    import jax

    from ..ops.fused_mlp import supports_fused
    return jax.default_backend() in ("tpu", "axon") and supports_fused(config)


def _use_sparse(sparse: bool, N: int, coarse: int | None) -> bool:
    if not sparse:
        return False
    if coarse is None:
        coarse = max(4, N // 64)  # eval_sdf_grid_sparse's auto choice
    if N % coarse:
        logger.warning("sparse grid eval needs N %% coarse == 0 "
                       "(N=%d, coarse=%d); using the dense pass", N, coarse)
        return False
    return True


def create_mesh(config: DecoderConfig, params, latent_vec, filename: str | None,
                N: int = 256, max_batch: int = 32 ** 3, offset=None, scale=None,
                return_mesh: bool = False, sparse: bool = False,
                fused: bool | str = "auto", coarse: int | None = None):
    """Reconstruct a shape from one latent code (ref: mesh.py:26-85).

    Grid: N³ over [-1,1]³, voxel_size 2/(N-1), origin (-1,-1,-1).
    Writes ``filename`` (.ply appended if missing) unless None.
    ``sparse`` decodes only the surface band in ``coarse``³ blocks
    (see ``eval_sdf_grid_sparse``). ``fused="auto"`` uses the Pallas
    kernel on TPU for supported architectures (measured ~12× faster
    grid eval; bf16 matmuls shift SDF values ≤ ~1e-4, far below a
    voxel) and the XLA f32 path elsewhere; pass True/False to force.
    """
    fused = _resolve_fused(config, fused)
    start = time.time()
    voxel_origin = [-1.0, -1.0, -1.0]
    voxel_size = 2.0 / (N - 1)

    if _use_sparse(sparse, N, coarse):
        sdf = eval_sdf_grid_sparse(config, params, latent_vec, N, coarse=coarse,
                                   chunk=max_batch, fused=fused)
    else:
        coords = grid_coords(N, voxel_origin, voxel_size)
        sdf = eval_sdf_grid(config, params, jnp.asarray(latent_vec).reshape(-1),
                            coords, chunk=max_batch, fused=fused)
    sdf_grid = np.asarray(sdf, dtype=np.float64).reshape(N, N, N)
    logger.debug("sampling takes: %f", time.time() - start)

    return convert_sdf_samples_to_ply(
        sdf_grid, voxel_origin, voxel_size, filename, offset, scale,
        return_mesh=return_mesh,
    )


def create_meshes_pipelined(config: DecoderConfig, params, jobs,
                            N: int = 256, max_batch: int = 32 ** 3,
                            offset=None, scale=None, sparse: bool = False,
                            fused: bool | str = "auto",
                            coarse: int | None = None,
                            on_done=None) -> list[str]:
    """Sweep helper: extract one mesh per (latent, filename) job.

    Identical outputs to per-job ``create_mesh`` calls, but the NEXT
    job's grid evaluation runs (on a single worker thread, where the
    dense path is an async JAX dispatch and the sparse path's internal
    host syncs also overlap) WHILE the current job's host-side
    marching/PLY write runs on the main thread — on a remote-tunnel
    TPU this hides device time and device→host transfer behind host
    extraction, the two biggest costs of a reconstruction sweep.
    ``on_done(filename)`` fires after each write (progress logging).
    """
    from concurrent.futures import ThreadPoolExecutor

    fused = _resolve_fused(config, fused)
    voxel_origin = [-1.0, -1.0, -1.0]
    voxel_size = 2.0 / (N - 1)
    use_sparse = _use_sparse(sparse, N, coarse)
    coords = None if use_sparse else grid_coords(N, voxel_origin, voxel_size)

    def evaluate(latent):
        if use_sparse:
            return eval_sdf_grid_sparse(config, params, latent, N, coarse=coarse,
                                        chunk=max_batch, fused=fused)
        return eval_sdf_grid(config, params, jnp.asarray(latent).reshape(-1),
                             coords, chunk=max_batch, fused=fused)

    def finish(sdf, filename):
        grid = np.asarray(sdf, dtype=np.float64).reshape(N, N, N)
        convert_sdf_samples_to_ply(grid, voxel_origin, voxel_size,
                                   filename, offset, scale)
        if on_done is not None:
            on_done(filename)

    written = [str(f) for _, f in jobs]
    with ThreadPoolExecutor(max_workers=1) as pool:
        prev = None
        for latent, filename in jobs:
            fut = pool.submit(evaluate, latent)
            if prev is not None:
                finish(*prev)
            prev = (fut.result(), filename)
        if prev is not None:
            finish(*prev)
    return written


def convert_sdf_samples_to_ply(sdf_grid: np.ndarray, voxel_grid_origin, voxel_size,
                               ply_filename_out: str | None, offset=None, scale=None,
                               level: float = 0.0, return_mesh: bool = False):
    """SDF grid → level-0 mesh → PLY (ref: mesh.py:88-155)."""
    start_time = time.time()
    if not isinstance(voxel_size, (list, tuple, np.ndarray)):
        voxel_size = [voxel_size] * 3
    verts, faces, normals, values = marching_cubes(
        np.asarray(sdf_grid), level=level, spacing=voxel_size)

    mesh_points = verts + np.asarray(voxel_grid_origin)[None, :]
    if scale is not None:
        mesh_points = mesh_points / scale
    if offset is not None:
        mesh_points = mesh_points - offset

    if ply_filename_out is not None:
        if not str(ply_filename_out).endswith(".ply"):
            ply_filename_out = str(ply_filename_out) + ".ply"
        os.makedirs(pathlib.Path(ply_filename_out).parent, exist_ok=True)
        write_ply(ply_filename_out, mesh_points, faces)
        logger.debug("converting to ply and writing took %f s", time.time() - start_time)
    if return_mesh or ply_filename_out is None:
        return mesh_points, faces
    return None
