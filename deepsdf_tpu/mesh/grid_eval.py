"""Dense-grid SDF evaluation — the framework's "long-context" path.

The reference slides a max_batch=32³ window over N³ query points in a
host loop with per-chunk device transfers (ref: deep_sdf/mesh.py:59-70,
262-271). TPU-native redesign: the whole grid is evaluated by ONE
jitted program that builds coordinates on device (no host grid
materialization), runs the decoder over chunk tiles via ``lax.map``
(bounded memory), and can shard the flattened grid across a device
mesh axis for multi-chip extraction (SURVEY.md §5.7).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..networks.decoder import DecoderConfig, decoder_forward


def grid_coords(N, voxel_origin=(-1.0, -1.0, -1.0), voxel_size=None):
    """Flattened (N³, 3) grid coordinates, same index order as the
    reference (x-major: index = (ix*Ny + iy)*Nz + iz, ref mesh.py:40-53)."""
    if isinstance(N, int):
        N = (N, N, N)
    if voxel_size is None:
        voxel_size = tuple(2.0 / (n - 1) for n in N)
    elif np.isscalar(voxel_size):
        voxel_size = (voxel_size,) * 3
    idx = jnp.arange(int(np.prod(N)))
    iz = idx % N[2]
    iy = (idx // N[2]) % N[1]
    ix = (idx // N[2]) // N[1] % N[0]
    coords = jnp.stack([
        ix * voxel_size[0] + voxel_origin[0],
        iy * voxel_size[1] + voxel_origin[1],
        iz * voxel_size[2] + voxel_origin[2],
    ], axis=1)
    return coords


@partial(jax.jit, static_argnames=("config", "chunk", "fused"))
def eval_sdf_grid(config: DecoderConfig, params, latent_vec: jax.Array,
                  coords: jax.Array, chunk: int = 32768,
                  fused: bool = False) -> jax.Array:
    """Evaluate decoder([latent ‖ xyz]) over (M,3) coords → (M,) SDF.

    ``latent_vec``: (L,) broadcast over all points, or (M, L) per-point
    latent field (microstructure path). ``fused`` uses the Pallas
    fused MLP kernel (TPU; supported architectures) inside each chunk.
    """
    M = coords.shape[0]
    pad = (-M) % chunk
    coords_p = jnp.pad(coords, ((0, pad), (0, 0)))
    if latent_vec.ndim == 1:
        lat_p = jnp.broadcast_to(latent_vec[None, :], (coords_p.shape[0], latent_vec.shape[0]))
    else:
        lat_p = jnp.pad(latent_vec, ((0, pad), (0, 0)))
    n_chunks = coords_p.shape[0] // chunk

    if fused:
        from ..ops.fused_mlp import fused_decoder_forward

        def body(args):
            lat_c, xyz_c = args
            inputs = jnp.concatenate([lat_c, xyz_c], axis=1)
            return fused_decoder_forward(config, params, inputs)[:, 0]
    else:
        def body(args):
            lat_c, xyz_c = args
            inputs = jnp.concatenate([lat_c, xyz_c], axis=1)
            return decoder_forward(config, params, inputs)[:, 0]

    out = jax.lax.map(body, (
        lat_p.reshape(n_chunks, chunk, -1),
        coords_p.reshape(n_chunks, chunk, -1),
    ))
    return out.reshape(-1)[:M]


def eval_sdf_grid_sharded(config, params, latent_vec, coords, mesh,
                          axis: str = "data", chunk: int = 32768):
    """Shard the flattened grid over ``mesh[axis]``; params/latent are
    replicated, the SDF slab is gathered back — collectives ride ICI.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    n = mesh.shape[axis]
    M = coords.shape[0]
    pad = (-M) % (n * chunk)
    coords = jnp.pad(coords, ((0, pad), (0, 0)))
    sharded = jax.device_put(coords, NamedSharding(mesh, P(axis, None)))
    out = jax.jit(
        lambda p, l, c: eval_sdf_grid(config, p, l, c, chunk),
        in_shardings=(NamedSharding(mesh, P()), NamedSharding(mesh, P()),
                      NamedSharding(mesh, P(axis, None))),
        out_shardings=NamedSharding(mesh, P()),
        static_argnums=(),
    )(params, latent_vec, sharded)
    return out[:M]
