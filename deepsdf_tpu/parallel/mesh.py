"""Device-mesh construction and sharding specs.

The reference has NO distributed machinery beyond a single-process
``torch.nn.DataParallel`` wrap (ref: train_deep_sdf.py:352-353,
SURVEY.md §2 parallelism inventory). This module is its TPU-native
replacement, first-class: mesh construction over a slice, multi-host
init, and the sharding layout for auto-decoder training:

  * decoder params + optimizer moments: replicated (they're ≤ a few MB)
  * point batch / scene batch: sharded over the ``data`` axis (DP);
    the gradient all-reduce is inserted by XLA's SPMD partitioner and
    rides ICI, overlapped with the backward pass
  * latent table (+ its Adam moments): sharded by shape row over
    ``data`` — the per-batch gather/scatter-add becomes XLA
    collective-gather/reduce-scatter
  * dense-grid eval: grid points sharded over ``data``
    (see mesh/grid_eval.py — the framework's long-context analog)
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis_name: str = "data",
              devices=None) -> Mesh:
    """1-D data-parallel mesh over the slice (or an explicit device list)."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices).reshape(-1), (axis_name,))


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """Multi-host init (one process per host, same script all hosts).

    No-op when running single-process; mirrors
    ``jax.distributed.initialize`` defaults on TPU pods where the
    cluster is auto-detected.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address, num_processes, process_id)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh, axis: str = "data", rank: int = 1) -> NamedSharding:
    return NamedSharding(mesh, P(axis, *([None] * (rank - 1))))


def train_state_shardings(mesh: Mesh, state, axis: str = "data"):
    """Sharding pytree for TrainState: params/opt replicated, latent
    table + its moments row-sharded."""
    rep = replicated(mesh)
    lat_shard = data_sharded(mesh, axis, rank=2)

    def shard_like(x, is_latent):
        return lat_shard if is_latent else rep

    import jax.tree_util as jtu
    from ..train.step import TrainState

    return TrainState(
        params=jtu.tree_map(lambda _: rep, state.params),
        latents=lat_shard,
        opt_params=jtu.tree_map(lambda _: rep, state.opt_params),
        opt_latents=jtu.tree_map(
            lambda leaf: lat_shard if np.ndim(leaf) == 2 else rep, state.opt_latents),
    )


def shard_train_state(mesh: Mesh, state, axis: str = "data"):
    """Place a TrainState onto the mesh with the training layout.

    Pads nothing: jax handles uneven row shards of the latent table.
    """
    shardings = train_state_shardings(mesh, state, axis)
    return jax.device_put(state, shardings)
