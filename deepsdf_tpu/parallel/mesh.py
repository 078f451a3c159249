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

import os

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


def _multi_host_env() -> bool:
    """Detect a multi-host launch environment (TPU pod slice, SLURM
    multi-task job, or an explicit coordinator address)."""
    env = os.environ
    if env.get("JAX_COORDINATOR_ADDRESS") or env.get("COORDINATOR_ADDRESS"):
        return True
    if "," in env.get("TPU_WORKER_HOSTNAMES", ""):
        return True
    for key in ("MEGASCALE_NUM_SLICES", "JAX_NUM_PROCESSES"):
        try:
            if int(env.get(key, "1")) > 1:
                return True
        except ValueError:
            pass
    # bare SLURM_NTASKS>1 is NOT sufficient: an srun of independent
    # CPU tasks would make the argless jax.distributed.initialize()
    # hang with no coordinator. Require the explicit opt-in.
    try:
        if (int(env.get("SLURM_NTASKS", "1")) > 1
                and env.get("DEEPSDF_TPU_SLURM_DISTRIBUTED", "") == "1"):
            return True
    except ValueError:
        pass
    return False


_distributed_initialized = False


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> bool:
    """Multi-host init (one process per host, same script all hosts).

    With explicit arguments, initializes that cluster. With none, it
    auto-detects pod/SLURM launch environments and calls the argless
    ``jax.distributed.initialize()`` (JAX's own cluster detection);
    single-host runs are a no-op. Returns whether jax.distributed is
    active. Called from ``train_deep_sdf.py`` before any jax use so the
    production path works unchanged on a pod (SURVEY.md §5.8).
    """
    global _distributed_initialized
    if _distributed_initialized:
        return True
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address, num_processes, process_id)
        _distributed_initialized = True
        return True
    if num_processes is None and coordinator_address is None and _multi_host_env():
        jax.distributed.initialize()
        _distributed_initialized = True
        return True
    return False


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh, axis: str = "data", rank: int = 1) -> NamedSharding:
    return NamedSharding(mesh, P(axis, *([None] * (rank - 1))))


def train_state_shardings(mesh: Mesh, state, axis: str = "data"):
    """Sharding pytree for TrainState: params/opt replicated, latent
    table + its moments row-sharded.

    When the scene count is not divisible by the mesh axis size the
    latent table (+ moments) is replicated instead — ``device_put``
    rejects uneven row shards, and replication stays correct because
    the SPMD partitioner all-reduces the scatter-add latent grads.
    """
    rep = replicated(mesh)
    axis_size = int(np.prod([mesh.shape[a] for a in (axis,)]))
    num_scenes = int(np.shape(state.latents)[0])
    lat_shard = (data_sharded(mesh, axis, rank=2)
                 if num_scenes % axis_size == 0 else rep)

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

    Multi-host: every process passes the same host-local state (same
    seed / same checkpoint file) and global arrays are built from
    per-shard callbacks.
    """
    shardings = train_state_shardings(mesh, state, axis)
    if jax.process_count() == 1:
        return jax.device_put(state, shardings)

    def put(x, s):
        return jax.make_array_from_callback(
            np.shape(x), s, lambda idx: np.asarray(x)[idx])

    return jax.tree.map(put, state, shardings)


def put_with_spec(mesh: Mesh, x, spec: P):
    """Place one host-identical array with an explicit PartitionSpec
    (works single- and multi-process)."""
    s = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(x, s)
    return jax.make_array_from_callback(
        np.shape(x), s, lambda idx: np.asarray(x)[idx])


def put_replicated(mesh: Mesh, value):
    """Fully replicate a host-identical pytree onto the mesh (works
    single- and multi-process)."""
    rep = replicated(mesh)
    if jax.process_count() == 1:
        return jax.device_put(value, rep)

    def put(x):
        return jax.make_array_from_callback(
            np.shape(x), rep, lambda idx: np.asarray(x)[idx])

    return jax.tree.map(put, value)
