"""Multi-host training glue (SURVEY.md §2 parallelism inventory:
"Per-host sharded file lists + prefetch to device;
jax.make_array_from_process_local_data for multi-host global batches").

One process per host runs the same script; after
``initialize_distributed()`` each host:
  * loads only its row-shard of the dataset (``host_scene_range``)
  * assembles its local slice of the global batch
  * builds the global sharded array via
    ``jax.make_array_from_process_local_data``
Decoder params/opt state stay replicated; the latent table and batch
are sharded over the ``data`` axis exactly as in single-host mode
(mesh.py), so the same jitted ``train_epoch``/``train_step`` executes.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def host_scene_range(num_scenes: int, process_index: int | None = None,
                     process_count: int | None = None) -> tuple[int, int]:
    """Contiguous scene rows owned by this host (balanced split)."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    base = num_scenes // pc
    rem = num_scenes % pc
    start = pi * base + min(pi, rem)
    return start, start + base + (1 if pi < rem else 0)


def global_batch_from_local(mesh: Mesh, local_batch: np.ndarray,
                            axis: str = "data"):
    """Assemble the global (B_global, ...) array from this host's
    (B_local, ...) slice; B_global = Σ hosts' B_local."""
    sharding = NamedSharding(mesh, P(axis, *([None] * (local_batch.ndim - 1))))
    return jax.make_array_from_process_local_data(sharding, local_batch)


def replicate_from_host0(mesh: Mesh, value):
    """Place a host-identical pytree fully replicated on the global mesh.

    All hosts must pass the same value (e.g. params built from the same
    seed, or loaded from the same checkpoint file).
    """
    rep = NamedSharding(mesh, P())

    def put(x):
        return jax.make_array_from_callback(
            np.shape(x), rep, lambda idx: np.asarray(x)[idx])

    return jax.tree.map(put, value)


def shard_latents_multihost(mesh: Mesh, num_scenes: int, latent_size: int,
                            init_fn, axis: str = "data"):
    """Build the row-sharded global latent table where each host only
    materializes its own rows (init_fn(row_slice) -> local rows)."""
    sharding = NamedSharding(mesh, P(axis, None))

    def cb(index):
        rows = init_fn(index[0])
        return np.asarray(rows, dtype=np.float32)

    return jax.make_array_from_callback((num_scenes, latent_size), sharding, cb)
