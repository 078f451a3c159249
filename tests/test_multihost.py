"""Multi-host glue tests (single-process semantics on the virtual mesh)."""

import numpy as np

import jax
import jax.numpy as jnp

from deepsdf_tpu.parallel.mesh import make_mesh
from deepsdf_tpu.parallel.multihost import (
    global_batch_from_local, host_scene_range, replicate_from_host0,
    shard_latents_multihost,
)


def test_host_scene_range_partition():
    ranges = [host_scene_range(403, pi, 4) for pi in range(4)]
    assert ranges[0][0] == 0 and ranges[-1][1] == 403
    sizes = [b - a for a, b in ranges]
    assert sum(sizes) == 403 and max(sizes) - min(sizes) <= 1
    for (a1, b1), (a2, b2) in zip(ranges[:-1], ranges[1:]):
        assert b1 == a2


def test_global_batch_assembly():
    mesh = make_mesh()
    local = np.arange(8 * 4 * 2, dtype=np.float32).reshape(8, 4, 2)
    arr = global_batch_from_local(mesh, local)
    assert arr.shape == (8, 4, 2)
    np.testing.assert_array_equal(np.asarray(arr), local)
    assert len(arr.sharding.device_set) == 8


def test_replicate_and_sharded_latents():
    mesh = make_mesh()
    tree = {"w": np.ones((4, 4), np.float32), "b": np.zeros(3, np.float32)}
    rep = replicate_from_host0(mesh, tree)
    np.testing.assert_array_equal(np.asarray(rep["w"]), tree["w"])

    def init_rows(row_slice):
        idx = np.arange(row_slice.start or 0, row_slice.stop)
        return np.stack([idx, idx * 10], axis=1).astype(np.float32)

    table = shard_latents_multihost(mesh, 16, 2, init_rows)
    assert table.shape == (16, 2)
    np.testing.assert_array_equal(
        np.asarray(table), np.stack([np.arange(16), np.arange(16) * 10], 1))
    assert len(table.sharding.device_set) == 8
