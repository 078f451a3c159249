"""SDF sample data pipeline.

Re-designed from ref deep_sdf/data.py:15-195 for TPU:

* **File format parity**: reads ``<data>/SdfSamples/<dataset>/<class>/<id>.npz``
  with either ``pos``/``neg`` (python sampler spelling,
  ref sdf_sampler.py:146) or ``pos.npy``/``neg.npy`` keys (C++
  preprocessing spelling, ref data.py:68-78); NaN rows dropped on the
  SDF column (ref data.py:61-63).
* **Balanced subsampling parity**: half positive / half negative with
  deficit rebalancing (ref data.py:83-91).
* **TPU-first execution**: instead of torch DataLoader worker processes
  feeding the device per step (ref train_deep_sdf.py:369-375), the
  whole dataset is staged once into padded device arrays and each
  training step draws its balanced subsample *on device* with
  ``jax.random`` — zero per-step host↔device traffic, fully inside the
  jitted train step. Sampling is with replacement (pools are ≫
  subsample in practice); ``unpack_sdf_samples`` provides the
  host-side without-replacement path for exact reference parity.
"""

from __future__ import annotations

import dataclasses
import logging
import os
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from .. import workspace as ws

logger = logging.getLogger(__name__)


def get_instance_filenames(data_source, split, strict: bool = False) -> list[str]:
    """Resolve split dict to npz-relative paths (ref: data.py:15-33).

    The reference only warns on missing files and keeps them in the
    list (crashing late); we fail fast by default-warn but expose
    ``strict`` to raise (SURVEY.md Appendix A recommendation).
    """
    npzfiles = []
    for dataset in split:
        for class_name in split[dataset]:
            for instance_name in split[dataset][class_name]:
                instance_filename = os.path.join(dataset, class_name, instance_name + ".npz")
                full = os.path.join(data_source, ws.sdf_samples_subdir, instance_filename)
                if not os.path.isfile(full):
                    if strict:
                        raise FileNotFoundError(f"Requested non-existent file '{instance_filename}'")
                    logger.warning("Requested non-existent file '%s'", instance_filename)
                npzfiles += [instance_filename]
    return npzfiles


def _load_pos_neg(filename: str, geom_dimension: int) -> tuple[np.ndarray, np.ndarray]:
    npz = np.load(filename)
    def get(which):
        key = which if which in npz else which + ".npy"
        arr = np.asarray(npz[key], dtype=np.float32)
        # NaN filter on the SDF column (ref: data.py:61-63)
        return arr[~np.isnan(arr[:, geom_dimension])]
    return get("pos"), get("neg")


def remove_nans(arr: np.ndarray, geom_dimension: int) -> np.ndarray:
    arr = np.asarray(arr)
    return arr[~np.isnan(arr[:, geom_dimension])].astype(np.float32)


def balanced_lengths(pos_len: int, neg_len: int, subsample: int) -> tuple[int, int]:
    """Deficit-rebalanced pos/neg draw counts (ref: data.py:83-91)."""
    half = subsample // 2
    if pos_len < half:
        neg_len = 2 * half - pos_len
    elif neg_len < half:
        pos_len = 2 * half - neg_len
    else:
        pos_len = neg_len = half
    return pos_len, neg_len


def draw_balanced(pos: np.ndarray, neg: np.ndarray, subsample: int,
                  rng: np.random.Generator, pad: bool = False) -> np.ndarray:
    """The balanced without-replacement draw (ref: data.py:83-110),
    shared by unpack_sdf_samples / SDFSamples / the streaming loader.

    With ``pad`` the result is topped up to exactly 2*(subsample//2)
    rows by with-replacement repeats when BOTH pools are too shallow —
    static shapes for jit (the reference would simply crash collating
    such a scene)."""
    n_pos, n_neg = balanced_lengths(len(pos), len(neg), subsample)
    take_pos = rng.permutation(len(pos))[:n_pos]
    take_neg = rng.permutation(len(neg))[:n_neg]
    out = np.concatenate([pos[take_pos], neg[take_neg]], axis=0)
    target = 2 * (subsample // 2)
    if pad and len(out) < target:
        extra = rng.integers(0, len(out), target - len(out))
        out = np.concatenate([out, out[extra]], axis=0)
    return out


def unpack_sdf_samples(filename: str, geom_dimension: int, subsample: int | None = None,
                       rng: np.random.Generator | None = None) -> np.ndarray:
    """Host-side balanced subsample of one shape (ref: data.py:74-110),
    without replacement, deterministic given ``rng``."""
    pos, neg = _load_pos_neg(filename, geom_dimension)
    if subsample is None:
        return np.concatenate([pos, neg], axis=0)
    return draw_balanced(pos, neg, subsample, rng or np.random.default_rng())


class SDFSamples:
    """Random-access host dataset (ref: data.py:142-195)."""

    def __init__(self, data_source, split, subsample, geom_dimension,
                 load_ram=False, strict=False, seed: int = 0):
        self.subsample = subsample
        self.geom_dimension = geom_dimension
        self.data_source = data_source
        self.npyfiles = get_instance_filenames(data_source, split, strict=strict)
        self.rng = np.random.default_rng(seed)
        self.load_ram = load_ram
        if load_ram:
            self.loaded_data = []
            for f in self.npyfiles:
                filename = os.path.join(data_source, ws.sdf_samples_subdir, f)
                self.loaded_data.append(_load_pos_neg(filename, geom_dimension))

    def __len__(self):
        return len(self.npyfiles)

    def __getitem__(self, idx):
        if self.load_ram:
            pos, neg = self.loaded_data[idx]
            return draw_balanced(pos, neg, self.subsample, self.rng), idx
        filename = os.path.join(self.data_source, ws.sdf_samples_subdir, self.npyfiles[idx])
        return unpack_sdf_samples(filename, self.geom_dimension, self.subsample, self.rng), idx


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DevicePools:
    """Padded per-shape pos/neg sample pools staged on device."""

    pos: jax.Array        # (S, max_pos, geom+1)
    neg: jax.Array        # (S, max_neg, geom+1)
    pos_counts: jax.Array  # (S,) int32
    neg_counts: jax.Array  # (S,) int32

    def tree_flatten(self):
        return (self.pos, self.neg, self.pos_counts, self.neg_counts), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def num_scenes(self) -> int:
        return self.pos.shape[0]


def load_device_pools(data_source, split, geom_dimension, strict=True,
                      pad_multiple: int = 1024, shuffle_seed: int = 0,
                      window_extra: int = 0) -> DevicePools:
    """Stage every shape's pos/neg pools into padded device arrays.

    Pools are pre-shuffled once (so contiguous windows are random
    subsets — the reference's load_ram trick, ref data.py:174-178).
    Padding rows repeat row 0 of the respective pool (they are never
    selected: draws are bounded by the true counts).

    ``window_extra``: extra padded width beyond the largest pool. The
    window sampler slices fixed 2*(subsample//2)-row windows whose
    start must reach count−len for every row to be drawable; pass the
    training SamplesPerScene here so the slice never hits the array
    end (see sample_scenes_window)."""
    files = get_instance_filenames(data_source, split, strict=strict)
    shuffle_rng = np.random.default_rng(shuffle_seed)
    pos_list, neg_list = [], []
    for f in files:
        pos, neg = _load_pos_neg(os.path.join(data_source, ws.sdf_samples_subdir, f),
                                 geom_dimension)
        if len(pos) == 0 or len(neg) == 0:
            logger.warning("shape %s has empty pos (%d) or neg (%d) pool", f, len(pos), len(neg))
        pos_list.append(shuffle_rng.permutation(pos))
        neg_list.append(shuffle_rng.permutation(neg))

    def pad_stack(arrs):
        width = geom_dimension + 1
        max_n = max(max((len(a) for a in arrs), default=1), 1) + window_extra
        max_n = -(-max_n // pad_multiple) * pad_multiple
        out = np.zeros((len(arrs), max_n, width), dtype=np.float32)
        counts = np.zeros(len(arrs), dtype=np.int32)
        for i, a in enumerate(arrs):
            if len(a):
                out[i, :len(a)] = a
                out[i, len(a):] = a[0]
            counts[i] = len(a)
        return out, counts

    pos_arr, pos_counts = pad_stack(pos_list)
    neg_arr, neg_counts = pad_stack(neg_list)
    return DevicePools(
        pos=jnp.asarray(pos_arr), neg=jnp.asarray(neg_arr),
        pos_counts=jnp.asarray(pos_counts), neg_counts=jnp.asarray(neg_counts),
    )


@partial(jax.jit, static_argnames=("subsample",))
def sample_scenes_window(pools: DevicePools, scene_indices: jax.Array,
                         key: jax.Array, subsample: int) -> jax.Array:
    """Contiguous-window balanced batch draw — the fast device path.

    The reference's own load_ram mode draws a random CONTIGUOUS window
    from each (pre-shuffled) pool (ref data.py:113-139); on TPU this
    turns 2·subsample random row-gathers per scene into two dynamic
    slices — ~10× cheaper than per-row gathers. Pools must come from
    ``load_device_pools`` (pre-shuffled). Deficit rebalancing matches
    ``sample_scenes``. Returns (B, 2*(subsample//2), geom+1).
    """
    half = subsample // 2
    target = 2 * half
    width = pools.pos.shape[-1]
    lim_pos = pools.pos.shape[1] - target
    lim_neg = pools.neg.shape[1] - target

    def one_scene(scene_idx, k):
        pos_count = pools.pos_counts[scene_idx]
        neg_count = pools.neg_counts[scene_idx]
        pos_len = jnp.where(
            pos_count < half, pos_count,
            jnp.where(neg_count < half, target - neg_count, half),
        )
        pos_len = jnp.clip(pos_len, target - jnp.maximum(neg_count, 1),
                           jnp.maximum(pos_count, 0))
        neg_len = target - pos_len
        k_pos, k_neg = jax.random.split(k)
        # start must satisfy BOTH start ≤ count−len (draw real rows
        # only) and start ≤ width−target (the fixed-size slice must fit:
        # jax.lax.dynamic_slice silently clamps out-of-range starts,
        # which would pile draws onto one window and make tail rows
        # unreachable — load_device_pools(window_extra=subsample) pads
        # enough that the second bound never binds in training)
        hi_pos = jnp.minimum(jnp.maximum(pos_count - pos_len, 0), lim_pos)
        hi_neg = jnp.minimum(jnp.maximum(neg_count - neg_len, 0), lim_neg)
        start_pos = jax.random.randint(k_pos, (), 0, hi_pos + 1)
        start_neg = jax.random.randint(k_neg, (), 0, hi_neg + 1)
        win_pos = jax.lax.dynamic_slice(
            pools.pos[scene_idx], (start_pos, 0), (target, width))
        win_neg = jax.lax.dynamic_slice(
            pools.neg[scene_idx], (start_neg, 0), (target, width))
        slots = jnp.arange(target)
        from_pos = slots < pos_len
        neg_idx = jnp.clip(slots - pos_len, 0, target - 1)
        return jnp.where(from_pos[:, None], win_pos, win_neg[neg_idx])

    keys = jax.random.split(key, scene_indices.shape[0])
    return jax.vmap(one_scene)(scene_indices, keys)


@partial(jax.jit, static_argnames=("subsample",))
def sample_scenes(pools: DevicePools, scene_indices: jax.Array, key: jax.Array,
                  subsample: int) -> jax.Array:
    """Draw a balanced subsample for each scene in the batch, on device.

    Returns (B, 2*(subsample//2), geom+1) — the same row count the
    reference yields (ref data.py:83-105). Mirrors its deficit
    rebalancing with static shapes: slot j takes from the pos pool iff
    j < pos_len (a traced per-scene scalar), where
    pos_len+neg_len == 2*(subsample//2). Draws are with replacement
    (pools ≫ subsample in practice); ``unpack_sdf_samples`` is the
    exact without-replacement host path.
    """
    half = subsample // 2
    target = 2 * half

    def one_scene(scene_idx, k):
        pos_count = pools.pos_counts[scene_idx]
        neg_count = pools.neg_counts[scene_idx]
        pos_len = jnp.where(
            pos_count < half, pos_count,
            jnp.where(neg_count < half, target - neg_count, half),
        )
        # safeguard degenerate pools (all draws from the other side)
        pos_len = jnp.clip(pos_len, target - jnp.maximum(neg_count, 1), jnp.maximum(pos_count, 0))
        k_pos, k_neg = jax.random.split(k)
        slots = jnp.arange(target)
        idx_pos = jax.random.randint(k_pos, (target,), 0, jnp.maximum(pos_count, 1))
        idx_neg = jax.random.randint(k_neg, (target,), 0, jnp.maximum(neg_count, 1))
        from_pos = slots < pos_len
        rows_pos = pools.pos[scene_idx][idx_pos]
        rows_neg = pools.neg[scene_idx][idx_neg]
        # NOTE: returns 2*(subsample//2) rows — identical to the reference,
        # which also yields pos_len+neg_len == 2*half rows for odd subsample.
        return jnp.where(from_pos[:, None], rows_pos, rows_neg)

    keys = jax.random.split(key, scene_indices.shape[0])
    return jax.vmap(one_scene)(scene_indices, keys)


def sample_scenes_auto(pools: DevicePools, scene_indices: jax.Array,
                       key: jax.Array, subsample: int) -> jax.Array:
    """Window path when the padded pools are wide enough for a full
    contiguous draw, else the general gather path."""
    target = 2 * (subsample // 2)
    if pools.pos.shape[1] >= target and pools.neg.shape[1] >= target:
        return sample_scenes_window(pools, scene_indices, key, subsample)
    return sample_scenes(pools, scene_indices, key, subsample)


def epoch_scene_batches(num_scenes: int, scenes_per_batch: int,
                        rng: np.random.Generator) -> np.ndarray:
    """Shuffled scene-index batches with drop_last (ref: DataLoader
    shuffle=True, drop_last=True, train_deep_sdf.py:369-375)."""
    perm = rng.permutation(num_scenes)
    n_batches = num_scenes // scenes_per_batch
    return perm[: n_batches * scenes_per_batch].reshape(n_batches, scenes_per_batch)
