"""Streaming host loader with background prefetch.

For datasets that exceed device memory (ShapeNet-scale: thousands of
shapes × 500k samples), the device-resident pools of ``dataset.py``
don't fit; this loader plays the role of the reference's DataLoader
worker pool (ref train_deep_sdf.py:366-375: ``DataLoaderThreads``,
shuffle, drop_last) with:

  * worker threads doing npz IO + NaN filtering + balanced
    without-replacement subsampling (exact ref data.py:83-110 parity)
  * an in-order prefetch queue so batch n+k is being assembled on host
    while batch n trains on device
  * optional RAM cache of decoded pos/neg pools (ref load_ram)
  * deterministic per-epoch shuffling from an explicit seed
"""

from __future__ import annotations

import os
import queue
import threading

import numpy as np

from .. import workspace as ws
from .dataset import _load_pos_neg, draw_balanced, get_instance_filenames


class StreamingSDFLoader:
    def __init__(self, data_source, split, subsample: int, geom_dimension: int,
                 scenes_per_batch: int, num_workers: int = 2, prefetch: int = 4,
                 load_ram: bool = False, seed: int = 0, strict: bool = True):
        self.data_source = data_source
        self.subsample = subsample
        self.geom_dimension = geom_dimension
        self.scenes_per_batch = scenes_per_batch
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.seed = seed
        self.npyfiles = get_instance_filenames(data_source, split, strict=strict)
        self._cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        self._cache_lock = threading.Lock()
        self.load_ram = load_ram
        if load_ram:
            for i in range(len(self.npyfiles)):
                self._cache[i] = self._load(i)

    def __len__(self):
        return len(self.npyfiles)

    @property
    def num_scenes(self):
        return len(self.npyfiles)

    def _load(self, idx: int):
        if idx in self._cache:
            return self._cache[idx]
        path = os.path.join(self.data_source, ws.sdf_samples_subdir, self.npyfiles[idx])
        pos, neg = _load_pos_neg(path, self.geom_dimension)
        if self.load_ram:
            with self._cache_lock:
                self._cache[idx] = (pos, neg)
        return pos, neg

    def _scene_samples(self, idx: int, rng: np.random.Generator) -> np.ndarray:
        pos, neg = self._load(idx)
        # pad=True: EVERY scene yields exactly 2*(subsample//2) rows, so
        # batches keep ONE static shape (each distinct shape would cost
        # a fresh 20-500s tunnel compile) and deficient scenes keep
        # their pos/neg balance instead of truncating other scenes
        return draw_balanced(pos, neg, self.subsample, rng, pad=True)

    def epoch_batches(self, epoch: int):
        """Yield (batch (B, 2*(subsample//2), geom+1) f32, scene_idx (B,))
        in order, with ``prefetch`` batches assembled ahead by
        ``num_workers`` threads."""
        rng = np.random.default_rng((self.seed, epoch))
        perm = rng.permutation(self.num_scenes)
        n_batches = self.num_scenes // self.scenes_per_batch
        batches = perm[: n_batches * self.scenes_per_batch].reshape(
            n_batches, self.scenes_per_batch)

        results: dict[int, tuple] = {}
        results_lock = threading.Lock()
        ready = threading.Condition(results_lock)
        next_job = {"i": 0}
        emitted = {"i": 0}

        def worker():
            while True:
                with results_lock:
                    # bounded prefetch: don't run more than `prefetch`
                    # batches ahead of the consumer
                    while (next_job["i"] - emitted["i"] >= self.prefetch
                           and next_job["i"] < n_batches):
                        ready.wait(timeout=0.1)
                    i = next_job["i"]
                    if i >= n_batches:
                        return
                    next_job["i"] = i + 1
                try:
                    scene_idx = batches[i]
                    batch_rng = np.random.default_rng((self.seed, epoch, i))
                    rows = [self._scene_samples(s, batch_rng) for s in scene_idx]
                    result = (np.stack(rows).astype(np.float32),
                              scene_idx.astype(np.int32))
                except BaseException as exc:  # surface IO/decode errors
                    result = exc
                with results_lock:
                    results[i] = result
                    ready.notify_all()

        threads = [threading.Thread(target=worker, daemon=True)
                   for _ in range(self.num_workers)]
        for t in threads:
            t.start()
        try:
            for i in range(n_batches):
                with ready:
                    while i not in results:
                        ready.wait(timeout=0.5)
                    batch = results.pop(i)
                    emitted["i"] = i + 1
                    ready.notify_all()
                if isinstance(batch, BaseException):
                    raise batch  # a worker failed (corrupt npz, …)
                yield batch
        finally:
            with ready:
                next_job["i"] = n_batches  # stop workers
                ready.notify_all()
            for t in threads:
                t.join(timeout=1.0)
