"""SDF sampling framework — ground-truth data producer.

Re-designed from ref sdf_sampler/sdf_sampler.py:21-199: the same
callable-SDF + CSG-operator API, but sampling and SDF evaluation are
vectorized JAX ops that run on the accelerator, and all randomness is
PRNG-key-threaded (the reference used unseeded numpy RNG —
SURVEY.md §5.2).

Output format is byte-compatible: ``<outdir>/<dataset>/<class>/<id>.npz``
with ``pos``/``neg`` arrays of shape (n, 4) = [x,y,z,sdf]
(ref: sdf_sampler.py:146), plus split JSON ``{dataset:{class:[ids]}}``
(ref: sdf_sampler.py:154-157).
"""

from __future__ import annotations

import datetime
import json
import logging
import os
import pathlib
import time
from abc import ABC, abstractmethod

import numpy as np

import jax
import jax.numpy as jnp

logger = logging.getLogger(__name__)


class SDFBase(ABC):
    """Callable SDF with CSG operators (ref: sdf_sampler.py:21-40)."""

    @abstractmethod
    def __call__(self, queries):
        ...

    def __add__(self, other):
        return SummedSDF(self, other)

    def __neg__(self):
        return NegatedCallable(self)


class SummedSDF(SDFBase):
    """Union via -max(-a,-b) (ref: sdf_sampler.py:42-50)."""

    def __init__(self, obj1, obj2):
        self.obj1 = obj1
        self.obj2 = obj2

    def __call__(self, queries):
        return -np.maximum(-np.asarray(self.obj1(queries)), -np.asarray(self.obj2(queries)))


class NegatedCallable(SDFBase):
    def __init__(self, obj):
        self.obj = obj

    def __call__(self, queries):
        return -np.asarray(self.obj(queries))


class BoxSDF(SDFBase):
    """ref: sdf_sampler.py:60-68"""

    def __init__(self, box_size: float = 1, center=np.array([0, 0, 0])):
        self.box_size = box_size
        self.center = np.asarray(center)

    def __call__(self, queries):
        out = np.linalg.norm(np.asarray(queries) - self.center, axis=1, ord=np.inf) - self.box_size
        return out.reshape(-1, 1)


class RandomSampleSDF:
    """Sampled (points, distances) pair (ref: sdf_sampler.py:81-106)."""

    def __init__(self, samples, distances):
        self.samples = np.asarray(samples)
        self.distances = np.asarray(distances).reshape(-1, 1)

    def split_pos_neg(self):
        pos_mask = self.distances[:, 0] >= 0.0
        pos = RandomSampleSDF(self.samples[pos_mask], self.distances[pos_mask])
        neg = RandomSampleSDF(self.samples[~pos_mask], self.distances[~pos_mask])
        return pos, neg

    @property
    def stacked(self):
        return np.hstack((self.samples, self.distances))

    def __add__(self, other):
        return RandomSampleSDF(
            samples=np.vstack((self.samples, other.samples)),
            distances=np.vstack((self.distances, other.distances)),
        )


def random_sample_sdf(sdf, bounds, n_samples, type="uniform", key=None):
    """Sample query points and evaluate an SDF (ref: sdf_sampler.py:187-199).

    Strategies: ``uniform`` box, ``plane`` (z=0), ``spherical_gaussian``
    (unit-sphere shell + sigma=0.01 noise). ``key`` makes the draw
    deterministic; defaults to a fresh numpy RNG for API parity.
    """
    if key is None:
        key = jax.random.PRNGKey(np.random.randint(0, 2**31 - 1))
    n_samples = int(n_samples)
    if type == "plane":
        k1, _ = jax.random.split(key)
        xy = jax.random.uniform(k1, (n_samples, 2), minval=bounds[0], maxval=bounds[1])
        samples = jnp.hstack([xy, jnp.zeros((n_samples, 1))])
    elif type == "spherical_gaussian":
        k1, k2 = jax.random.split(key)
        s = jax.random.normal(k1, (n_samples, 3))
        s = s / jnp.linalg.norm(s, axis=1, keepdims=True)
        samples = s + 0.01 * jax.random.normal(k2, (n_samples, 3))
    elif type == "uniform":
        samples = jax.random.uniform(key, (n_samples, 3), minval=bounds[0], maxval=bounds[1])
    else:
        raise ValueError(f"unknown sampling strategy {type!r}")
    samples = np.asarray(samples, dtype=np.float64)
    distances = np.asarray(sdf(samples))
    return RandomSampleSDF(samples=samples, distances=distances)


class SDFSampler:
    """Writes npz sample files + split JSONs (ref: sdf_sampler.py:109-157)."""

    def __init__(self, outdir, splitdir, seed: int = 0) -> None:
        self.outdir = outdir
        self.splitdir = splitdir
        self.seed = seed

    def sample_sdfs(self, sdfs, data_set_info, show=False, n_samples=1e5,
                    sampling_strategy="uniform", clamp_distance=0.1, box_size=None,
                    stds=(0.0025, 0.00025)) -> list[str]:
        start_tot = time.time()
        root_key = jax.random.PRNGKey(self.seed)
        split = []
        for i, current_sdf in enumerate(sdfs):
            file_name = f"{data_set_info['class_name']}_{10000 + i}.npz"
            folder_name = pathlib.Path(self.outdir) / data_set_info["dataset_name"] / data_set_info["class_name"]
            fname = folder_name / file_name
            split.append(fname.stem)
            os.makedirs(folder_name, exist_ok=True)
            if fname.is_file():
                continue

            key = jax.random.fold_in(root_key, i)
            sampled = random_sample_sdf(
                current_sdf, bounds=(-1, 1), n_samples=int(n_samples),
                type=sampling_strategy, key=key,
            )
            pos, neg = sampled.split_pos_neg()
            np.savez(fname, neg=neg.stacked, pos=pos.stacked)

            tot_time = time.time() - start_tot
            avg = tot_time / (i + 1)
            eta = str(datetime.timedelta(seconds=round(avg * (len(sdfs) - i - 1))))
            logger.info(
                "Sampling %s (%d/%d) [%.2f%%] in %s (%.2fs/file)",
                fname, i + 1, len(sdfs), (i + 1) / len(sdfs) * 100, eta, avg,
            )
        return split

    def write_json(self, json_fname, data_info, split_files) -> None:
        content = {data_info["dataset_name"]: {data_info["class_name"]: split_files}}
        path = pathlib.Path(self.splitdir) / json_fname
        os.makedirs(path.parent, exist_ok=True)
        with open(path, "w") as f:
            json.dump(content, f, indent=4)
