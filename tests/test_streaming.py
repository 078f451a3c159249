"""Streaming loader tests: batch shapes/determinism, parity with the
device path semantics, and a short streamed training run."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepsdf_tpu import ws
from deepsdf_tpu.data.streaming import StreamingSDFLoader


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("stream")
    data_dir = root / "data"
    d = data_dir / ws.sdf_samples_subdir / "ds" / "cls"
    os.makedirs(d)
    rng = np.random.default_rng(0)
    split = {"ds": {"cls": []}}
    for i in range(7):
        pts = rng.uniform(-1, 1, (3000, 3)).astype(np.float32)
        sdf = (np.linalg.norm(pts, axis=1) - (0.6 + 0.03 * i)).astype(np.float32)
        rows = np.concatenate([pts, sdf[:, None]], axis=1)
        np.savez(d / f"shape_{i}.npz", pos=rows[sdf >= 0], neg=rows[sdf < 0])
        split["ds"]["cls"].append(f"shape_{i}")
    return str(data_dir), split


def test_batches_shape_and_determinism(dataset):
    data_dir, split = dataset
    loader = StreamingSDFLoader(data_dir, split, subsample=256, geom_dimension=3,
                               scenes_per_batch=3, num_workers=2, seed=5)
    batches1 = list(loader.epoch_batches(0))
    assert len(batches1) == 7 // 3
    for batch, idx in batches1:
        assert batch.shape == (3, 256, 4)
        assert idx.shape == (3,)
        # balanced: half pos half neg per scene
        frac_pos = (batch[..., 3] >= 0).mean(axis=1)
        np.testing.assert_allclose(frac_pos, 0.5, atol=0.01)

    loader2 = StreamingSDFLoader(data_dir, split, subsample=256, geom_dimension=3,
                                scenes_per_batch=3, num_workers=3, seed=5)
    batches2 = list(loader2.epoch_batches(0))
    for (b1, i1), (b2, i2) in zip(batches1, batches2):
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_array_equal(b1, b2)

    # different epoch shuffles differently
    b_e1 = list(loader.epoch_batches(1))
    assert any((i1 != i2).any() for (_, i1), (_, i2) in zip(batches1, b_e1))


def test_streamed_training_runs(dataset, tmp_path):
    from deepsdf_tpu.train.loop import main_function

    data_dir, split = dataset
    split_path = tmp_path / "split.json"
    with open(split_path, "w") as f:
        json.dump(split, f)
    exp = tmp_path / "exp"
    os.makedirs(exp)
    specs = {
        "Description": "stream test", "DataSource": data_dir,
        "TrainSplit": str(split_path), "NetworkArch": "decoder",
        "DataLoaderMode": "stream", "DataLoaderThreads": 2,
        "NetworkSpecs": {"dims": [16, 16], "geom_dimension": 3},
        "CodeLength": 2, "NumEpochs": 30, "SnapshotFrequency": 30,
        "AdditionalSnapshots": [],
        "LearningRateSchedule": [
            {"Type": "Constant", "Value": 2e-3}, {"Type": "Constant", "Value": 4e-3}],
        "SamplesPerScene": 128, "ScenesPerBatch": 3, "ClampingDistance": 0.1,
        "CodeBound": 1.0,
    }
    with open(exp / "specs.json", "w") as f:
        json.dump(specs, f)
    main_function(str(exp), None, seed=0)
    from deepsdf_tpu.train.checkpoint import load_logs
    loss_log, *_, epoch = load_logs(str(exp))
    assert epoch == 30
    assert np.mean(loss_log[-4:]) < np.mean(loss_log[:4])
