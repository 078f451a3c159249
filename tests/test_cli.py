"""Root-CLI surface smoke: the ref-documented flags round-trip.

The reference exposes --experiment/--continue/--batch_split on
train_deep_sdf.py (ref: train_deep_sdf.py:584-618); this drives the
actual CLI in a subprocess — fresh run with --batch_split 2, then
--continue latest — against a miniature workspace.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from deepsdf_tpu import ws
from deepsdf_tpu.sdf_sampler import CornerSpheresSDF, SDFSampler

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def tiny_workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    data_dir = root / "data"
    split_dir = data_dir / "splits"
    exp_dir = root / "exp"
    os.makedirs(exp_dir)

    sampler = SDFSampler(str(data_dir / ws.sdf_samples_subdir),
                         str(split_dir), seed=0)
    sdfs = [CornerSpheresSDF(r, limit=0.9).SDF for r in (0.5, 0.9)]
    info = {"dataset_name": "microstructure", "class_name": "corner_spheres"}
    split_ids = sampler.sample_sdfs(sdfs, info, n_samples=4e3)
    sampler.write_json("split.json", info, split_ids)

    specs = {
        "Description": "cli smoke",
        "DataSource": str(data_dir),
        "TrainSplit": str(split_dir / "split.json"),
        "NetworkArch": "decoder",
        "NetworkSpecs": {
            "dims": [32, 32],
            "dropout": [0, 1],
            "dropout_prob": 0.2,
            "norm_layers": [0, 1],
            "latent_in": [1],
            "xyz_in_all": False,
            "use_tanh": True,
            "latent_dropout": False,
            "weight_norm": True,
            "geom_dimension": 3,
        },
        "CodeLength": 2,
        "NumEpochs": 4,
        "SnapshotFrequency": 2,
        "AdditionalSnapshots": [],
        "LearningRateSchedule": [
            {"Type": "Step", "Initial": 0.002, "Interval": 2, "Factor": 0.5},
            {"Type": "Step", "Initial": 0.004, "Interval": 2, "Factor": 0.5},
        ],
        "SamplesPerScene": 512,
        "ScenesPerBatch": 2,
        "ClampingDistance": 0.1,
        "CodeRegularization": True,
        "CodeRegularizationLambda": 1e-4,
        "CodeBound": 1.0,
    }
    with open(exp_dir / "specs.json", "w") as f:
        json.dump(specs, f)
    return str(exp_dir)


def _run_cli(*args):
    return subprocess.run(
        [sys.executable, os.path.join(ROOT, "train_deep_sdf.py"), *args],
        cwd=ROOT, capture_output=True, text=True, timeout=600)


def test_batch_split_and_continue_roundtrip(tiny_workspace):
    r = _run_cli("-e", tiny_workspace, "--batch_split", "2", "--cpu")
    assert r.returncode == 0, r.stdout + r.stderr
    ckpt = os.path.join(tiny_workspace, "ModelParameters", "latest.npz")
    assert os.path.isfile(ckpt)
    assert int(np.load(ckpt)["__epoch__"]) == 4

    # bump the epoch budget and resume from latest via the CLI flag
    specs = json.load(open(os.path.join(tiny_workspace, "specs.json")))
    specs["NumEpochs"] = 6
    json.dump(specs, open(os.path.join(tiny_workspace, "specs.json"), "w"))
    r = _run_cli("-e", tiny_workspace, "--continue", "latest",
                 "--batch_split", "2", "--cpu")
    assert r.returncode == 0, r.stdout + r.stderr
    assert int(np.load(ckpt)["__epoch__"]) == 6
