"""Committed-artifact manifest: the trained fixtures the suite and
bench.py load must exist at HEAD.

Several tests are fixture-gated with pytest.skip (test_sparse_grid,
test_compat_facade, test_tools) so they stay runnable mid-retrain; this
meta-test is the backstop that turns "fixture quietly deleted" from a
silent skip into a failure (round-2 VERDICT: deleting fixtures broke
the suite and bench without any test saying so).

Extend REQUIRED when a retrained fixture lands; an entry here is a
statement that the artifact is committed, not machine-local.
"""

import json
import os

import pytest

ROOT = os.path.join(os.path.dirname(__file__), "..")

# (experiment, checkpoint) pairs whose artifacts are committed at HEAD
REQUIRED = [
    ("double_lattice_3D", "1000"),
    ("corner_spheres_only_small_network", "1000"),
    ("double_lattice_3D_small_network", "1000"),
    ("external_knots", "1500"),
    ("round_cross_small_network", "1000"),
    ("snappy3D", "1000"),
]


@pytest.mark.parametrize("exp,ckpt", REQUIRED, ids=[e for e, _ in REQUIRED])
def test_fixture_artifacts_present(exp, ckpt):
    d = os.path.join(ROOT, "experiments", exp)
    for rel in (
        os.path.join("ModelParameters", ckpt + ".npz"),
        os.path.join("LatentCodes", ckpt + ".npz"),
        "Logs.npz",
        "specs.json",
    ):
        assert os.path.isfile(os.path.join(d, rel)), (
            f"committed fixture artifact missing: {exp}/{rel} — fixture-"
            "gated tests and bench.py silently degrade without it"
        )
    specs = json.load(open(os.path.join(d, "specs.json")))
    assert int(ckpt) <= int(specs["NumEpochs"])
