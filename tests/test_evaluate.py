"""Evaluation driver (eval/evaluate.py): chamfer + EMD over an
experiment directory — the restored upstream ``evaluate.py`` capability
(ref README.md:145-158, Evaluation/<ckpt> layout workspace.py:16)."""

import json
import os

import numpy as np

from deepsdf_tpu import workspace as ws
from deepsdf_tpu.eval.evaluate import evaluate, surface_samples_from_sdf
from deepsdf_tpu.mesh.marching import marching_tetrahedra
from deepsdf_tpu.mesh.ply import read_ply, write_ply


def _sphere_mesh(radius: float, grid_n: int = 48, scale: float = 1.0):
    lin = np.linspace(-1, 1, grid_n)
    X, Y, Z = np.meshgrid(lin, lin, lin, indexing="ij")
    sdf = np.sqrt(X ** 2 + Y ** 2 + Z ** 2) - radius
    h = 2.0 / (grid_n - 1)
    verts, faces, _, _ = marching_tetrahedra(sdf, 0.0, (h, h, h))
    return (np.asarray(verts) - 1.0) * scale, np.asarray(faces)


def _write(path, verts, faces):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    write_ply(path, verts.astype(np.float32), np.asarray(faces, np.int32))


def test_evaluate_writes_chamfer_and_emd(tmp_path):
    exp = str(tmp_path / "exp")
    data = str(tmp_path / "data")
    ckpt = "2000"

    gt_pts = surface_samples_from_sdf(
        lambda q: np.linalg.norm(q, axis=1) - 0.5, n_points=4000, grid_n=48)

    # instance "good": same sphere, but stored in (offset, scale)
    # normalized coordinates — exercises the NormalizationParameters path
    # (ref README.md:151-156: gen_points/scale - offset)
    off = np.array([0.1, -0.2, 0.05], np.float64)
    v, f = _sphere_mesh(0.5)
    _write(ws.get_reconstructed_mesh_filename(exp, ckpt, "ds", "cls", "good"),
           (v + off) * 2.0, f)
    norm_path = ws.get_normalization_params_filename(data, "ds", "cls", "good")
    os.makedirs(os.path.dirname(norm_path), exist_ok=True)
    np.savez(norm_path, offset=off, scale=np.array([2.0]))

    # instance "bad": wrong radius — must score clearly worse
    vb, fb = _sphere_mesh(0.25)
    _write(ws.get_reconstructed_mesh_filename(exp, ckpt, "ds", "cls", "bad"),
           vb, fb)

    for inst in ("good", "bad"):
        p = os.path.join(data, ws.surface_samples_subdir, "ds", "cls",
                         inst + ".ply")
        os.makedirs(os.path.dirname(p), exist_ok=True)
        write_ply(p, gt_pts.astype(np.float32), np.zeros((0, 3), np.int32))

    # "missing" has no mesh/GT: must be skipped with a warning, not crash
    split = {"ds": {"cls": ["good", "bad", "missing"]}}
    results = evaluate(exp, ckpt, data, split, num_mesh_samples=4000,
                       with_emd=True)

    assert set(results) == {"ds/cls/good", "ds/cls/bad"}
    assert results["ds/cls/good"] < 1e-3          # same surface, denormalized
    assert results["ds/cls/bad"] > 10 * results["ds/cls/good"]

    out_dir = ws.get_evaluation_dir(exp, ckpt)
    with open(os.path.join(out_dir, "chamfer.json")) as fjson:
        assert json.load(fjson) == results
    csv = open(os.path.join(out_dir, "chamfer.csv")).read()
    assert csv.startswith("shape, chamfer_dist\n") and "ds/cls/good" in csv
    with open(os.path.join(out_dir, "emd", "emd.json")) as fjson:
        emd = json.load(fjson)
    assert set(emd) == set(results) and emd["ds/cls/good"] < emd["ds/cls/bad"]

    # PLY round-trip sanity for the files this test wrote
    rv, rf = read_ply(ws.get_reconstructed_mesh_filename(
        exp, ckpt, "ds", "cls", "good"))
    assert rv.shape[1] == 3 and len(rf) == len(f)
