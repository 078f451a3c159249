"""Native C++ preprocessing tests: build, SDF correctness vs analytic &
python winding implementation, sampling recipe, npz round-trip, CLIs."""

import os
import shutil
import subprocess

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(shutil.which("g++") is None,
                                reason="no C++ toolchain")


@pytest.fixture(scope="module")
def native():
    from deepsdf_tpu import native as nat

    nat.build_native()
    return nat


def icosphere(sub=3, r=0.7):
    """Refined icosahedron point/face set."""
    t = (1 + 5 ** 0.5) / 2
    verts = np.array([
        [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
        [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
        [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1]], dtype=np.float64)
    faces = np.array([
        [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
        [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
        [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
        [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1]])
    for _ in range(sub):
        mid = {}
        new_faces = []
        verts = list(verts)

        def midpoint(a, b):
            key = (min(a, b), max(a, b))
            if key not in mid:
                verts.append((np.asarray(verts[a]) + verts[b]) / 2)
                mid[key] = len(verts) - 1
            return mid[key]

        for a, b, c in faces:
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            new_faces += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
        faces = np.asarray(new_faces)
        verts = np.asarray(verts)
    verts = verts / np.linalg.norm(verts, axis=1, keepdims=True) * r
    return verts, faces


def test_signed_distance_sphere(native):
    verts, faces = icosphere(3, 0.7)
    mesh = native.NativeMesh(vertices=verts, faces=faces)
    assert mesh.num_faces == len(faces)
    rng = np.random.default_rng(0)
    q = rng.uniform(-1, 1, (500, 3)).astype(np.float32)
    d = mesh.signed_distance(q)
    ref = np.linalg.norm(q, axis=1) - 0.7
    # icosphere chords vs true sphere: small geometric offset
    np.testing.assert_allclose(d, ref, atol=5e-3)
    # sign exactness incl. deep inside / far outside
    assert (np.sign(d[np.abs(ref) > 1e-2]) == np.sign(ref[np.abs(ref) > 1e-2])).all()


def test_matches_python_winding_sdf(native):
    from deepsdf_tpu.sdf_sampler.mesh_sdf import SDFfromMesh
    from deepsdf_tpu.sdf_sampler.tiles import Snappy3D

    verts, faces = Snappy3D().create_surface_mesh(parameters=np.array([[0.1]]),
                                                  resolution=6)
    mesh = native.NativeMesh(vertices=verts, faces=faces)
    py_sdf = SDFfromMesh(vertices=verts.astype(np.float32), faces=faces)
    rng = np.random.default_rng(1)
    q = rng.uniform(-1, 1, (300, 3)).astype(np.float32)
    d_native = mesh.signed_distance(q)
    d_py = py_sdf(q)[:, 0]
    np.testing.assert_allclose(d_native, d_py, atol=1e-4)


def test_normalize_and_surface_sampling(native):
    verts, faces = icosphere(2, 0.7)
    mesh = native.NativeMesh(vertices=verts * 3.0 + 1.0, faces=faces)
    offset, scale = mesh.normalize(buffer=1.03)
    pts = mesh.sample_surface(5000, seed=0)
    radii = np.linalg.norm(pts, axis=1)
    # normalized surface inside the unit sphere; vertices at 1/1.03,
    # facet interiors sag slightly inward (icosphere chords)
    assert radii.max() <= 1 / 1.03 + 1e-5
    assert 0.93 < radii.mean() <= 1 / 1.03
    # deterministic given the seed (ref RNG was unseeded — SURVEY §5.2)
    pts2 = mesh.sample_surface(5000, seed=0)
    np.testing.assert_array_equal(pts, pts2)


def test_sample_sdf_recipe(native):
    verts, faces = icosphere(2, 0.7)
    mesh = native.NativeMesh(vertices=verts, faces=faces)
    xyz, sdf = mesh.sample_sdf(num_sample=20000, variance=0.005, seed=0)
    assert len(xyz) == 20000
    near = np.abs(sdf) < 3 * np.sqrt(0.005)
    assert near.mean() > 0.7        # 47/50 near-surface ratio dominates
    assert (sdf < 0).mean() > 0.2   # both signs present
    # near-surface samples concentrate at the surface radius
    r = np.linalg.norm(xyz[near], axis=1)
    assert abs(np.median(r) - 0.7) < 0.05


def test_npz_roundtrip_and_loader(native, tmp_path):
    pos = np.random.default_rng(0).uniform(-1, 1, (100, 4)).astype(np.float32)
    pos[:, 3] = np.abs(pos[:, 3])
    neg = np.random.default_rng(1).uniform(-1, 1, (80, 4)).astype(np.float32)
    neg[:, 3] = -np.abs(neg[:, 3])
    path = str(tmp_path / "samples.npz")
    native.write_sdf_npz(path, pos, neg)

    npz = np.load(path)
    np.testing.assert_allclose(npz["pos.npy"], pos)
    np.testing.assert_allclose(npz["neg.npy"], neg)

    # the framework loader accepts the C++ key spelling (ref data.py:68-78)
    from deepsdf_tpu.data.dataset import unpack_sdf_samples

    samples = unpack_sdf_samples(path, 3, subsample=40,
                                 rng=np.random.default_rng(0))
    assert samples.shape == (40, 4)
    assert (samples[:20, 3] >= 0).all() and (samples[20:, 3] < 0).all()


def test_cli_binaries(native, tmp_path):
    from deepsdf_tpu.mesh.ply import read_ply, write_ply
    from deepsdf_tpu.native import _NATIVE_DIR

    verts, faces = icosphere(2, 0.7)
    mesh_path = str(tmp_path / "sphere.ply")
    write_ply(mesh_path, verts, faces)

    build = os.path.join(_NATIVE_DIR, "build")
    out_npz = str(tmp_path / "out.npz")
    subprocess.run([os.path.join(build, "preprocess_mesh"), "-m", mesh_path,
                    "-o", out_npz, "-s", "5000", "--seed", "3"], check=True,
                   capture_output=True)
    npz = np.load(out_npz)
    assert len(npz["pos.npy"]) + len(npz["neg.npy"]) == 5000

    out_ply = str(tmp_path / "surf.ply")
    out_norm = str(tmp_path / "norm.npz")
    subprocess.run([os.path.join(build, "sample_visible_mesh_surface"),
                    "-m", mesh_path, "-o", out_ply, "-n", out_norm,
                    "-s", "2000"], check=True, capture_output=True)
    pts, _ = read_ply(out_ply)
    assert pts.shape == (2000, 3)
    norm = np.load(out_norm)
    assert "offset.npy" in norm and "scale.npy" in norm


def test_preprocess_data_cli(native, tmp_path):
    """preprocess_data.py (the restored upstream driver) walks a split
    and produces the SdfSamples / SurfaceSamples / NormalizationParameters
    layout (ref README.md:79-145)."""
    import json
    import sys

    from deepsdf_tpu.mesh.ply import write_ply

    verts, faces = icosphere(2, 0.7)
    src = tmp_path / "source" / "spheres"
    os.makedirs(src)
    write_ply(str(src / "sp_0.ply"), verts, faces)
    split_path = tmp_path / "split.json"
    with open(split_path, "w") as f:
        json.dump({"mini": {"spheres": ["sp_0"]}}, f)

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    data_dir = tmp_path / "data"
    base = [sys.executable, os.path.join(root, "preprocess_data.py"),
            "--data_dir", str(data_dir), "--source", str(tmp_path / "source"),
            "--name", "minids", "--split", str(split_path)]
    subprocess.run(base + ["--samples", "4000"], check=True, cwd=root,
                   capture_output=True)
    npz = np.load(data_dir / "SdfSamples" / "minids" / "spheres" / "sp_0.npz")
    assert len(npz["pos.npy"]) + len(npz["neg.npy"]) == 4000
    assert len(npz["neg.npy"]) > 500  # sphere interior gets hit

    subprocess.run(base + ["--surface"], check=True, cwd=root,
                   capture_output=True)
    assert (data_dir / "SurfaceSamples" / "minids" / "spheres" / "sp_0.ply").exists()
    assert (data_dir / "NormalizationParameters" / "minids" / "spheres"
            / "sp_0.npz").exists()
