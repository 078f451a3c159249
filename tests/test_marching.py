"""Surface-extraction correctness: sphere geometry, watertightness, PLY IO."""

import numpy as np

from deepsdf_tpu.mesh.marching import marching_tetrahedra
from deepsdf_tpu.mesh.ply import read_ply, write_ply


def sphere_grid(n=48, r=0.6):
    lin = np.linspace(-1, 1, n)
    X, Y, Z = np.meshgrid(lin, lin, lin, indexing="ij")
    return np.sqrt(X**2 + Y**2 + Z**2) - r, 2.0 / (n - 1)


def test_sphere_radius_and_watertight():
    vol, h = sphere_grid()
    verts, faces, normals, values = marching_tetrahedra(vol, 0.0, (h, h, h))
    assert len(verts) > 1000
    centered = verts - 1.0  # grid origin at (-1,-1,-1): verts are index*h
    radii = np.linalg.norm(centered, axis=1)
    np.testing.assert_allclose(radii.mean(), 0.6, atol=2e-3)
    assert np.abs(radii - 0.6).max() < 0.01

    # watertight: every edge shared by exactly two triangles
    edges = np.sort(np.stack([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]],
                             axis=1).reshape(-1, 2), axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).all()

    # Euler characteristic of a sphere: V - E + F = 2
    n_edges = len(np.unique(edges, axis=0))
    assert len(verts) - n_edges + len(faces) == 2

    # outward orientation: face normal · radial direction > 0
    tv = centered[faces]
    fn = np.cross(tv[:, 1] - tv[:, 0], tv[:, 2] - tv[:, 0])
    cen = tv.mean(axis=1)
    assert ((fn * cen).sum(1) > 0).mean() > 0.999

    # values at vertices ≈ level
    assert np.abs(values).max() < 1e-9


def test_gyroid_covers_all_cases_watertight():
    # gyroid exercises many sign configurations incl. would-be ambiguous ones
    n = 40
    lin = np.linspace(-np.pi, np.pi, n)
    X, Y, Z = np.meshgrid(lin, lin, lin, indexing="ij")
    vol = np.sin(X) * np.cos(Y) + np.sin(Y) * np.cos(Z) + np.sin(Z) * np.cos(X) + 0.1
    verts, faces, _, _ = marching_tetrahedra(vol, 0.0)
    edges = np.sort(np.stack([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]],
                             axis=1).reshape(-1, 2), axis=1)
    uniq, counts = np.unique(edges, axis=0, return_counts=True)
    # interior edges shared by 2; boundary (volume-box) edges by 1
    assert counts.max() == 2
    interior = counts == 2
    assert interior.mean() > 0.95


def test_empty_grid():
    vol = np.ones((8, 8, 8))
    verts, faces, normals, values = marching_tetrahedra(vol, 0.0)
    assert len(verts) == 0 and len(faces) == 0


def test_ply_roundtrip(tmp_path):
    vol, h = sphere_grid(24)
    verts, faces, _, _ = marching_tetrahedra(vol, 0.0, (h, h, h))
    p = str(tmp_path / "m.ply")
    write_ply(p, verts, faces)
    v2, f2 = read_ply(p)
    np.testing.assert_allclose(v2, verts.astype(np.float32), rtol=1e-6)
    np.testing.assert_array_equal(f2, faces)

    p2 = str(tmp_path / "m_ascii.ply")
    write_ply(p2, verts, faces, binary=False)
    v3, f3 = read_ply(p2)
    np.testing.assert_allclose(v3, verts.astype(np.float32), rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(f3, faces)


def test_winding_table_matches_geometric_test():
    """_FLIP_TABLE is the precomputed form of the old per-face midpoint
    orientation test; verify it against a brute-force evaluation with
    RANDOM field magnitudes for every (tet, case, slot) — the decision
    must be value-independent (isotopy inside the tet) and must point
    the normal toward +field."""
    import numpy as np
    from deepsdf_tpu.mesh.marching import (
        _CASE_TRIS, _CORNERS, _FLIP_TABLE, _TET_EDGES, _TETS,
    )

    rng = np.random.default_rng(0)
    for tet_id in range(6):
        corners = _CORNERS[_TETS[tet_id]].astype(np.float64)
        for case in range(1, 15):
            inside = [(case >> v) & 1 == 1 for v in range(4)]
            for trial in range(5):
                vals = np.where(inside, -rng.uniform(0.05, 3, 4),
                                rng.uniform(0.05, 3, 4))
                for slot, tri in enumerate(_CASE_TRIS[case]):
                    pts, douts = [], []
                    for e in tri:
                        a, b = _TET_EDGES[e]
                        t = vals[a] / (vals[a] - vals[b])
                        pts.append(corners[a] * (1 - t) + corners[b] * t)
                        sgn = 1.0 if inside[a] else -1.0
                        douts.append(sgn * (corners[b] - corners[a]))
                    # triangle as emitted (flip applied)
                    p = ([pts[0], pts[2], pts[1]]
                         if _FLIP_TABLE[tet_id, case, slot] else pts)
                    n = np.cross(p[1] - p[0], p[2] - p[0])
                    # emitted winding must face the inside->outside flow
                    assert float(n @ np.sum(douts, axis=0)) > 0, \
                        (tet_id, case, slot, trial)
