"""Tile generator tests: snappy multipatch mesh + double-lattice SDF."""

import numpy as np
import pytest

from deepsdf_tpu.sdf_sampler.mesh_sdf import SDFfromMesh
from deepsdf_tpu.sdf_sampler.multipatch import extract_boundary_mesh
from deepsdf_tpu.sdf_sampler.tiles import DoubleLatticeExtruded, Snappy3D
from deepsdf_tpu.ops.bspline import Bezier


def watertight(faces):
    edges = np.sort(np.stack([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]],
                             axis=1).reshape(-1, 2), axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    return (counts == 2).all()


def test_multipatch_two_cubes():
    # two unit cubes sharing a face → boundary is the 1×1×2 box surface
    c1 = Bezier([1, 1, 1], np.array(
        [[x, y, z] for z in (0, 1) for y in (0, 1) for x in (0, 1)], dtype=float))
    c2 = Bezier([1, 1, 1], np.array(
        [[x + 1, y, z] for z in (0, 1) for y in (0, 1) for x in (0, 1)], dtype=float))
    verts, faces = extract_boundary_mesh([c1, c2], resolution=4)
    assert watertight(faces)
    tv = verts[faces]
    area = 0.5 * np.linalg.norm(
        np.cross(tv[:, 1] - tv[:, 0], tv[:, 2] - tv[:, 0]), axis=1).sum()
    np.testing.assert_allclose(area, 10.0, atol=1e-9)  # 2·(1·1) + 4·(2·1)
    # outward orientation: signed volume = 2
    vol = np.einsum("ij,ij->i", np.cross(tv[:, 1], tv[:, 2]), tv[:, 0]).sum() / 6
    np.testing.assert_allclose(vol, 2.0, atol=1e-9)


def test_bezier_extrude_and_elevate():
    sq = Bezier([1, 1], np.array([[0, 0], [1, 0], [0, 1], [1, 1]], dtype=float))
    vol = sq.extruded([0, 0, 2.0])
    assert vol.para_dim == 3 and vol.dim == 3
    p = vol.evaluate(np.array([[0.5, 0.5, 0.5]]))[0]
    np.testing.assert_allclose(p, [0.5, 0.5, 1.0], atol=1e-6)
    vol2 = vol.elevate_degrees([2])
    assert vol2.degrees[2] == 2
    q = np.random.default_rng(0).uniform(0, 1, (20, 3))
    np.testing.assert_allclose(vol2.evaluate(q), vol.evaluate(q), atol=1e-5)


def test_snappy_tile_mesh():
    tile = Snappy3D()
    verts, faces = tile.create_surface_mesh(parameters=np.array([[0.1]]),
                                            resolution=8)
    assert watertight(faces)
    assert verts.min() >= -1 - 1e-9 and verts.max() <= 1 + 1e-9
    tv = verts[faces]
    vol = np.einsum("ij,ij->i", np.cross(tv[:, 1], tv[:, 2]), tv[:, 0]).sum() / 6
    assert vol > 0  # outward oriented, nonzero enclosed volume
    # solid fraction of the snappy truss (≈0.27 at defaults)
    assert 0.1 < vol / 8.0 < 0.5

    # sign test via winding SDF; tile plane is (x,y), extrusion along z
    sdf = SDFfromMesh(vertices=verts.astype(np.float32), faces=faces)
    inside_pt = np.array([[-0.95, -0.9, 0.0]])   # bottom-left block
    outside_pt = np.array([[-0.5, -0.2, -0.9]])  # cavity between the beams
    assert sdf(inside_pt)[0, 0] < 0
    assert sdf(outside_pt)[0, 0] > 0


def test_snappy_thickness_changes_geometry():
    t0 = Snappy3D().create_surface_mesh(parameters=np.array([[0.0]]), resolution=6)[0]
    t2 = Snappy3D().create_surface_mesh(parameters=np.array([[0.2]]), resolution=6)[0]
    assert t0.shape != t2.shape or np.abs(t0 - t2).max() > 1e-3


def test_double_lattice_sdf():
    tile = DoubleLatticeExtruded()
    sdf = tile.sdf(np.array([[0.1, 0.1]]))
    # frame material near the cell edge, center of a face
    assert sdf(np.array([[-0.95, 0.0, 0.0]]))[0, 0] < 0
    # diagonal band center
    assert sdf(np.array([[0.0, 0.0, 0.0]]))[0, 0] < 0
    # hole between frame and diagonals: 2d point (0.5, 0.25·...) pick
    # (x,z)=(0.5, 0.13) scaled → q=(0.0, 0.0, -0.74): below center,
    # above frame (z_2d=0.13 > t1=0.1), outside bands (|x−y|=0.37 > √2·0.1)
    assert sdf(np.array([[0.0, 0.0, -0.74]]))[0, 0] > 0
    # outside the cell
    assert sdf(np.array([[1.5, 0.0, 0.0]]))[0, 0] > 0

    # parameter validation (ref double_lattice_extruded.py:66-72)
    with pytest.raises(ValueError):
        tile.sdf(np.array([[0.3, 0.1]]))


def test_double_lattice_mesh_volume():
    tile = DoubleLatticeExtruded()
    verts, faces = tile.create_surface_mesh(np.array([[0.1, 0.1]]), resolution=80)
    assert watertight(faces)
    tv = verts[faces]
    vol = np.einsum("ij,ij->i", np.cross(tv[:, 1], tv[:, 2]), tv[:, 0]).sum() / 6
    # analytic solid fraction: ring + bands − overlaps; sanity band
    assert 0.3 * 8 < vol < 0.75 * 8
