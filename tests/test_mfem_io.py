"""MFEM v1.0 mesh writer/reader round-trip + CantileverBeam.read_mesh."""

import numpy as np

from deepsdf_tpu.opt.geometry import read_mfem_mesh, write_mfem_mesh
from deepsdf_tpu.opt.problems import CantileverBeam
from deepsdf_tpu.opt.stuffing import stuff_sdf_grid


def test_roundtrip(tmp_path):
    mesh = stuff_sdf_grid(-np.ones((5, 4, 4)), (0.25, 1 / 3, 1 / 3), (0, 0, 0))
    bf = mesh.boundary_faces()
    markers = np.full(len(bf), 3, np.int32)
    markers[mesh.vertices[bf].max(axis=1)[:, 0] < 1e-9] = 1
    path = str(tmp_path / "m.mesh")
    write_mfem_mesh(path, mesh.vertices, mesh.tets, bf, markers)

    verts, tets, bfaces, bmark = read_mfem_mesh(path)
    np.testing.assert_allclose(verts, mesh.vertices)
    np.testing.assert_array_equal(tets, mesh.tets)
    np.testing.assert_array_equal(bfaces, bf)
    np.testing.assert_array_equal(bmark, markers)

    # CantileverBeam can consume the file (ref CantileverBeam.read_mesh)
    beam = CantileverBeam(str(tmp_path))
    beam.read_mesh(path)
    # mark a load face set so set_up has something on marker 2
    beam.bmarkers[beam.bmarkers == 3] = 2
    beam.set_up()
    beam.solve()
    c, _ = beam.compute_compliance()
    v, _ = beam.compute_volume()
    assert np.isfinite(c) and c > 0
    np.testing.assert_allclose(v, 1.0 * 1.0 * 1.0, atol=1e-9)
