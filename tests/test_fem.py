"""FEM + tet-stuffing tests: mesh conformity, volume accuracy, solver
consistency (jax vs scipy), and FD validation of the Allaire shape
derivatives (the reference's test_volume_integration / derivative-plot
validations as unit tests)."""

import numpy as np
import pytest

from deepsdf_tpu.opt.fem import ElasticitySolver
from deepsdf_tpu.opt.stuffing import TetMesh, _tet_volume, stuff_sdf_grid


def sphere_field(n=24, r=0.6):
    lin = np.linspace(-1, 1, n)
    X, Y, Z = np.meshgrid(lin, lin, lin, indexing="ij")
    h = 2.0 / (n - 1)
    return np.sqrt(X**2 + Y**2 + Z**2) - r, (h, h, h), (-1, -1, -1)


def box_mesh(nx=17, ny=5, nz=5, L=1.0, h=0.25):
    """Full box [0,L]×[0,h]×[0,h] meshed by stuffing an all-inside field."""
    field = -np.ones((nx, ny, nz))
    sp = (L / (nx - 1), h / (ny - 1), h / (nz - 1))
    return stuff_sdf_grid(field, sp, (0.0, 0.0, 0.0))


def test_stuffing_sphere_volume_and_conformity():
    field, sp, org = sphere_field(32)
    mesh = stuff_sdf_grid(field, sp, org)
    assert mesh.tets.min() >= 0
    # volume ≈ 4/3 π r³
    v_true = 4 / 3 * np.pi * 0.6 ** 3
    assert abs(mesh.total_volume() - v_true) / v_true < 0.01
    # all tets positively oriented
    assert (_tet_volume(mesh.vertices, mesh.tets) > 0).all()
    # conformity: every face appears in exactly 1 or 2 tets
    f = np.sort(np.concatenate([
        mesh.tets[:, [0, 1, 2]], mesh.tets[:, [0, 1, 3]],
        mesh.tets[:, [0, 2, 3]], mesh.tets[:, [1, 2, 3]]]), axis=1)
    _, counts = np.unique(f, axis=0, return_counts=True)
    assert counts.max() <= 2
    # boundary area ≈ 4 π r²
    bf = mesh.boundary_faces()
    tv = mesh.vertices[bf]
    area = 0.5 * np.linalg.norm(np.cross(tv[:, 1] - tv[:, 0], tv[:, 2] - tv[:, 0]),
                                axis=1).sum()
    assert abs(area - 4 * np.pi * 0.6 ** 2) / (4 * np.pi * 0.36) < 0.06


def test_box_mesh_exact_volume():
    mesh = box_mesh()
    assert abs(mesh.total_volume() - 1.0 * 0.25 * 0.25) < 1e-12


def _beam_problem(nx=21, ny=6, nz=6, method="scipy"):
    L, h = 1.0, 0.25
    mesh = box_mesh(nx, ny, nz, L, h)
    solver = ElasticitySolver(mesh.vertices, mesh.tets, lam=0.0, mu=105.0)
    verts = mesh.vertices
    solver.set_essential_vertices(verts[:, 0] < 1e-9)
    bf = mesh.boundary_faces()
    centers = verts[bf].mean(axis=1)
    tip_faces = bf[centers[:, 0] > L - 1e-9]
    solver.set_surface_load(tip_faces, np.array([0.0, 0.0, -0.01]))
    solver.solve(method=method, rel_tol=1e-10)
    return mesh, solver


def test_beam_deflection_reasonable():
    mesh, solver = _beam_problem()
    u = np.asarray(solver.u)
    verts = mesh.vertices
    tip = np.abs(verts[:, 0] - 1.0) < 1e-9
    tip_dz = u[tip][:, 2].mean()
    # Euler-Bernoulli: δ = P L³ / (3 E I); E=2μ=210 (λ=0 ⇒ ν=0),
    # I = h⁴/12, P = traction × h² = -0.01·0.0625
    E, h = 210.0, 0.25
    I = h ** 4 / 12
    P = -0.01 * h * h
    delta = P / (3 * E * I)
    assert tip_dz < 0  # bends down
    # P1 tets are stiff: expect 40–100% of beam-theory deflection
    assert 0.35 * abs(delta) < abs(tip_dz) < 1.3 * abs(delta), (tip_dz, delta)
    # compliance equals f·u (energy identity)
    c = solver.compliance()
    f_dot_u = float(np.sum(np.asarray(solver.force) * u))
    np.testing.assert_allclose(c, f_dot_u, rtol=1e-5)
    assert c > 0


def test_jax_solver_matches_scipy():
    mesh, ref = _beam_problem(nx=9, ny=4, nz=4)
    _, got = _beam_problem(nx=9, ny=4, nz=4, method="jax")
    u_ref = np.asarray(ref.u)
    u_got = np.asarray(got.u)
    denom = np.abs(u_ref).max()
    assert np.abs(u_got - u_ref).max() / denom < 5e-3


def test_volume_shape_derivative_fd():
    field, sp, org = sphere_field(20)
    mesh = stuff_sdf_grid(field, sp, org)
    solver = ElasticitySolver(mesh.vertices, mesh.tets, 0.0, 105.0)
    bf = mesh.boundary_faces()
    rng = np.random.default_rng(0)
    # smooth vector field θ(x)
    theta = np.stack([
        0.3 + 0.2 * mesh.vertices[:, 1],
        0.1 * np.sin(mesh.vertices[:, 0] * 2),
        -0.2 + 0.1 * mesh.vertices[:, 2] ** 2,
    ], axis=1)
    dv = solver.volume_shape_derivative(bf, theta)

    eps = 1e-4
    def vol_at(sign):
        m = TetMesh(mesh.vertices + sign * eps * theta, mesh.tets, mesh.edge_lo,
                    mesh.edge_hi, mesh.t, mesh.centroid_sources)
        return m.total_volume()
    fd = (vol_at(+1) - vol_at(-1)) / (2 * eps)
    np.testing.assert_allclose(dv, fd, rtol=2e-2)


def test_compliance_shape_derivative_fd():
    # cantilever-ish sphere cap: fix bottom, load top, perturb the free boundary
    field, sp, org = sphere_field(16, r=0.7)
    mesh = stuff_sdf_grid(field, sp, org)
    verts = mesh.vertices

    def make_solver(v):
        s = ElasticitySolver(v, mesh.tets, 0.0, 105.0)
        s.set_essential_vertices(v[:, 2] < -0.5)
        bf = mesh.boundary_faces()
        top = bf[v[bf].mean(axis=1)[:, 2] > 0.5]
        s.set_surface_load(top, np.array([0.0, 0.0, -0.01]))
        s.solve(method="scipy", rel_tol=1e-12, max_iter=20000)
        return s, bf

    s0, bf = make_solver(verts)
    c0 = s0.compliance()

    # θ: smooth bump on the lateral boundary, zero near BC/load regions
    z = verts[:, 2]
    w = np.exp(-((z) ** 2) / 0.05)  # active near equator only
    normals_dir = verts / np.maximum(np.linalg.norm(verts, axis=1, keepdims=True), 1e-9)
    theta = w[:, None] * normals_dir * 0.5
    dc = s0.compliance_shape_derivative(bf, theta)

    eps = 2e-3
    cp = make_solver(verts + eps * theta)[0].compliance()
    cm = make_solver(verts - eps * theta)[0].compliance()
    fd = (cp - cm) / (2 * eps)
    # The continuum boundary formula and the discrete FD differ by a
    # persistent ~1.2 factor at practical resolutions (P1 traction-free
    # boundary + nodal SED projection are both O(h); the reference uses
    # the identical projection+integral, MFEMLinearElasticity.py:343-369,
    # and validated only visually). Require correct sign and a ratio in
    # a tight band around that plateau.
    assert np.sign(fd) == np.sign(dc)
    ratio = dc / fd
    assert 1.0 < ratio < 1.4, ratio


def test_mechanism_singular_raises():
    """A loaded component disconnected from the fixed plane is a
    mechanism: every solver level (ILU ladder, direct LU, AMG) must
    fail and the solve must raise FEMSolveDiverged instead of
    returning garbage compliance (round-4 driver contract)."""
    from deepsdf_tpu.opt.fem import FEMSolveDiverged

    L, h = 1.0, 0.25
    a = box_mesh(9, 4, 4, L, h)
    b = box_mesh(9, 4, 4, L, h)
    off = b.vertices.copy()
    off[:, 2] += 1.0  # float the second box above the first
    verts = np.vstack([a.vertices, off])
    tets = np.vstack([a.tets, b.tets + len(a.vertices)])
    solver = ElasticitySolver(verts, tets, lam=0.0, mu=105.0)
    solver.set_essential_vertices(
        (verts[:, 0] < 1e-9) & (verts[:, 2] < 0.5))  # fix box A only
    bf_b = b.boundary_faces() + len(a.vertices)
    centers = verts[bf_b].mean(axis=1)
    tip_faces = bf_b[centers[:, 0] > L - 1e-9]  # load the FLOATING box
    solver.set_surface_load(tip_faces, np.array([0.0, 0.0, -0.01]))
    with pytest.raises(FEMSolveDiverged):
        solver.solve(method="scipy", rel_tol=1e-10)


def test_unloaded_island_removed_and_solved():
    """An UNLOADED component disconnected from the fixed plane is
    debris, not a mechanism: island removal (fem.py round 4) drops its
    dofs (u=0 there) and the anchored structure solves to the same
    displacements as if the debris never existed."""
    L, h = 1.0, 0.25
    a = box_mesh(9, 4, 4, L, h)
    mesh_ref, solver_ref = _beam_problem(nx=9, ny=4, nz=4)  # anchored box alone

    b = box_mesh(9, 4, 4, L, h)
    off = b.vertices.copy()
    off[:, 2] += 1.0  # float the second box above the first, no load
    verts = np.vstack([a.vertices, off])
    tets = np.vstack([a.tets, b.tets + len(a.vertices)])
    solver = ElasticitySolver(verts, tets, lam=0.0, mu=105.0)
    solver.set_essential_vertices(
        (verts[:, 0] < 1e-9) & (verts[:, 2] < 0.5))  # fix box A only
    bf_a = a.boundary_faces()
    centers = verts[bf_a].mean(axis=1)
    tip_faces = bf_a[centers[:, 0] > L - 1e-9]  # load the ANCHORED box
    solver.set_surface_load(tip_faces, np.array([0.0, 0.0, -0.01]))
    solver.solve(method="scipy", rel_tol=1e-10)

    u = np.asarray(solver.u)
    nA = len(a.vertices)
    assert np.abs(u[nA:]).max() == 0.0  # debris pinned at zero
    u_ref = np.asarray(solver_ref.u)
    denom = np.abs(u_ref).max()
    assert np.abs(u[:nA] - u_ref).max() / denom < 1e-6
    assert solver.compliance() > 0


def test_island_removal_jax_path():
    """Round-5 port: the accelerator path must survive detached designs
    exactly like the scipy path — unloaded debris is pinned to u=0 and
    the anchored structure solves unchanged; a LOADED detached
    component raises FEMSolveDiverged up front instead of stalling CG
    on an exactly singular system."""
    from deepsdf_tpu.opt.fem import FEMSolveDiverged

    L, h = 1.0, 0.25
    a = box_mesh(9, 4, 4, L, h)
    mesh_ref, solver_ref = _beam_problem(nx=9, ny=4, nz=4)

    b = box_mesh(9, 4, 4, L, h)
    off = b.vertices.copy()
    off[:, 2] += 1.0
    verts = np.vstack([a.vertices, off])
    tets = np.vstack([a.tets, b.tets + len(a.vertices)])

    # unloaded debris: solves, debris at exactly zero
    solver = ElasticitySolver(verts, tets, lam=0.0, mu=105.0)
    solver.set_essential_vertices(
        (verts[:, 0] < 1e-9) & (verts[:, 2] < 0.5))
    bf_a = a.boundary_faces()
    centers = verts[bf_a].mean(axis=1)
    tip_faces = bf_a[centers[:, 0] > L - 1e-9]
    solver.set_surface_load(tip_faces, np.array([0.0, 0.0, -0.01]))
    solver.solve(method="jax", rel_tol=1e-8)
    u = np.asarray(solver.u)
    nA = len(a.vertices)
    assert np.abs(u[nA:]).max() == 0.0
    u_ref = np.asarray(solver_ref.u)
    assert np.abs(u[:nA] - u_ref).max() / np.abs(u_ref).max() < 1e-5

    # loaded detached component: free body, must raise
    solver2 = ElasticitySolver(verts, tets, lam=0.0, mu=105.0)
    solver2.set_essential_vertices(
        (verts[:, 0] < 1e-9) & (verts[:, 2] < 0.5))
    bf_b = b.boundary_faces() + len(a.vertices)
    centers_b = verts[bf_b].mean(axis=1)
    tip_faces_b = bf_b[centers_b[:, 0] > L - 1e-9]
    solver2.set_surface_load(tip_faces_b, np.array([0.0, 0.0, -0.01]))
    with pytest.raises(FEMSolveDiverged):
        solver2.solve(method="jax", rel_tol=1e-8)


def test_sticky_level_buckets_track_mesh_drift():
    # Trimmed-lattice meshes change ndof every optimizer iteration; the
    # solver-level stickiness must survive that drift (an exact-ndof key
    # re-paid a doomed weak-ILU attempt every iteration — round 5) while
    # still separating unrelated problem sizes (tests vs production).
    from deepsdf_tpu.opt.fem import _size_bucket
    base = 300_000
    assert _size_bucket(base) == _size_bucket(int(base * 1.01))
    assert _size_bucket(base) == _size_bucket(int(base * 0.99))
    assert _size_bucket(base) != _size_bucket(base * 10)
    assert _size_bucket(900) != _size_bucket(base)
