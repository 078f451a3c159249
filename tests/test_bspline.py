"""B-spline engine tests: scipy cross-check, refinement invariance,
reference control-point layout."""

import numpy as np
import pytest

from deepsdf_tpu.ops.bspline import BSpline, Bezier, bspline_basis_1d, latent_field_spline


def test_basis_matches_scipy():
    from scipy.interpolate import BSpline as ScipyBSpline

    degree = 2
    knots = np.array([0, 0, 0, 0.3, 0.7, 1, 1, 1], dtype=np.float64)
    n_basis = len(knots) - degree - 1
    u = np.linspace(0, 1, 53)
    B = np.asarray(bspline_basis_1d(u, knots, degree))
    assert B.shape == (53, n_basis)
    for i in range(n_basis):
        c = np.zeros(n_basis)
        c[i] = 1.0
        ref = ScipyBSpline(knots, c, degree)(u)
        # scipy extrapolates past the last knot; clamp comparison inside
        np.testing.assert_allclose(B[:-1, i], ref[:-1], atol=1e-6)
    # partition of unity incl. right endpoint
    np.testing.assert_allclose(B.sum(axis=1), 1.0, atol=1e-6)


def test_refinement_preserves_geometry():
    rng = np.random.default_rng(0)
    spline = BSpline(
        degrees=[1, 1, 1],
        knot_vectors=[[-1, -1, 1, 1]] * 3,
        control_points=rng.normal(size=(8, 2)),
    )
    q = rng.uniform(-1, 1, (200, 3))
    before = spline.evaluate(q)
    spline.uniform_refine([0, 0, 2])
    after = spline.evaluate(q)
    np.testing.assert_allclose(after, before, atol=1e-5)
    # reference layout: degrees [1,1,1], refinement [0,0,2] ⇒ 5*2*3 = 30 cpts
    assert spline.control_mesh_resolutions == [5, 2, 3]
    assert spline.control_points.shape == (30, 2)


def test_latent_field_spline_matches_reference_config():
    # opti_double_lattice_8x4 config: degrees [1,1,1], refinement [0,0,2],
    # latent 2 ⇒ 60 design variables (BASELINE.md "60 design vars")
    s = latent_field_spline(2, [1, 1, 1], [0, 0, 2])
    assert s.control_points.shape == (30, 2)
    # 16x1x8 run: refinement [0,0,0,2,2] ⇒ (2^3+1)*2*(2^2+1) = 9*2*5 = 90
    s2 = latent_field_spline(2, [1, 1, 1], [0, 0, 0, 2, 2])
    assert s2.control_mesh_resolutions == [9, 2, 5]


def test_trilinear_field_interpolation():
    # degrees 1, single span: evaluate == trilinear interpolation of corners
    corners = np.array([[float(i0 + 2 * i1 + 4 * i2)]
                        for i2 in (0, 1) for i1 in (0, 1) for i0 in (0, 1)])
    spline = BSpline([1, 1, 1], [[-1, -1, 1, 1]] * 3, corners)
    val = spline.evaluate(np.array([[0.0, 0.0, 0.0]]))[0, 0]
    np.testing.assert_allclose(val, corners.mean(), atol=1e-6)
    val = spline.evaluate(np.array([[-1.0, -1.0, -1.0]]))[0, 0]
    np.testing.assert_allclose(val, 0.0, atol=1e-6)
    val = spline.evaluate(np.array([[1.0, 1.0, 1.0]]))[0, 0]
    np.testing.assert_allclose(val, 7.0, atol=1e-6)


def test_basis_matrix_rows_sum_to_one():
    s = latent_field_spline(3, [2, 1, 1], [0, 1])
    q = np.random.default_rng(1).uniform(-1, 1, (64, 3))
    B = s.basis(q)
    assert B.shape == (64, s.control_points.shape[0])
    np.testing.assert_allclose(B.sum(axis=1), 1.0, atol=1e-5)


def test_bezier_patch():
    # quadratic Bezier curve in 2D
    cp = np.array([[0.0, 0.0], [1.0, 2.0], [2.0, 0.0]])
    bez = Bezier([2], cp)
    mid = bez.evaluate(np.array([[0.5]]))[0]
    np.testing.assert_allclose(mid, [1.0, 1.0], atol=1e-6)
