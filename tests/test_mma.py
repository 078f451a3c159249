"""MMA optimizer tests on analytic constrained problems."""

import numpy as np

from deepsdf_tpu.opt.mma import MMA, mmasub


def test_constrained_quadratic():
    # min Σ(x−2)² s.t. Σx ≤ 1, x∈[-1, 2]³ ⇒ x* = (1/3, 1/3, 1/3)
    def objective(x):
        x = x.reshape(-1)
        return float(np.sum((x - 2.0) ** 2)), 2 * (x - 2.0)

    def constraint(x):
        x = x.reshape(-1)
        return float(np.sum(x) - 1.0), np.ones_like(x)

    x = MMA().minimize(np.zeros(3), objective, constraint,
                       [(-1.0, 2.0)] * 3, {"deltaIt": 1e-9, "maxIt": 200})
    np.testing.assert_allclose(x.reshape(-1), [1 / 3] * 3, atol=1e-3)


def test_unconstrained_corner():
    # min Σ(x−0.5)² with inactive constraint ⇒ x* = 0.5
    def objective(x):
        x = x.reshape(-1)
        return float(np.sum((x - 0.5) ** 2) + 1.0), 2 * (x - 0.5)

    def constraint(x):
        return -1.0, np.zeros(x.size)

    x = MMA().minimize(np.zeros(4), objective, constraint,
                       [(-1.0, 1.0)] * 4, {"deltaIt": 1e-10, "maxIt": 300})
    np.testing.assert_allclose(x.reshape(-1), [0.5] * 4, atol=1e-3)


def test_mmasub_respects_move_limit():
    n, m = 5, 1
    x = np.zeros((n, 1))
    xmin = np.full((n, 1), -0.1)
    xmax = np.full((n, 1), 0.1)
    df0dx = -np.ones((n, 1))  # push x up hard
    out = mmasub(m, n, 1, x, xmin, xmax, x.copy(), x.copy(),
                 np.array([[1.0]]), df0dx, np.array([[-1.0]]), np.zeros((1, n)),
                 [], [], 1, np.zeros((1, 1)), 1e4 * np.ones((1, 1)), np.zeros((1, 1)))
    xnew = out[0]
    assert (xnew <= 0.1 + 1e-9).all() and (xnew >= -0.1 - 1e-9).all()
    assert (xnew > 0.05).all()  # moved toward the bound
