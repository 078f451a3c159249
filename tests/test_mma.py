"""MMA optimizer tests on analytic constrained problems."""

import numpy as np
import pytest

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


def test_bisect_retry_on_fem_divergence():
    """A step into the 'mechanism region' (x > 0.7 here) raises
    FEMSolveDiverged; MMA must bisect back toward the last accepted
    design and keep optimizing instead of dying (round-4 driver
    contract: mechanism-adjacent steps cost retries, not the run)."""
    from deepsdf_tpu.opt.fem import FEMSolveDiverged

    calls = {"diverged": 0}

    calls["n"] = 0

    def objective(x):
        calls["n"] += 1
        if calls["n"] == 3:  # one transient failure mid-run
            calls["diverged"] += 1
            raise FEMSolveDiverged("transient near-mechanism")
        x = x.reshape(-1)
        return float(np.sum((x - 0.5) ** 2) + 1.0), 2 * (x - 0.5)

    def constraint(x):
        return -1.0, np.zeros(x.size)

    x = MMA().minimize(np.zeros(2), objective, constraint,
                       [(-1.0, 1.0)] * 2, {"deltaIt": 1e-9, "maxIt": 80})
    x = np.asarray(x).reshape(-1)
    assert calls["diverged"] == 1                 # the failure happened
    np.testing.assert_allclose(x, [0.5] * 2, atol=1e-3)   # and recovered


def test_bisect_retry_exhaustion_reraises():
    """If even heavily damped steps diverge (the accepted design sits
    on the mechanism boundary), the exception must propagate so the
    driver can end the run gracefully."""
    from deepsdf_tpu.opt.fem import FEMSolveDiverged

    first = {"done": False}

    def objective(x):
        if not first["done"]:
            first["done"] = True
            x = x.reshape(-1)
            return float(np.sum((x - 1.0) ** 2) + 1.0), 2 * (x - 1.0)
        raise FEMSolveDiverged("boundary")

    def constraint(x):
        return -1.0, np.zeros(x.size)

    with pytest.raises(FEMSolveDiverged):
        MMA().minimize(np.zeros(2), objective, constraint,
                       [(-1.0, 1.0)] * 2, {"deltaIt": 1e-9, "maxIt": 60})
