"""Tensor-product B-spline / Bezier evaluation in JAX.

Replaces the reference's splinepy dependency for the latent-field
interpolation (ref: analysis/geometry.py:40-56 builds a Bezier-degree
BSpline over [-1,1]³ and ``uniform_refine``s it; ref deep_sdf/mesh.py
:259,:398-402 evaluates it and its basis matrix). Everything here is
pure JAX — the latent field is differentiable end-to-end on device,
which is what makes the single-jvp vertex-jacobian path possible
(see mesh/diff_mesh.py) instead of the reference's O(L·C) re-meshing
loop (ref mesh.py:405-421).

Conventions (matching splinepy):
  * open knot vectors; clamped Bezier when no interior knots
  * control points ordered first-parametric-dimension-fastest:
    flat index = i0 + n0*(i1 + n1*i2)
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def bspline_basis_1d(u, knots: np.ndarray, degree: int):
    """All basis functions of one dim at query points ``u`` (N,) →
    (N, n_basis) dense matrix, n_basis = len(knots) - degree - 1.

    Vectorized Cox–de Boor; the last span is right-closed so u at the
    domain end evaluates to 1 on the final basis function.
    """
    kv = jnp.asarray(knots, dtype=jnp.float32)
    u = jnp.asarray(u, dtype=jnp.float32)
    m = kv.shape[0]
    n0 = m - 1
    last = kv[-1]

    # degree-0: indicator of [kv[i], kv[i+1]), right-closed at domain end
    left = kv[:-1][None, :]
    right = kv[1:][None, :]
    uu = u[:, None]
    B = jnp.where(
        (uu >= left) & ((uu < right) | ((uu >= last) & (right >= last) & (left < right))),
        1.0, 0.0)

    for k in range(1, degree + 1):
        n_new = n0 - k
        kv_i = kv[:n_new]
        kv_ik = kv[k:k + n_new]
        kv_i1 = kv[1:1 + n_new]
        kv_ik1 = kv[k + 1:k + 1 + n_new]
        d1 = kv_ik - kv_i
        d2 = kv_ik1 - kv_i1
        t1 = jnp.where(d1 > 0, (uu - kv_i[None, :]) / jnp.where(d1 > 0, d1, 1.0)[None, :], 0.0)
        t2 = jnp.where(d2 > 0, (kv_ik1[None, :] - uu) / jnp.where(d2 > 0, d2, 1.0)[None, :], 0.0)
        B = t1 * B[:, :n_new] + t2 * B[:, 1:1 + n_new]
    return B


class BSpline:
    """Tensor-product B-spline volume/field with vector-valued control
    points (API subset of splinepy.BSpline used by the reference)."""

    def __init__(self, degrees, knot_vectors, control_points):
        self.degrees = [int(d) for d in degrees]
        self.knot_vectors = [np.asarray(kv, dtype=np.float64) for kv in knot_vectors]
        self.control_points = np.asarray(control_points, dtype=np.float64)
        self._check()

    def _check(self):
        n = 1
        for d, kv in zip(self.degrees, self.knot_vectors):
            n *= len(kv) - d - 1
        if n != self.control_points.shape[0]:
            raise ValueError(
                f"control point count {self.control_points.shape[0]} != expected {n}")

    @property
    def para_dim(self) -> int:
        return len(self.degrees)

    @property
    def dim(self) -> int:
        return self.control_points.shape[1]

    @property
    def control_mesh_resolutions(self) -> list[int]:
        return [len(kv) - d - 1 for d, kv in zip(self.degrees, self.knot_vectors)]

    # ---- evaluation ----

    def basis_matrix(self, queries) -> jnp.ndarray:
        """Dense (N, n_control_points) basis matrix — the reference's
        ``basis_and_support`` + ``make_matrix`` (ref mesh.py:400-402)."""
        q = jnp.atleast_2d(jnp.asarray(queries, dtype=jnp.float32))
        per_dim = [
            bspline_basis_1d(q[:, d], self.knot_vectors[d], self.degrees[d])
            for d in range(self.para_dim)
        ]
        B = per_dim[0]
        for d in range(1, self.para_dim):
            # first dim fastest: flat index = i_prev + (prod so far)*i_d,
            # i.e. the new dim must be the SLOW axis of the outer product
            B = (per_dim[d][:, :, None] * B[:, None, :]).reshape(q.shape[0], -1)
        return B

    def evaluate(self, queries) -> np.ndarray:
        """(N, para_dim) → (N, dim) field values."""
        B = self.basis_matrix(queries)
        return np.asarray(B @ jnp.asarray(self.control_points, dtype=jnp.float32))

    def evaluate_jax(self, queries, control_points) -> jnp.ndarray:
        """Differentiable evaluation with explicit control points."""
        return self.basis_matrix(queries) @ control_points

    def basis(self, queries) -> np.ndarray:
        return np.asarray(self.basis_matrix(queries))

    # ---- knot insertion / refinement ----

    def insert_knot(self, para_dim: int, value: float) -> None:
        """Boehm single-knot insertion along ``para_dim`` (host-side)."""
        p = self.degrees[para_dim]
        kv = self.knot_vectors[para_dim]
        res = self.control_mesh_resolutions
        n = res[para_dim]
        # find span k: kv[k] <= value < kv[k+1]
        k = int(np.searchsorted(kv, value, side="right") - 1)
        k = min(max(k, p), len(kv) - p - 2)

        # reshape control points to (n0, n1, n2, dim) first-dim-fastest
        shape = res + [self.dim]
        cp = self.control_points.reshape(*reversed(res), self.dim)  # (n2, n1, n0, dim)
        cp = np.moveaxis(cp, range(self.para_dim), list(reversed(range(self.para_dim))))
        # cp now (n0, n1, n2, dim)
        cp = np.moveaxis(cp, para_dim, 0)  # target dim first: (n, ..., dim)

        new = np.empty((n + 1,) + cp.shape[1:], dtype=cp.dtype)
        new[:k - p + 1] = cp[:k - p + 1]
        for i in range(k - p + 1, k + 1):
            denom = kv[i + p] - kv[i]
            alpha = (value - kv[i]) / denom if denom > 0 else 0.0
            new[i] = alpha * cp[i] + (1 - alpha) * cp[i - 1]
        new[k + 1:] = cp[k:]

        new = np.moveaxis(new, 0, para_dim)  # back to (n0, n1, n2, dim)
        new = np.moveaxis(new, range(self.para_dim), list(reversed(range(self.para_dim))))
        self.control_points = new.reshape(-1, self.dim)
        self.knot_vectors[para_dim] = np.insert(kv, k + 1, value)

    def uniform_refine(self, para_dims=None) -> None:
        """splinepy-compatible: each occurrence of a dim in ``para_dims``
        inserts the midpoint of every current span of that dim
        (ref usage: geometry.py:55 with config lists like [0,0,2])."""
        if para_dims is None:
            para_dims = list(range(self.para_dim))
        if np.isscalar(para_dims):
            para_dims = [para_dims]
        for d in para_dims:
            kv = self.knot_vectors[int(d)]
            spans = np.unique(kv)
            mids = (spans[:-1] + spans[1:]) / 2.0
            for m in mids:
                self.insert_knot(int(d), float(m))


def latent_field_spline(latent_dim: int, degrees, refinement) -> BSpline:
    """Latent B-spline over the macro domain [-1,1]³, zero-initialized
    control points (ref: analysis/geometry.py:40-56)."""
    n = np.asarray(degrees, dtype=int)
    knot_vectors = [[-1.0] * (d + 1) + [1.0] * (d + 1) for d in n]
    n_initial = int(np.prod(n + 1))
    control_points = np.zeros((n_initial, latent_dim))
    spline = BSpline(degrees=n, knot_vectors=knot_vectors, control_points=control_points)
    spline.uniform_refine(refinement)
    return spline


class Bezier(BSpline):
    """Clamped single-span Bezier patch (splinepy.Bezier analog)."""

    def __init__(self, degrees, control_points):
        knot_vectors = [[0.0] * (int(d) + 1) + [1.0] * (int(d) + 1) for d in degrees]
        super().__init__(degrees, knot_vectors, control_points)

    def _cp_grid(self) -> np.ndarray:
        """Control points as an (n0, n1, ..., dim) grid (first dim fastest)."""
        res = self.control_mesh_resolutions
        grid = self.control_points.reshape(*reversed(res), self.dim)
        return np.moveaxis(grid, range(self.para_dim),
                           list(reversed(range(self.para_dim))))

    @classmethod
    def _from_cp_grid(cls, degrees, grid) -> "Bezier":
        pd = len(degrees)
        g = np.moveaxis(grid, range(pd), list(reversed(range(pd))))
        return cls(degrees, g.reshape(-1, grid.shape[-1]))

    def extruded(self, extrusion_vector) -> "Bezier":
        """Linear extrusion along a geometric vector; adds one parametric
        dim (splinepy create.extruded analog). 2-D control points are
        zero-padded to the vector's dimension first."""
        vec = np.asarray(extrusion_vector, dtype=np.float64)
        cp = self.control_points
        if cp.shape[1] < vec.shape[0]:
            cp = np.hstack([cp, np.zeros((cp.shape[0], vec.shape[0] - cp.shape[1]))])
        layers = np.concatenate([cp, cp + vec[None, :]], axis=0)
        return Bezier(list(self.degrees) + [1], layers)

    def elevate_degree(self, para_dim: int) -> "Bezier":
        """Bezier degree elevation by one along ``para_dim``."""
        grid = self._cp_grid()
        grid = np.moveaxis(grid, para_dim, 0)          # (n, ..., dim)
        p = self.degrees[para_dim]
        n_new = p + 2
        out = np.empty((n_new,) + grid.shape[1:], dtype=grid.dtype)
        out[0] = grid[0]
        out[-1] = grid[-1]
        for i in range(1, p + 1):
            a = i / (p + 1)
            out[i] = a * grid[i - 1] + (1 - a) * grid[i]
        out = np.moveaxis(out, 0, para_dim)
        degrees = list(self.degrees)
        degrees[para_dim] = p + 1
        return Bezier._from_cp_grid(degrees, out)

    def elevate_degrees(self, para_dims) -> "Bezier":
        b = self
        for d in para_dims:
            b = b.elevate_degree(int(d))
        return b
