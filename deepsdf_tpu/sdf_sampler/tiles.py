"""Parametric microstructure tile generators.

Re-implementations of the reference's splinepy-based tiles
(ref: sdf_sampler/snappy_3d.py:7-580, sdf_sampler/double_lattice_extruded.py:8-389)
from their geometric specifications:

* ``Snappy3D`` — snap-through truss: 4 corner blocks, 2 center blocks,
  and 4 cubic-Bezier beams, extruded through thickness with a
  quadratic bow of magnitude ``thickness`` in the mid-layer
  (ref snappy_3d.py:290-580). Built as Bezier volume patches and
  meshed via multipatch boundary extraction — same pipeline shape as
  the reference's ``sp.helpme.extract.faces``.

* ``DoubleLatticeExtruded`` — planar lattice (frame ring + two diagonal
  bands of thicknesses t1/t2, ref double_lattice_extruded.py:8-250)
  extruded through thickness. The solid is an exact CSG region, so
  here it is expressed as an analytic signed distance (exact member
  SDFs combined with min/max; deviation from the reference's
  mesh-distance only beyond concave edge intersections) plus a
  marching-tets surface mesh for artifact parity. The through
  direction is y, matching the reference optimization runs' tiling
  [8,1,4] (lattice carries x–z bending).

Both expose ``create_surface_mesh(...)`` → (verts, faces) in [-1,1]³
(the data-gen scripts' scaling, ref 10_gen...py:29-31) ready for
``SDFfromMesh`` or direct analytic sampling.
"""

from __future__ import annotations

import numpy as np

from ..ops.bspline import Bezier
from .multipatch import extract_boundary_mesh


# ---------------------------------------------------------------- Snappy3D

class Snappy3D:
    """Snap-through tile (ref snappy_3d.py:7-580)."""

    def create_tile(self, parameters=None, parameter_sensitivities=None,
                    contact_length: float = 0.1, a: float = 0.1, b: float = 0.1,
                    c: float = 0.3, r: float = 0.15, closure=None, **kwargs):
        """Returns (patch_list, None); patches are Bezier volumes in
        [0,1]³. Parameter = mid-layer bow ``thickness``
        (ref snappy_3d.py:290-380 validation rules)."""
        for param in (a, b, c, r, contact_length):
            if not isinstance(param, float):
                raise ValueError(f"Invalid Type, {param} is not float")
            if param < 0:
                raise ValueError("Invalid parameter, must be > 0.")
        if not (0 < contact_length < 0.49):
            raise ValueError("The length of a side must be in (0.01, 0.49)")
        if not (r + contact_length) < 0.5:
            raise ValueError(
                "Inconsistent parameters, must fulfill : 2*r + contact_length < 0.5")
        if not ((2 * c + b) < 1.0) or a > c:
            raise ValueError("Inconsistent parameters, must be 2*c<1-c and a<c")
        if parameters is None:
            parameters = np.array([[0.4]])
        thickness = float(np.asarray(parameters).reshape(-1)[0])

        cl2 = contact_length * 0.5
        cl2i = 1.0 - cl2
        half = 0.5

        def rect(x0, x1, y0, y1):
            """2-D bilinear block patch (first-dim-fastest cps)."""
            return Bezier([1, 1], np.array(
                [[x0, y0], [x1, y0], [x0, y1], [x1, y1]], dtype=np.float64))

        def beam(x0, y0, x1, y1, h):
            """Cubic-in-x ruled strip of height h from (x0,y0) to (x1,y1)
            with horizontal end tangents of length r."""
            bot = np.array([[x0, y0], [x0 + r, y0], [x1 - r, y1], [x1, y1]])
            top = bot + [0.0, h]
            return Bezier([3, 1], np.concatenate([bot, top], axis=0))

        # 2-D patch layout (x = horizontal, y = vertical of the truss plane)
        patches2d = [
            rect(0.0, cl2, 0.0, b),                      # 0 bottom-left block
            rect(cl2i, 1.0, 0.0, b),                     # 1 bottom-right block
            rect(0.0, cl2, 1.0 - a, 1.0),                # 2 top-left block
            rect(cl2i, 1.0, 1.0 - a, 1.0),               # 3 top-right block
            rect(half - cl2, half + cl2, half - b, half),  # 4 center lower
            rect(half - cl2, half + cl2, half, half + a),  # 5 center upper
            beam(cl2, 0.0, half - cl2, half - b, b),     # 6 lower-left beam
            # lower-right beam: mirror of lower-left shifted to (0.5, 0)
            None,                                         # placeholder, built below
            beam(cl2, 1.0 - a, half - cl2, half, a),     # 8 upper-left beam
            None,                                         # 9 upper-right beam
        ]
        # lower-right: from center-lower up-slope to bottom-right region,
        # ref spline_8: left end at (0.5+cl2, 0.5-b), right end at (1-cl2, 0)
        bot = np.array([
            [half + cl2, half - b], [half + cl2 + r, half - b],
            [cl2i - r, 0.0], [cl2i, 0.0]])
        patches2d[7] = Bezier([3, 1], np.concatenate([bot, bot + [0.0, b]], axis=0))
        # upper-right, ref spline_10: from center-upper to top-right
        bot = np.array([
            [half + cl2, half], [half + cl2 + r, half],
            [cl2i - r, 1.0 - a], [cl2i, 1.0 - a]])
        patches2d[9] = Bezier([3, 1], np.concatenate([bot, bot + [0.0, a]], axis=0))

        # extrude along z, elevate to quadratic through thickness
        vols = [p.extruded([0.0, 0.0, 1.0]).elevate_degrees([2]) for p in patches2d]

        # mid-layer bow (ref snappy_3d.py:519-579): beams bow by ±thickness
        # in y at their ends; block faces that meet beam ends bow to match.
        vec = np.array([0.0, thickness, 0.0])

        def shift(patch_idx, cp_indices, sign):
            cp = vols[patch_idx].control_points
            cp[np.asarray(cp_indices)] += sign * vec
            vols[patch_idx] = Bezier(vols[patch_idx].degrees, cp)

        # beams: (4,2,3) grids, flat index i + 4j + 8k; mid layer k=1
        shift(6, [10, 11], -1)   # far-end (center side) bottom edge down
        shift(6, [12, 13], +1)   # near-end top edge up
        shift(7, [8, 9], -1)     # near-end (center side) bottom edge down
        shift(7, [14, 15], +1)   # far-end top edge up
        shift(8, [8, 9], -1)
        shift(8, [14, 15], +1)
        shift(9, [10, 11], -1)
        shift(9, [12, 13], +1)
        # blocks: (2,2,3) grids, flat index i + 2j + 4k; mid layer k=1
        shift(0, [6, 7], +1)     # bottom-left top edge
        shift(1, [6, 7], +1)     # bottom-right top edge
        shift(2, [4, 5], -1)     # top-left bottom edge
        shift(3, [4, 5], -1)     # top-right bottom edge
        shift(4, [4, 5], -1)     # center-lower bottom edge
        shift(5, [6, 7], +1)     # center-upper top edge

        return vols, None

    def create_surface_mesh(self, parameters=None, resolution: int = 20, **kwargs):
        """Boundary surface mesh in [-1,1]³ (data-gen scaling,
        ref 08_facade_microtile_creation.py:22-25)."""
        patches, _ = self.create_tile(parameters=parameters, **kwargs)
        verts, faces = extract_boundary_mesh(patches, resolution)
        return verts * 2.0 - 1.0, faces


# ------------------------------------------------- DoubleLatticeExtruded

def _euclid_box_sdf(p2, lo, hi):
    """Exact Euclidean 2-D box SDF."""
    c = (np.asarray(lo) + np.asarray(hi)) / 2.0
    b = (np.asarray(hi) - np.asarray(lo)) / 2.0
    q = np.abs(p2 - c) - b
    outside = np.linalg.norm(np.maximum(q, 0.0), axis=-1)
    inside = np.minimum(np.maximum(q[..., 0], q[..., 1]), 0.0)
    return outside + inside


class DoubleLatticeExtruded:
    """Planar double lattice, extruded through y
    (ref double_lattice_extruded.py:8-250)."""

    PARAM_MAX = 0.5 / (1 + np.sqrt(2))

    def _check(self, parameters):
        parameters = np.asarray(parameters, dtype=np.float64).reshape(1, -1)
        if parameters.shape[1] == 1:
            parameters = np.repeat(parameters, 2, axis=1)
        if not (np.all(parameters > 0) and np.all(parameters < self.PARAM_MAX)):
            raise ValueError(
                "Parameters must be between 0.01 and 0.5/(1+sqrt(2))=0.207")
        return float(parameters[0, 0]), float(parameters[0, 1])

    def sdf2d(self, p2: np.ndarray, t1: float, t2: float) -> np.ndarray:
        """Exact-member CSG SDF of the planar lattice in [0,1]²:
        frame ring of thickness t1 ∪ two diagonal bands of half-width
        t2 (band edges at |x−y| = √2·t2, ref a03 = t1 + √2 t2)."""
        outer = _euclid_box_sdf(p2, (0, 0), (1, 1))
        inner = _euclid_box_sdf(p2, (t1, t1), (1 - t1, 1 - t1))
        ring = np.maximum(outer, -inner)
        x, y = p2[..., 0], p2[..., 1]
        band1 = np.abs(x - y) / np.sqrt(2.0) - t2
        band2 = np.abs(x + y - 1.0) / np.sqrt(2.0) - t2
        bands = np.minimum(np.maximum(band1, outer), np.maximum(band2, outer))
        return np.minimum(ring, bands)

    def sdf(self, parameters):
        """Analytic SDF callable over [-1,1]³ queries (through dir = y)."""
        t1, t2 = self._check(parameters)

        def f(q):
            q = np.asarray(q, dtype=np.float64)
            p = (q + 1.0) / 2.0
            plane = self.sdf2d(p[:, [0, 2]], t1, t2)
            thick = np.abs(p[:, 1] - 0.5) - 0.5
            return 2.0 * np.maximum(plane, thick).reshape(-1, 1)
        return f

    def create_surface_mesh(self, parameters=None, resolution: int = 160, **kwargs):
        """Surface mesh in [-1,1]³ via marching tets on the analytic SDF."""
        from ..mesh.marching import marching_tetrahedra

        sdf = self.sdf(parameters if parameters is not None else [[0.1, 0.1]])
        lin = np.linspace(-1.02, 1.02, resolution)
        X, Y, Z = np.meshgrid(lin, lin, lin, indexing="ij")
        q = np.stack([X.ravel(), Y.ravel(), Z.ravel()], 1)
        grid = sdf(q).reshape(resolution, resolution, resolution)
        h = 2.04 / (resolution - 1)
        verts, faces, _, _ = marching_tetrahedra(grid, 0.0, (h, h, h))
        return verts - 1.02, faces

    @staticmethod
    def _patches2d(thick_vert_hor, thick_diagonal, cl, v_one_half, v_one,
                   v_zero):
        """The reference's 20 bilinear patches in the lattice plane
        (ref double_lattice_extruded.py:105-377). Evaluated twice: with
        real constants for the geometry, and with the constants zeroed
        and thicknesses = sensitivities for each derivative patch list
        (the reference's i_derivative loop, :85-104)."""
        s2 = np.sqrt(2.0)
        a01 = v_zero
        a02 = thick_vert_hor
        a03 = thick_vert_hor + thick_diagonal * s2
        a04 = (v_one - cl) * 0.5
        a05 = v_one_half - thick_diagonal * s2
        a06 = v_one_half
        a07 = v_one_half + thick_diagonal * s2
        a08 = (v_one + cl) * 0.5
        a09 = v_one - (thick_vert_hor + thick_diagonal * s2)
        a10 = v_one - thick_vert_hor
        a11 = v_one
        quads = [
            [[a01, a01], [a02, a02], [a01, a04], [a02, a03]],
            [[a01, a01], [a04, a01], [a02, a02], [a03, a02]],
            [[a04, a01], [a08, a01], [a03, a02], [a09, a02]],
            [[a08, a01], [a11, a01], [a09, a02], [a10, a02]],
            [[a10, a02], [a11, a01], [a10, a03], [a11, a04]],
            [[a11, a04], [a11, a08], [a10, a03], [a10, a09]],
            [[a10, a09], [a11, a08], [a10, a10], [a11, a11]],
            [[a09, a10], [a10, a10], [a08, a11], [a11, a11]],
            [[a03, a10], [a09, a10], [a04, a11], [a08, a11]],
            [[a02, a10], [a03, a10], [a01, a11], [a04, a11]],
            [[a01, a08], [a02, a09], [a01, a11], [a02, a10]],
            [[a01, a04], [a02, a03], [a01, a08], [a02, a09]],
            [[a02, a09], [a05, a06], [a02, a10], [a06, a06]],
            [[a02, a10], [a06, a06], [a03, a10], [a06, a07]],
            [[a02, a02], [a06, a06], [a02, a03], [a05, a06]],
            [[a02, a02], [a03, a02], [a06, a06], [a06, a05]],
            [[a09, a02], [a10, a02], [a06, a05], [a06, a06]],
            [[a06, a06], [a10, a02], [a07, a06], [a10, a03]],
            [[a06, a06], [a07, a06], [a10, a10], [a10, a09]],
            [[a06, a06], [a10, a10], [a06, a07], [a09, a10]],
        ]
        return [np.asarray(q, dtype=np.float64) for q in quads]

    def create_tile(self, parameters=None, parameter_sensitivities=None,
                    contact_length: float = 0.5, **kwargs):
        """Reference-parity patch construction: 20 bilinear patches in
        the x–z plane, extruded along y (ref
        double_lattice_extruded.py:22-389). Returns
        ``(patches, derivatives)`` where derivatives is a list (one per
        design variable) of patch lists whose control points are
        d(cp)/d(variable) — the reference's ``parameter_sensitivities``
        contract: sensitivity patches reuse the same formulas with all
        geometric constants zeroed and the thicknesses replaced by the
        per-variable sensitivities (ref :85-104).
        ``parameter_sensitivities`` shape: (1, n_params, n_derivatives).
        """
        if not isinstance(contact_length, float):
            raise ValueError("Invalid Type")
        if not (0.0 < contact_length < 1.0):
            raise ValueError("Contact length must be in (0.,1.)")
        if parameters is None:
            parameters = np.ones((1, 2)) * 0.1
        parameters = np.asarray(parameters, dtype=np.float64)
        idx2 = 1 if parameters.shape[1] > 1 else 0
        if not (np.all(parameters > 0) and np.all(parameters < self.PARAM_MAX)):
            raise ValueError(
                "Parameters must be between 0.01 and 0.5/(1+sqrt(2))=0.207")

        def build(th_vh, th_d, real):
            cl = contact_length if real else 0.0
            one = 1.0 if real else 0.0
            quads = self._patches2d(th_vh, th_d, cl, 0.5 * one, one, 0.0)
            patches = []
            for q in quads:
                cp3 = np.insert(q, 1, 0.0, axis=1)      # (x, z) → (x, 0, z)
                patches.append(Bezier([1, 1], cp3).extruded([0.0, 1.0 if real else 0.0, 0.0]))
            return patches

        splines = build(parameters[0, 0], parameters[0, idx2], real=True)
        derivatives = None
        if parameter_sensitivities is not None:
            sens = np.asarray(parameter_sensitivities, dtype=np.float64)
            if sens.ndim != 3:
                raise ValueError(
                    "parameter_sensitivities must be (1, n_params, n_derivs)")
            derivatives = [
                build(sens[0, 0, i], sens[0, idx2, i], real=False)
                for i in range(sens.shape[2])
            ]
        return splines, derivatives
