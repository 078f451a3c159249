"""Concrete boundary-value problems.

``CantileverBeam`` — parity with ref analysis/problems/CantileverBeam.py:
13-177: essential BC on marker 1 (x≈0), surface load (0,0,-0.01) on
marker 2 (z≈top), λ=0, μ=105, compliance/volume + their shape
derivatives per design variable.
"""

from __future__ import annotations

import logging
import os

import numpy as np

from .fem import ElasticitySolver
from .geometry import read_mfem_mesh

logger = logging.getLogger(__name__)


class CantileverBeam:
    LAMBDA = 0.0
    MU = 105.0
    SURFACE_LOAD = np.array([0.0, 0.0, -0.01])

    def __init__(self, simulation_folder=None):
        self.simulation_folder = simulation_folder
        self.solver: ElasticitySolver | None = None

    # ---- mesh input ----

    def read_mesh(self, mesh_filename: str) -> None:
        """Load an MFEM v1.0 tet mesh (ref :19-23)."""
        self.vertices, self.tets, self.bfaces, self.bmarkers = \
            read_mfem_mesh(mesh_filename)

    def set_mesh(self, vertices, tets, boundary_faces, boundary_markers) -> None:
        self.vertices = np.asarray(vertices)
        self.tets = np.asarray(tets)
        self.bfaces = np.asarray(boundary_faces)
        self.bmarkers = np.asarray(boundary_markers)

    # ---- setup / solve ----

    def set_up(self, ref_levels: int = 0, order: int = 1) -> None:
        """ref :34-86: fix marker 1, load marker 2."""
        solver = ElasticitySolver(self.vertices, self.tets, self.LAMBDA, self.MU)
        fixed_faces = self.bfaces[self.bmarkers == 1]
        ess = np.zeros(len(self.vertices), dtype=bool)
        ess[np.unique(fixed_faces)] = True
        solver.set_essential_vertices(ess)
        load_faces = self.bfaces[self.bmarkers == 2]
        solver.set_surface_load(load_faces, self.SURFACE_LOAD)
        self.solver = solver

    def solve(self, method: str = "scipy", u0=None) -> None:
        self.solver.solve(method=method, u0=u0)
        u = np.asarray(self.solver.u)
        self.u_data = u
        logger.debug("Finished solution. Max |u|: %g", np.abs(u).max())
        if self.simulation_folder is not None:
            np.savez(os.path.join(str(self.simulation_folder), "solution.npz"),
                     u=u, vertices=self.vertices, tets=self.tets)

    # ---- outputs (ref :116-177) ----

    def compute_volume(self, dTheta=None):
        vol = self.solver.volume()
        der = None
        if dTheta is not None:
            der = self._boundary_normal_batch(np.asarray(dTheta))
        return vol, der

    def compute_compliance(self, dTheta=None):
        c = self.solver.compliance()
        der = None
        if dTheta is not None:
            sed_v = self.solver.vertex_sed()
            der = self._boundary_normal_batch(
                -sed_v[:, None, None] * np.asarray(dTheta))
        return c, der

    def _boundary_normal_batch(self, theta_vnd: np.ndarray) -> np.ndarray:
        """∫_Γ θ_d·n for each design dir d; θ_vnd: (V, 3, D) → (D,).
        Shares ElasticitySolver.boundary_normal_integral's kernel."""
        return self.solver.boundary_normal_integral(self.bfaces, theta_vnd)
