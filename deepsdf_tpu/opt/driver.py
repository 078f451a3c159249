"""Structure-optimization driver (ref: optimization/opti.py:49-282).

Config-driven design loop: caches objective/constraint per design
vector, builds geometry, runs FEM, persists ``results.json`` each
iteration, manages per-iteration simulation folders, and drives
MMA / scipy optimizers.

The reference's cache-key bug — ``_in_cache`` checks the UNROUNDED key
while entries are stored rounded (ref opti.py:107-119,223; SURVEY.md
Appendix A) — is fixed here: one canonical rounded key everywhere.
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
import pathlib
import shutil
import socket
import tempfile
from dataclasses import dataclass

import numpy as np

from .config import Config
from .fem import FEMSolveDiverged
from .geometry import DeepSDFMesh
from .mma import MMA
from .problems import CantileverBeam

logger = logging.getLogger(__name__)


@dataclass
class OptimizationResults:
    compliance: list
    volume: list
    design_vector: list

    def append_result(self, design_vector, volume, compliance):
        self.volume.append(volume)
        self.compliance.append(compliance)
        self.design_vector.append(np.asarray(design_vector).reshape(-1).tolist())


def load_results(folder) -> OptimizationResults:
    with open(pathlib.Path(folder) / "results.json") as f:
        data = json.load(f)
    return OptimizationResults(**data)


class struct_optimization:
    """ref opti.py:49-282."""

    def __init__(self, optimization_folder, experiment_location=None,
                 fem_method: str = "scipy", resume: bool = False):
        self.optimization_folder = pathlib.Path(optimization_folder)
        self.optimization_results = OptimizationResults([], [], [])
        self.iteration = 0
        self.resume = resume
        if resume and (self.optimization_folder / "results.json").exists():
            self.optimization_results = load_results(self.optimization_folder)
            self.iteration = len(self.optimization_results.compliance)
        self.fem_method = fem_method
        if not self.settings_filename.exists():
            raise FileNotFoundError(f"No config.json in {self.optimization_folder}")
        self.load_settings()
        self.cache = {}
        self.logger = logging.getLogger(__name__)
        self.geometry = DeepSDFMesh(self.options["mesh"],
                                    experiment_location=experiment_location)
        self._warm = None  # (sorted grid-identity keys, u rows) of last solve

    # ---- FEM warm start across design iterations ----
    #
    # Every stuffed mesh lives on the SAME reconstruction grid, so a
    # vertex's (edge_lo, edge_hi) pair is a persistent identity across
    # design changes (grid vertices have lo == hi). MMA's ±0.1 move
    # limit keeps consecutive geometries close, so the previous
    # displacement field is an excellent initial iterate for the
    # refined CG — new vertices (fresh crossings/centroids) start at 0.

    def _mesh_keys(self):
        m = self.geometry.volumes
        npts = int(np.prod(self.geometry._dims))
        keys = m.edge_lo.astype(np.int64) * npts + m.edge_hi
        # centroids (edge_lo == -1) have no persistent identity; their
        # negative keys are excluded from matching (warm-start at zero)
        return keys

    def _store_warm_start(self, u):
        keys = self._mesh_keys()
        order = np.argsort(keys)
        self._warm = (keys[order], np.asarray(u)[order])

    def _warm_start_field(self):
        if self._warm is None:
            return None
        pkeys, pu = self._warm
        keys = self._mesh_keys()
        pos = np.searchsorted(pkeys, keys)
        pos_c = np.clip(pos, 0, len(pkeys) - 1)
        hit = (pkeys[pos_c] == keys) & (keys >= 0)
        u0 = np.zeros((len(keys), 3))
        u0[hit] = pu[pos_c[hit]]
        return u0

    # ---- paths ----

    @property
    def settings_filename(self):
        return self.optimization_folder / "config.json"

    @property
    def current_simulation_folder(self) -> pathlib.Path:
        return self.optimization_folder / f"simulation_{self.iteration}"

    @property
    def log_filename(self):
        return self.optimization_folder / "optimization_logs.log"

    def create_temp_current_simulation_folder(self) -> pathlib.Path:
        temp_dir = pathlib.Path(self.options["general"]["temp_dir"])
        os.makedirs(temp_dir, exist_ok=True)
        dirpath = pathlib.Path(tempfile.mkdtemp(dir=temp_dir)) / f"simulation_{self.iteration}"
        os.makedirs(dirpath, exist_ok=True)
        return dirpath

    def move_older_sims_to_temp_dir(self):
        """Archive stale simulation_<i> folders (ref opti.py:75-87)."""
        old_sim_dir = self.optimization_folder / "old_sims"
        i_old = 0
        while os.path.exists(old_sim_dir):
            i_old += 1
            old_sim_dir = self.optimization_folder / f"old_sims_{i_old}"
        entries = os.listdir(self.optimization_folder)
        if any("simulation" in folder for folder in entries):
            os.makedirs(old_sim_dir)
        for folder in entries:
            if "simulation" in folder:
                shutil.move(self.optimization_folder / folder, old_sim_dir / folder)
                self.logger.info("Moving %s to %s", folder, old_sim_dir)

    # ---- config ----

    def load_settings(self):
        self.options = Config.load_json(self.settings_filename)
        for key in ("mesh", "optimization", "general"):
            if key not in self.options:
                raise KeyError(f"Key {key} not found in config.json")
        method = self.options["optimization"]["method"]
        available = ["BFGS", "COBYLA", "MMA"]
        if method not in available:
            raise ValueError(
                f"Optimizer {method} method not available. Available methods are {available}")

    # ---- objective/constraint with caching ----

    @staticmethod
    def _key(x) -> str:
        return str(np.asarray(x).reshape(-1).round(8))

    def objective(self, x):
        if self._key(x) not in self.cache:
            self._compute_solution(np.asarray(x).reshape(-1))
        return self.cache[self._key(x)]["objective"]

    def constraint(self, x):
        if self._key(x) not in self.cache:
            self._compute_solution(np.asarray(x).reshape(-1))
        return self.cache[self._key(x)]["constraint"]

    def set_x0(self):
        """ref opti.py:121-137."""
        n_control_points = self.geometry.get_n_control_points()
        n_latent = self.geometry.get_latent_shape()
        control_points = np.zeros((n_control_points, n_latent))
        if "x0" in self.options["optimization"]:
            control_points += self.options["optimization"]["x0"]
        self.start_values = control_points.reshape(-1)
        self.dv_names = [f"x{i}" for i in range(len(self.start_values))]
        if "bounds" in self.options["optimization"]:
            lb, ub = self.options["optimization"]["bounds"]
        else:
            lb, ub = -1, 1
        self.bounds = [(lb, ub)] * len(self.start_values)

    # ---- the expensive iteration (ref opti.py:176-241) ----

    def _compute_solution(self, control_point_values):
        self.logger.debug("Computing Solution")
        self.iteration += 1
        temp_folder = self.create_temp_current_simulation_folder()
        latent_shape = self.geometry.get_latent_shape()
        control_points = np.asarray(control_point_values).reshape((-1, latent_shape))

        self.logger.debug("Generating Geometry")
        self.geometry.generate_surface_mesh(control_points)
        from ..mesh.ply import write_ply
        write_ply(str(temp_folder / f"surf{self.iteration}.ply"),
                  self.geometry.surface_vertices, self.geometry.surface_faces)

        self.geometry.tetrahedralize_surface()
        fname_mesh = str(temp_folder / f"volume{self.iteration}.mesh")
        self.geometry.export_volume_mesh(fname_mesh)

        beam = CantileverBeam(temp_folder)
        bf, markers = self.geometry.boundary_conditions()
        beam.set_mesh(self.geometry.volumes.vertices, self.geometry.volumes.tets,
                      bf, markers)
        beam.set_up()
        dTheta = self.geometry.get_dTheta()

        volume, der_vol = beam.compute_volume(dTheta=dTheta)
        if der_vol is None:
            der_vol = 0
        if np.any(np.isnan(der_vol)):
            self.logger.warning("Nan detected in volume derivative.")
        beam.solve(method=self.fem_method, u0=self._warm_start_field())
        compliance, der_compliance = beam.compute_compliance(dTheta=dTheta)
        if der_compliance is None:
            der_compliance = 0
        self._store_warm_start(beam.u_data)

        vol_constraint = self.options["general"]["volume_constraint"]
        self.cache[self._key(control_point_values)] = {
            "objective": (compliance, der_compliance),
            "constraint": (volume - vol_constraint, der_vol),
        }
        self.logger.info(
            "Finished iteration %d with compliance %.6g and volume %.6g",
            self.iteration, compliance, volume)
        self.optimization_results.append_result(control_point_values, volume, compliance)
        self.save_and_clear(temp_folder)

    def save_and_clear(self, temp_folder):
        """Per-iteration results flush + sim snapshot (ref opti.py:231-241)."""
        with open(self.optimization_folder / "results.json", "w") as f:
            json.dump(dataclasses.asdict(self.optimization_results), f)
        save_every = self.iteration % self.options["general"]["save_every"] == 0
        if save_every or self.iteration == 1:
            shutil.copytree(temp_folder, self.current_simulation_folder,
                            dirs_exist_ok=True)
        shutil.rmtree(temp_folder)
        shutil.rmtree(temp_folder.parent)

    # ---- optimizer frontends (ref opti.py:155-282) ----

    def run_optimization(self):
        self.logger.info("Starting optimization in %s on %s",
                         self.optimization_folder, socket.gethostname())
        self.set_x0()
        if not self.resume:
            self.move_older_sims_to_temp_dir()
        method = self.options["optimization"]["method"]
        try:
            if method in ("BFGS", "COBYLA"):
                result = self.run_scipy_optimization(self.options["optimization"])
            elif method == "MMA":
                result = self.run_MMA_optimization(self.options["optimization"])
            else:
                raise ValueError("Optimizer method not available")
        except FEMSolveDiverged as e:
            # mechanism collapse: the structure detached / pinched off
            # and no solver level can produce a meaningful compliance.
            # End the run gracefully — completed iterations are already
            # flushed to results.json (the reference's round_cross_base
            # log ends the same way; PARITY_NOTES.md).
            self.logger.warning(
                "MECHANISM COLLAPSE at iteration %d: %s — ending run "
                "with %d completed iterations", self.iteration, e,
                len(self.optimization_results.compliance))
            result = None
        with open(self.optimization_folder / "results.json", "w") as f:
            json.dump(dataclasses.asdict(self.optimization_results), f)
        return result

    def run_scipy_optimization(self, options):
        import scipy.optimize

        cons = ({"type": "ineq", "fun": lambda x: -self.constraint(x)[0]},)
        opts = {k: v for k, v in options.items()
                if k not in ("method", "x0", "bounds")}
        return scipy.optimize.minimize(
            lambda x: self.objective(x)[0], self.start_values,
            bounds=self.bounds, method=options["method"], constraints=cons,
            options=opts)

    def run_MMA_optimization(self, options):
        """MMA with crash-safe resume: every accepted design update
        snapshots the full optimizer state (asymptotes included) to
        ``mma_state.npz``; a ``resume=True`` driver reloads it and the
        appended ``results.json`` so a restarted process continues the
        SAME trajectory (ref runs its 304-iteration flagship in one
        process — we survive restarts instead)."""
        state_path = self.optimization_folder / "mma_state.npz"
        state = None
        if self.resume and state_path.exists():
            with np.load(state_path) as z:
                state = {k: z[k] for k in z.files}
        elif self.resume and self.optimization_results.design_vector:
            # soft resume from results.json only (runs started before
            # state snapshots existed): design history restores x/xold,
            # asymptotes re-initialize; the last design is re-evaluated
            # once (cache is empty), duplicating one results entry
            dv = [np.asarray(v) for v in self.optimization_results.design_vector]
            k = len(dv)
            state = {"loop": k - 1, "x": dv[-1],
                     "xold1": dv[-2] if k >= 2 else dv[-1],
                     "xold2": dv[-3] if k >= 3 else dv[-1],
                     "C0": self.optimization_results.compliance[0]}
            self.iteration = k - 1
            self.logger.warning(
                "Soft-resuming from results.json (%d iterations, no "
                "mma_state.npz): asymptote history re-initializes", k)

        def snapshot(s):
            # NB: np.savez appends ".npz" to names without it
            tmp = state_path.with_name("mma_state.tmp.npz")
            np.savez(tmp, **s)
            os.replace(tmp, state_path)

        return MMA().minimize(self.start_values, self.objective, self.constraint,
                              self.bounds, options, state=state,
                              on_iteration=snapshot)


def configure_logging(optimization_folder, debug: bool = False):
    """Dual-handler logging: DEBUG file + INFO console (ref opti.py:478-519)."""
    folder = pathlib.Path(optimization_folder)
    os.makedirs(folder, exist_ok=True)
    root = logging.getLogger()
    root.setLevel(logging.DEBUG if debug else logging.INFO)
    fmt = logging.Formatter("%(asctime)s %(name)s %(levelname)s %(message)s",
                            datefmt="%H:%M:%S")
    fh = logging.FileHandler(folder / "optimization_logs.log")
    fh.setLevel(logging.DEBUG)
    fh.setFormatter(fmt)
    ch = logging.StreamHandler()
    ch.setLevel(logging.INFO)
    ch.setFormatter(fmt)
    root.handlers = [fh, ch]
