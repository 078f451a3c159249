"""DeepSDF geometry builder for shape optimization.

Parity surface of ref analysis/geometry.py:17-197 ``DeepSDFMesh``,
re-architected around one shared SDF grid:

  reference: FlexiCubes surface → trimesh repair → TetGen PLC →
             napf KD-tree vertex matching → normal-projected dTheta
  here:      one capped microstructure SDF grid (device program) →
             marching-tets surface + dVerts/dControl (diff_mesh) AND
             marching-tets volume stuffing (opt/stuffing) share vertex
             identities by construction — no KD-tree matching, no
             watertightness repair (conforming by construction).

Reference behaviors preserved: grid N = N_base·tiling+1 (geometry.py:77),
"freeform deformation" x-coords and x-jacobians ×2, jacobian entries
outside [-1,1] zeroed (geometry.py:88-94), largest-component orphan
removal (geometry.py:97-103), BC markers by coordinate planes
(geometry.py:143-174), normal-projected dTheta (geometry.py:176-197).
"""

from __future__ import annotations

import logging
import os
import pathlib

import numpy as np

from .. import workspace as ws
from ..mesh.diff_mesh import create_mesh_microstructure_diff
from ..networks.decoder import DecoderConfig
from ..ops.bspline import latent_field_spline
from ..train.checkpoint import load_latent_vectors, load_model_parameters
from .stuffing import TetMesh, stuff_sdf_grid

logger = logging.getLogger(__name__)


def _coarsen_field(field: np.ndarray, spacing: np.ndarray, factor: int = 2):
    """Trilinearly downsample a grid field ~``factor``× per axis,
    keeping the exact domain extent (endpoints preserved)."""
    from scipy.ndimage import map_coordinates

    dims = np.asarray(field.shape)
    new_dims = (dims - 1) // factor + 1
    new_dims = np.maximum(new_dims, 2)
    axes = [np.linspace(0, d - 1, m) for d, m in zip(dims, new_dims)]
    grid = np.meshgrid(*axes, indexing="ij")
    coarse = map_coordinates(field, [g.ravel() for g in grid], order=1,
                             mode="nearest").reshape(tuple(new_dims))
    new_spacing = spacing * (dims - 1) / (new_dims - 1)
    return coarse, new_spacing


def dot_prod(A, B) -> np.ndarray:
    """Project rows of A onto rows of B (ref geometry.py:219-227)."""
    dot_ai_bi = (A * B).sum(axis=-1, keepdims=True)
    dot_bi_bi = (B * B).sum(axis=-1, keepdims=True)
    zero = np.all(B == 0, axis=1)
    dot_bi_bi[zero] = np.inf
    return dot_ai_bi / dot_bi_bi * B


def vertex_normals(verts: np.ndarray, faces: np.ndarray) -> np.ndarray:
    """Area-weighted vertex normals (replaces trimesh.vertex_normals)."""
    tv = verts[faces]
    fn = np.cross(tv[:, 1] - tv[:, 0], tv[:, 2] - tv[:, 0])  # area-weighted
    vn = np.zeros_like(verts)
    for k in range(3):
        np.add.at(vn, faces[:, k], fn)
    norm = np.linalg.norm(vn, axis=1, keepdims=True)
    return vn / np.where(norm > 0, norm, 1.0)


def largest_component_tets(tets: np.ndarray, n_verts: int) -> np.ndarray:
    """Mask of tets in the largest vertex-connected component
    (ref geometry.py:97-103 keeps the largest face-adjacent patch)."""
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import connected_components

    rows = np.concatenate([tets[:, 0], tets[:, 0], tets[:, 0]])
    cols = np.concatenate([tets[:, 1], tets[:, 2], tets[:, 3]])
    data = np.ones(len(rows), dtype=np.int8)
    adj = coo_matrix((data, (rows, cols)), shape=(n_verts, n_verts))
    n_comp, labels = connected_components(adj, directed=False)
    if n_comp <= 1:
        return np.ones(len(tets), dtype=bool)
    tet_label = labels[tets[:, 0]]
    counts = np.bincount(tet_label, minlength=n_comp)
    return tet_label == np.argmax(counts)


class DeepSDFMesh:
    """generates microstructure from a DeepSDF experiment
    (ref geometry.py:17-61)."""

    def __init__(self, mesh_options, experiment_location=None):
        if "experiment_directory" not in mesh_options:
            raise KeyError("Key experiment_directory not found in general settings")
        if "checkpoint" not in mesh_options:
            raise KeyError("Key checkpoint not found in general settings")
        self.options = mesh_options
        base = pathlib.Path(experiment_location or ".")
        self.exp_dir = base / mesh_options["experiment_directory"]
        if not os.path.exists(self.exp_dir):
            raise FileNotFoundError(f"Experiment directory {self.exp_dir} not found")
        checkpoint = str(mesh_options["checkpoint"])

        specs = ws.load_experiment_specifications(str(self.exp_dir))
        self.decoder_config = DecoderConfig.from_specs(specs)
        self.params, _ = load_model_parameters(str(self.exp_dir), checkpoint,
                                               self.decoder_config)
        lat, _ = load_latent_vectors(str(self.exp_dir), checkpoint)
        self.latent = np.asarray(lat)

        self.latent_vec_interpolation = latent_field_spline(
            self.latent.shape[1], mesh_options["degrees"], mesh_options["refinement"])
        logger.debug("Initialized latent field with %s control points",
                     self.latent_vec_interpolation.control_mesh_resolutions)

        self.surface_vertices = None
        self.surface_faces = None
        self.jacobian = None
        self._field = None     # capped SDF grid for stuffing
        self._dims = None
        self._spacing = None
        self._origin = None
        self.volumes: TetMesh | None = None

    def get_latent_shape(self) -> int:
        return self.latent.shape[1]

    def get_n_control_points(self) -> int:
        return self.latent_vec_interpolation.control_points.shape[0]

    # ---- surface + jacobian ----

    def generate_surface_mesh(self, control_points) -> None:
        """ref geometry.py:69-114."""
        cap_border_dict = self.options["cap_border_dict"]
        N_base = self.options["N_base_reconstruction"]
        tiling = self.options["tiling"]
        N = [N_base * t + 1 for t in tiling]
        self.latent_vec_interpolation.control_points = np.asarray(
            control_points, dtype=np.float64).reshape(-1, self.get_latent_shape())

        verts, faces, jac, extras = create_mesh_microstructure_diff(
            tiling, self.decoder_config, self.params,
            self.latent_vec_interpolation, N=N, cap_border_dict=cap_border_dict,
            compute_derivatives=True, return_extras=True)
        self._field = extras["field"]
        self._dims = extras["dims"]
        self._spacing = extras["spacing"]
        self._origin = extras["origin"]
        self._surface_topo = extras["topo"]
        if len(verts) == 0 or len(faces) == 0:
            from .fem import FEMSolveDiverged
            raise FEMSolveDiverged(
                "surface extraction produced an empty mesh — the design "
                "has degenerated (no material crosses the iso-level)")
        jac = jac.reshape((jac.shape[0], jac.shape[1], -1))

        # "freeform deformation": beam aspect ×2 in x (ref :88-94)
        verts = verts.copy()
        verts[:, 0] = verts[:, 0] * 2
        jac[:, 0, :] = jac[:, 0, :] * 2
        # zero out-of-band jacobian entries (bug-for-bug, ref :93-94)
        jac[jac > 1] = 0
        jac[jac < -1] = 0

        self.surface_vertices = verts
        self.surface_faces = faces
        self.jacobian = jac

    # ---- volume mesh ----

    def tetrahedralize_surface(self) -> None:
        """Stuff the stored SDF grid (ref geometry.py:116-141 TetGen).

        With ``decimate_mesh`` (the reference's config key, honored here
        as FEM-mesh coarsening) the field is trilinearly downsampled 2×
        per axis first — ~8× fewer tets, matching the scale of the
        reference's decimate+TetGen-quality meshes (≈575k tets for the
        8×1×4 run) instead of stuffing the full reconstruction grid."""
        logger.debug("Tet-meshing SDF interior")
        field = self._field.reshape(self._dims)
        spacing = np.asarray(self._spacing, dtype=np.float64)
        self._conforming = True
        if self.options.get("decimate_mesh", False):
            field, spacing = _coarsen_field(field, spacing)
            self._conforming = False
            self._coarse_spacing = spacing
            logger.debug("Decimated stuffing grid to %s", field.shape)
        mesh = stuff_sdf_grid(field, spacing, self._origin)
        # same coordinate mapping as the surface: (phys+1)/2, then x×2
        v = (mesh.vertices + 1.0) / 2.0
        v[:, 0] *= 2
        mesh.vertices = v
        if self.options.get("remove_orphans", False):
            keep = largest_component_tets(mesh.tets, mesh.num_vertices)
            mesh.tets = mesh.tets[keep]
        self.volumes = mesh
        self._bc = None

    # ---- export with BC markers ----

    def boundary_conditions(self, tolerance: float = 3e-2):
        """Face markers: 1 = x≈0 (fixed), 2 = z≈top (load), 3 = rest
        (ref geometry.py:143-174)."""
        if getattr(self, "_bc", None):
            return self._bc
        volumes = self.volumes
        bf = volumes.boundary_faces()
        verts = volumes.vertices
        height = verts[:, 2].max()
        face_max_x = verts[bf].max(axis=1)[:, 0]
        face_max_z = verts[bf].max(axis=1)[:, 2]
        # ref order: if x<tol → 1 elif z>top−tol → 2 else 3
        marker = np.full(len(bf), 3, dtype=np.int32)
        is1 = face_max_x < tolerance
        is2 = (~is1) & (face_max_z > height - tolerance)
        marker[is1] = 1
        marker[is2] = 2
        self._bc = (bf, marker)
        logger.debug("Mesh: %d tets, %d verts, BC counts 1:%d 2:%d 3:%d",
                     len(volumes.tets), len(verts), int(is1.sum()), int(is2.sum()),
                     int((marker == 3).sum()))
        return self._bc

    def export_volume_mesh(self, filename: str, show_mesh: bool = False) -> None:
        """MFEM v1.0 mesh with boundary attributes (ref geometry.py:143-174)."""
        bf, marker = self.boundary_conditions()
        write_mfem_mesh(filename, self.volumes.vertices, self.volumes.tets, bf, marker)

    # ---- sensitivities ----

    def get_dTheta(self) -> np.ndarray:
        """(n_volume_verts, 3, n_design) normal-projected surface velocity
        (ref geometry.py:176-197). Volume boundary vertices inherit the
        surface jacobian directly via shared grid-edge identity."""
        volumes = self.volumes
        jac = self.jacobian
        if np.any(np.isnan(jac)):
            logger.warning("Nan values in jacobian detected")
        normals = vertex_normals(self.surface_vertices, self.surface_faces)

        if not getattr(self, "_conforming", True):
            # decimated FEM mesh: no shared grid identity — nearest-vertex
            # transfer, the reference's own napf KD-tree matching
            # (ref geometry.py:130-141,196)
            from scipy.spatial import cKDTree

            proj = np.empty_like(jac)
            for i in range(jac.shape[2]):
                proj[:, :, i] = dot_prod(np.float64(jac[:, :, i]), normals)
            dVertices = np.zeros((volumes.num_vertices, 3, jac.shape[2]))
            bverts = np.unique(volumes.boundary_faces())
            dist, idx = cKDTree(self.surface_vertices).query(
                volumes.vertices[bverts], workers=4)
            # x was stretched ×2; a boundary vertex further than one
            # coarse cell from any surface vertex sits on a cap plane
            # section with no surface counterpart — leave it fixed
            tol = 2.0 * float(np.max(self._coarse_spacing))
            near = dist <= tol
            dVertices[bverts[near]] = proj[idx[near]]
            return dVertices

        # match volume vertices to surface vertices by crossing-edge identity
        topo = self._surface_topo
        npts = int(np.prod(self._dims))
        surf_key = topo["u_lo"] * npts + topo["u_hi"]  # (Vs,) canonical lo<hi
        vol_key = volumes.edge_lo * npts + volumes.edge_hi
        sorter = np.argsort(surf_key)
        pos = np.searchsorted(surf_key, vol_key, sorter=sorter)
        pos_clipped = np.clip(pos, 0, len(surf_key) - 1)
        matched = (volumes.edge_lo != volumes.edge_hi) & (volumes.edge_lo >= 0) & \
            (surf_key[sorter[pos_clipped]] == vol_key)

        dVertices = np.zeros((volumes.num_vertices, 3, jac.shape[2]))
        surf_idx = sorter[pos_clipped][matched]
        proj = np.empty_like(jac)
        for i in range(jac.shape[2]):
            proj[:, :, i] = dot_prod(np.float64(jac[:, :, i]), normals)
        dVertices[matched] = proj[surf_idx]
        return dVertices


def write_mfem_mesh(filename, vertices, tets, boundary_faces, boundary_markers):
    """MFEM mesh v1.0 writer (replaces gustaf's MFEM export,
    ref geometry.py:172)."""
    with open(filename, "w") as f:
        f.write("MFEM mesh v1.0\n\ndimension\n3\n\n")
        f.write(f"elements\n{len(tets)}\n")
        for t in np.asarray(tets):
            f.write(f"1 4 {t[0]} {t[1]} {t[2]} {t[3]}\n")
        f.write(f"\nboundary\n{len(boundary_faces)}\n")
        for face, m in zip(np.asarray(boundary_faces), np.asarray(boundary_markers)):
            f.write(f"{m} 2 {face[0]} {face[1]} {face[2]}\n")
        f.write(f"\nvertices\n{len(vertices)}\n3\n")
        for v in np.asarray(vertices):
            f.write(f"{v[0]:.16g} {v[1]:.16g} {v[2]:.16g}\n")


def read_mfem_mesh(filename):
    """Minimal MFEM v1.0 tet-mesh reader."""
    with open(filename) as f:
        lines = [ln.strip() for ln in f]
    def section(name):
        i = lines.index(name)
        return i
    i = section("elements") + 1
    ne = int(lines[i]); i += 1
    tets = np.array([[int(x) for x in lines[i + k].split()[2:6]] for k in range(ne)])
    i = section("boundary") + 1
    nb = int(lines[i]); i += 1
    bmark = np.array([int(lines[i + k].split()[0]) for k in range(nb)])
    bfaces = np.array([[int(x) for x in lines[i + k].split()[2:5]] for k in range(nb)])
    i = section("vertices") + 1
    nv = int(lines[i]); i += 2
    verts = np.array([[float(x) for x in lines[i + k].split()] for k in range(nv)])
    return verts, tets, bfaces, bmark
