"""Symmetric chamfer distance (ref: deep_sdf/metrics/chamfer.py:9-39).

The reference depends on trimesh for area-weighted surface sampling;
here that's a 20-line numpy routine (``sample_surface``). KD-tree
queries stay on host via scipy — the metric is evaluation-time only.
"""

from __future__ import annotations

import numpy as np
from scipy.spatial import cKDTree as KDTree


def sample_surface(vertices: np.ndarray, faces: np.ndarray, count: int,
                   rng: np.random.Generator | None = None,
                   return_index: bool = False) -> np.ndarray:
    """Area-weighted uniform sampling of a triangle mesh surface
    (replaces trimesh.sample.sample_surface, ref chamfer.py:21)."""
    rng = rng or np.random.default_rng()
    v = np.asarray(vertices, dtype=np.float64)
    tv = v[np.asarray(faces, dtype=np.int64)]
    cross = np.cross(tv[:, 1] - tv[:, 0], tv[:, 2] - tv[:, 0])
    area = 0.5 * np.linalg.norm(cross, axis=1)
    total = area.sum()
    if total <= 0:
        raise ValueError("mesh has zero surface area")
    tri_idx = rng.choice(len(area), size=count, p=area / total)
    r1 = rng.random(count)
    r2 = rng.random(count)
    sqrt_r1 = np.sqrt(r1)
    a = 1.0 - sqrt_r1
    b = sqrt_r1 * (1.0 - r2)
    c = sqrt_r1 * r2
    t = tv[tri_idx]
    pts = a[:, None] * t[:, 0] + b[:, None] * t[:, 1] + c[:, None] * t[:, 2]
    if return_index:
        return pts, tri_idx
    return pts


def compute_chamfer(gt_points: np.ndarray, gen_vertices: np.ndarray,
                    gen_faces: np.ndarray, offset=0.0, scale=1.0,
                    num_mesh_samples: int = 30000, seed: int = 0) -> float:
    """Symmetric chamfer: mean sq dist gt→gen + gen→gt
    (ref: chamfer.py:9-39 compute_trimesh_chamfer)."""
    gen_points = sample_surface(gen_vertices, gen_faces, num_mesh_samples,
                                np.random.default_rng(seed))
    gen_points = gen_points / scale - offset
    gt_points = np.asarray(gt_points, dtype=np.float64)

    one_distances, _ = KDTree(gen_points).query(gt_points)
    gt_to_gen = np.mean(np.square(one_distances))
    two_distances, _ = KDTree(gt_points).query(gen_points)
    gen_to_gt = np.mean(np.square(two_distances))
    return float(gt_to_gen + gen_to_gt)


# reference-name alias; accepts (verts, faces) in place of a trimesh object
def compute_trimesh_chamfer(gt_points, gen_mesh, offset, scale, num_mesh_samples=30000):
    if hasattr(gen_mesh, "vertices"):
        verts, faces = np.asarray(gen_mesh.vertices), np.asarray(gen_mesh.faces)
    else:
        verts, faces = gen_mesh
    gt = gt_points.vertices if hasattr(gt_points, "vertices") else gt_points
    return compute_chamfer(gt, verts, faces, offset=offset, scale=scale,
                           num_mesh_samples=num_mesh_samples)
