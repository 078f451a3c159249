"""Multipatch boundary extraction → watertight triangle surface mesh.

Replaces the reference's ``splinepy.multipatch.Multipatch`` +
``sp.helpme.extract.faces(mp, resolution)`` pipeline (ref:
evaluation_scripts/08_facade_microtile_creation.py:23,
10_gen_double_lattice_training_data.py:26): given a list of conforming
Bezier/B-spline volume patches, find patch faces not shared with a
neighbor, tessellate them at a given resolution, weld coincident
vertices, and orient all triangles outward (so the winding-number sign
test in ``mesh_sdf.SDFfromMesh`` is well-defined).
"""

from __future__ import annotations

import numpy as np

_TOL_DECIMALS = 6


def _face_param_grid(res: int):
    lin = np.linspace(0.0, 1.0, res + 1)
    U, V = np.meshgrid(lin, lin, indexing="ij")
    return np.stack([U.ravel(), V.ravel()], axis=1)


def _volume_face_queries(face: int, uv: np.ndarray) -> np.ndarray:
    """Map face-local (u,v) to volume (u,v,w); faces 0..5 =
    w0,w1,v0,v1,u0,u1 planes."""
    n = uv.shape[0]
    zeros = np.zeros(n)
    ones = np.ones(n)
    u, v = uv[:, 0], uv[:, 1]
    return {
        0: np.stack([u, v, zeros], 1),
        1: np.stack([u, v, ones], 1),
        2: np.stack([u, zeros, v], 1),
        3: np.stack([u, ones, v], 1),
        4: np.stack([zeros, u, v], 1),
        5: np.stack([ones, u, v], 1),
    }[face]


def _face_signature(patch, face: int) -> tuple:
    """Orientation-independent signature: sorted rounded corners + center."""
    corners_uv = np.array([[0, 0], [0, 1], [1, 0], [1, 1], [0.5, 0.5]], dtype=np.float64)
    pts = patch.evaluate(_volume_face_queries(face, corners_uv))
    rounded = np.round(pts, _TOL_DECIMALS)
    corner_keys = sorted(tuple(p) for p in rounded[:4])
    center_key = tuple(rounded[4])
    return (tuple(corner_keys), center_key)


def extract_boundary_mesh(patches, resolution: int = 20):
    """(verts, faces) of the union's boundary surface, outward oriented.

    Patches must be geometrically conforming (shared faces coincide),
    as the reference's tile generators guarantee.
    """
    # 1. find boundary faces
    signatures: dict = {}
    for pi, patch in enumerate(patches):
        for face in range(6):
            sig = _face_signature(patch, face)
            signatures.setdefault(sig, []).append((pi, face))

    boundary = [v[0] for v in signatures.values() if len(v) == 1]

    # 2. tessellate each boundary face
    uv = _face_param_grid(resolution)
    r1 = resolution + 1
    tris_per_face = []
    verts_per_face = []
    for pi, face in boundary:
        patch = patches[pi]
        pts = np.asarray(patch.evaluate(_volume_face_queries(face, uv)), np.float64)

        idx = np.arange(r1 * r1).reshape(r1, r1)
        q00 = idx[:-1, :-1].ravel()
        q10 = idx[1:, :-1].ravel()
        q01 = idx[:-1, 1:].ravel()
        q11 = idx[1:, 1:].ravel()
        tris = np.concatenate([
            np.stack([q00, q10, q11], 1),
            np.stack([q00, q11, q01], 1),
        ], axis=0)

        # 3. outward orientation: face normal must point away from the
        # patch interior (sampled just inside the volume behind the face)
        center_uvw = _volume_face_queries(face, np.array([[0.5, 0.5]]))
        inward = center_uvw.copy()
        comp = {0: 2, 1: 2, 2: 1, 3: 1, 4: 0, 5: 0}[face]
        inward[0, comp] = 0.1 if center_uvw[0, comp] < 0.5 else 0.9
        p_center = patch.evaluate(center_uvw)[0]
        p_inside = patch.evaluate(inward)[0]
        tv = pts[tris[:1]]
        n = np.cross(tv[0, 1] - tv[0, 0], tv[0, 2] - tv[0, 0])
        # compare average normal over the face instead of one triangle
        tv_all = pts[tris]
        n_all = np.cross(tv_all[:, 1] - tv_all[:, 0], tv_all[:, 2] - tv_all[:, 0])
        if (n_all.sum(axis=0) @ (p_center - p_inside)) < 0:
            tris = tris[:, [0, 2, 1]]

        verts_per_face.append(pts)
        tris_per_face.append(tris)

    if not verts_per_face:
        return np.zeros((0, 3)), np.zeros((0, 3), np.int64)

    # 4. weld coincident vertices across faces
    offsets = np.cumsum([0] + [len(v) for v in verts_per_face[:-1]])
    all_verts = np.concatenate(verts_per_face, axis=0)
    all_tris = np.concatenate(
        [t + o for t, o in zip(tris_per_face, offsets)], axis=0)
    rounded = np.round(all_verts, _TOL_DECIMALS)
    uniq, inverse = np.unique(rounded, axis=0, return_inverse=True)
    faces = inverse[all_tris]
    # representative (unrounded) position per welded vertex
    first_occurrence = np.full(len(uniq), -1, np.int64)
    order = np.arange(len(all_verts))[::-1]
    first_occurrence[inverse[order]] = order
    verts = all_verts[first_occurrence]

    # drop degenerate triangles produced by collapsed patch edges
    tv = verts[faces]
    area = np.linalg.norm(np.cross(tv[:, 1] - tv[:, 0], tv[:, 2] - tv[:, 0]), axis=1)
    faces = faces[area > 1e-14]
    return verts, faces
