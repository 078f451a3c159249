"""Volume tet-meshing of an SDF's interior ("marching-tets stuffing").

Replaces the reference's TetGen step (ref: analysis/geometry.py:116-141
``tetrahedralize_surface``) with a fully vectorized numpy construction
sharing its combinatorics with the surface extractor (mesh/marching.py):
each grid cell splits into the same 6 tetrahedra; fully-inside tets are
kept, sign-mixed tets are clipped against the (per-tet linear, hence
planar) level set. Because the field is barycentric-linear inside each
tet, the clipped region is convex; it is tetrahedralized from its
centroid (a Steiner point), with boundary quads split along the
diagonal incident to their smallest-keyed vertex — a rule that depends
only on shared data, so neighboring tets triangulate shared cut faces
identically and the mesh is conforming.

Vertex provenance is preserved: every non-centroid vertex is either a
grid point or a grid-edge crossing with the same identity the surface
extractor assigns — surface sensitivities transfer to the volume mesh
by construction, without the KD-tree matching of ref geometry.py:130-141.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..mesh.marching import _CORNERS, _TETS


@dataclasses.dataclass
class TetMesh:
    vertices: np.ndarray        # (V, 3) float64
    tets: np.ndarray            # (T, 4) int, positively oriented
    edge_lo: np.ndarray         # (V,) flat grid-point id (== edge_hi for grid verts)
    edge_hi: np.ndarray         # (V,)
    t: np.ndarray               # (V,) interpolation parameter along lo→hi
    centroid_sources: np.ndarray  # (V, 6) indices into vertices, -1 pad; empty row = not centroid

    @property
    def num_vertices(self):
        return len(self.vertices)

    @property
    def is_centroid(self):
        return self.centroid_sources[:, 0] >= 0

    def boundary_faces(self) -> np.ndarray:
        """Faces appearing in exactly one tet, outward oriented."""
        f = np.concatenate([
            self.tets[:, [0, 2, 1]], self.tets[:, [0, 1, 3]],
            self.tets[:, [0, 3, 2]], self.tets[:, [1, 2, 3]],
        ])
        key = np.sort(f, axis=1)
        _, inv, counts = np.unique(key, axis=0, return_inverse=True, return_counts=True)
        return f[counts[inv] == 1]

    def total_volume(self) -> float:
        return float(np.abs(_tet_volume(self.vertices, self.tets)).sum())


def _tet_volume(verts, tets):
    a = verts[tets[:, 1]] - verts[tets[:, 0]]
    b = verts[tets[:, 2]] - verts[tets[:, 0]]
    c = verts[tets[:, 3]] - verts[tets[:, 0]]
    return np.einsum("ij,ij->i", np.cross(a, b), c) / 6.0


def stuff_sdf_grid(field: np.ndarray, spacing, origin,
                   min_rel_volume: float = 1e-7) -> TetMesh:
    """Tet-mesh the region field<0 of a (Nx,Ny,Nz) grid."""
    F = np.asarray(field, dtype=np.float64)
    nx, ny, nz = F.shape
    sp = np.asarray(spacing, dtype=np.float64)
    org = np.asarray(origin, dtype=np.float64)
    Ff = F.ravel()
    inside = Ff < 0
    npts = nx * ny * nz

    ci, cj, ck = np.meshgrid(np.arange(nx - 1), np.arange(ny - 1), np.arange(nz - 1),
                             indexing="ij")
    ci, cj, ck = ci.ravel(), cj.ravel(), ck.ravel()
    corner_ids = ((ci[:, None] + _CORNERS[:, 0]) * ny
                  + (cj[:, None] + _CORNERS[:, 1])) * nz + (ck[:, None] + _CORNERS[:, 2])
    tet_pts = corner_ids[:, _TETS].reshape(-1, 4)

    t_inside = inside[tet_pts]
    n_in = t_inside.sum(axis=1)

    # sort each tet's verts inside-first, preserving original relative order
    order = np.argsort(~t_inside, axis=1, kind="stable")
    tp = np.take_along_axis(tet_pts, order, axis=1)

    def ekey(a, b):
        return np.minimum(a, b).astype(np.int64) * npts + np.maximum(a, b)

    def gkey(p):
        return p.astype(np.int64) * npts + p

    # ---------------- full tets (grid-vertex keys) ----------------
    full = tp[n_in == 4]
    full_keys = np.stack([gkey(full[:, i]) for i in range(4)], axis=1) \
        if len(full) else np.zeros((0, 4), np.int64)

    # ------------- mixed tets: boundary-face triangles -------------
    # each mixed tet contributes face triangles (in vertex KEYS); a
    # centroid vertex (one per mixed tet) closes them into sub-tets.
    def quad_tris(q0, q1, q2, q3):
        """Split quad cycle (q0,q1,q2,q3) by the diagonal incident to its
        smallest key: diag (q0,q2) if min on {q0,q2} else (q1,q3)."""
        m02 = np.minimum(q0, q2)
        m13 = np.minimum(q1, q3)
        use02 = m02 <= m13
        t1 = np.where(use02[:, None],
                      np.stack([q0, q1, q2], 1), np.stack([q0, q1, q3], 1))
        t2 = np.where(use02[:, None],
                      np.stack([q0, q2, q3], 1), np.stack([q1, q2, q3], 1))
        return t1, t2

    mixed_faces = []   # list of (n_mixed_i, 3) key arrays per case, with tet row ids
    mixed_rows = []

    # case 1 inside: v,o0,o1,o2 → region verts v, E(v,o*): 4 face tris
    m1 = tp[n_in == 1]
    if len(m1):
        v, o0, o1, o2 = (m1[:, i] for i in range(4))
        e0, e1, e2 = ekey(v, o0), ekey(v, o1), ekey(v, o2)
        g = gkey(v)
        tris = [np.stack([g, e0, e1], 1), np.stack([g, e1, e2], 1),
                np.stack([g, e0, e2], 1), np.stack([e0, e1, e2], 1)]
        rows = np.arange(len(m1))
        for tr in tris:
            mixed_faces.append(tr)
            mixed_rows.append(("c1", rows))

    # case 2 inside: i0,i1 | o0,o1 → prism
    m2 = tp[n_in == 2]
    if len(m2):
        i0, i1, o0, o1 = (m2[:, i] for i in range(4))
        g0, g1 = gkey(i0), gkey(i1)
        a00, a01 = ekey(i0, o0), ekey(i0, o1)
        a10, a11 = ekey(i1, o0), ekey(i1, o1)
        rows = np.arange(len(m2))
        tris = [np.stack([g0, a00, a01], 1), np.stack([g1, a10, a11], 1)]
        for (q0, q1, q2, q3) in [(g0, g1, a10, a00),   # parent face (i0,i1,o0)
                                 (g0, g1, a11, a01),   # parent face (i0,i1,o1)
                                 (a00, a10, a11, a01)]:  # cut plane
            t1, t2 = quad_tris(q0, q1, q2, q3)
            tris.extend([t1, t2])
        for tr in tris:
            mixed_faces.append(tr)
            mixed_rows.append(("c2", rows))

    # case 3 inside: i0,i1,i2 | o → frustum
    m3 = tp[n_in == 3]
    if len(m3):
        i0, i1, i2, o = (m3[:, i] for i in range(4))
        g0, g1, g2 = gkey(i0), gkey(i1), gkey(i2)
        e0, e1, e2 = ekey(i0, o), ekey(i1, o), ekey(i2, o)
        rows = np.arange(len(m3))
        tris = [np.stack([g0, g1, g2], 1), np.stack([e0, e1, e2], 1)]
        for (q0, q1, q2, q3) in [(g0, g1, e1, e0),     # parent face (i0,i1,o)
                                 (g1, g2, e2, e1),     # parent face (i1,i2,o)
                                 (g0, g2, e2, e0)]:    # parent face (i0,i2,o)
            t1, t2 = quad_tris(q0, q1, q2, q3)
            tris.extend([t1, t2])
        for tr in tris:
            mixed_faces.append(tr)
            mixed_rows.append(("c3", rows))

    # ---------------- unify vertex keys ----------------
    n_c1 = int((n_in == 1).sum())
    n_c2 = int((n_in == 2).sum())
    n_c3 = int((n_in == 3).sum())
    all_face_keys = (np.concatenate(mixed_faces, axis=0)
                     if mixed_faces else np.zeros((0, 3), np.int64))
    key_pool = [full_keys.ravel(), all_face_keys.ravel()]
    uniq = np.unique(np.concatenate(key_pool)) if any(len(k) for k in key_pool) \
        else np.zeros(0, np.int64)

    u_lo = (uniq // npts).astype(np.int64)
    u_hi = (uniq % npts).astype(np.int64)
    is_grid = u_lo == u_hi
    va, vb = Ff[u_lo], Ff[u_hi]
    with np.errstate(divide="ignore", invalid="ignore"):
        t = np.where(is_grid, 0.0, va / (va - vb))
    # clamp crossings away from grid vertices: a crossing at t→0/1 makes
    # sliver tets whose stiffness blocks push the condition number past
    # what even preconditioned f64 CG enjoys (and f32 CG diverges on).
    # Bounded t bounds the element aspect ratio (the role of Labelle &
    # Shewchuk's warping rule in isosurface stuffing) at an O(eps·h)
    # surface-position cost — FEM-mesh-only; the render/extraction
    # surface (mesh/marching.py) keeps exact crossings.
    eps = 0.05
    t = np.clip(np.nan_to_num(t, nan=0.5), 0.0, 1.0)
    t = np.where(is_grid, 0.0, np.clip(t, eps, 1.0 - eps))

    def coords_of(flat):
        i = flat // (ny * nz)
        j = (flat // nz) % ny
        k = flat % nz
        return np.stack([i, j, k], axis=1).astype(np.float64) * sp + org

    base_verts = coords_of(u_lo) * (1 - t[:, None]) + coords_of(u_hi) * t[:, None]
    n_base = len(base_verts)

    # centroid vertices: one per mixed tet (region vertex sets per case)
    cent_verts = []
    cent_sources = []
    key_to_idx = {"sorter": np.argsort(uniq)}
    def lookup(keys):
        srt = key_to_idx["sorter"]
        return srt[np.searchsorted(uniq, keys, sorter=srt)]

    def add_centroids(region_key_cols):
        cols = [lookup(c) for c in region_key_cols]
        idx = np.stack(cols, axis=1)                 # (n, k) vertex indices
        pts = base_verts[idx]                        # (n, k, 3)
        cent_verts.append(pts.mean(axis=1))
        pad = np.full((idx.shape[0], 6 - idx.shape[1]), -1, np.int64)
        cent_sources.append(np.concatenate([idx, pad], axis=1))

    if n_c1:
        v, o0, o1, o2 = (m1[:, i] for i in range(4))
        add_centroids([gkey(v), ekey(v, o0), ekey(v, o1), ekey(v, o2)])
    if n_c2:
        i0, i1, o0, o1 = (m2[:, i] for i in range(4))
        add_centroids([gkey(i0), gkey(i1), ekey(i0, o0), ekey(i0, o1),
                       ekey(i1, o0), ekey(i1, o1)])
    if n_c3:
        i0, i1, i2, o = (m3[:, i] for i in range(4))
        add_centroids([gkey(i0), gkey(i1), gkey(i2), ekey(i0, o),
                       ekey(i1, o), ekey(i2, o)])

    if cent_verts:
        cent_verts = np.concatenate(cent_verts, axis=0)
        cent_sources = np.concatenate(cent_sources, axis=0)
    else:
        cent_verts = np.zeros((0, 3))
        cent_sources = np.zeros((0, 6), np.int64)

    verts = np.concatenate([base_verts, cent_verts], axis=0)
    centroid_sources = np.concatenate(
        [np.full((n_base, 6), -1, np.int64), cent_sources], axis=0)
    edge_lo = np.concatenate([u_lo, np.full(len(cent_verts), -1, np.int64)])
    edge_hi = np.concatenate([u_hi, np.full(len(cent_verts), -1, np.int64)])
    t_all = np.concatenate([t, np.zeros(len(cent_verts))])

    # ---------------- assemble tets ----------------
    tets_list = []
    if len(full):
        tets_list.append(lookup(full_keys.ravel()).reshape(-1, 4))

    cent_base = {"c1": n_base, "c2": n_base + n_c1, "c3": n_base + n_c1 + n_c2}
    for tr_keys, (case, rows) in zip(mixed_faces, mixed_rows):
        tri_idx = lookup(tr_keys.ravel()).reshape(-1, 3)
        cent_idx = cent_base[case] + rows
        tets_list.append(np.concatenate([cent_idx[:, None], tri_idx], axis=1))

    if not tets_list:
        return TetMesh(np.zeros((0, 3)), np.zeros((0, 4), np.int64),
                       np.zeros(0, np.int64), np.zeros(0, np.int64), np.zeros(0),
                       np.zeros((0, 6), np.int64))

    tets = np.concatenate(tets_list, axis=0)

    vol = _tet_volume(verts, tets)
    neg = vol < 0
    tets[neg] = tets[neg][:, [0, 1, 3, 2]]
    vol = np.abs(vol)
    cell_vol = sp[0] * sp[1] * sp[2]
    tets = tets[vol > min_rel_volume * cell_vol]

    return TetMesh(vertices=verts, tets=tets, edge_lo=edge_lo, edge_hi=edge_hi,
                   t=t_all, centroid_sources=centroid_sources)
