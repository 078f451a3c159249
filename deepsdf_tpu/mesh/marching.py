"""Level-set surface extraction from dense SDF grids.

Replaces skimage.measure.marching_cubes (ref: deep_sdf/mesh.py:112-114)
with a fully vectorized **marching-tetrahedra** extractor: each grid
cell is split into 6 tetrahedra sharing the main diagonal, each tet
contributes 0–2 triangles with vertices on sign-change edges. Compared
to table-based marching cubes this is topologically unambiguous
(no hole-producing ambiguous face cases), trivially correct, and the
same decomposition is reused by the *differentiable* extraction path
(``diff_mesh.py``) so forward and gradient geometry agree exactly.

All heavy ops are numpy array programs (no Python per-cell loops); the
device-side differentiable variant lives in ``diff_mesh.py``.
"""

from __future__ import annotations

import numpy as np

# cube corner offsets (ref ordering matches typical MC corner layout)
_CORNERS = np.array([
    [0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
    [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1],
], dtype=np.int64)

# 6 tets per cube sharing the body diagonal c0–c6
_TETS = np.array([
    [0, 1, 2, 6],
    [0, 2, 3, 6],
    [0, 3, 7, 6],
    [0, 7, 4, 6],
    [0, 4, 5, 6],
    [0, 5, 1, 6],
], dtype=np.int64)

# tet edges by local vertex pair
_TET_EDGES = np.array([[0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3]], dtype=np.int64)

# case → (ntris, up to 2 triangles of edge ids); bit i set = tet vertex i inside
_E = {k: v for v, k in enumerate(["01", "02", "03", "12", "13", "23"])}


def _etab(a, b):
    return _E[f"{min(a,b)}{max(a,b)}"]


_CASE_TRIS: list[list[tuple[int, int, int]]] = [[] for _ in range(16)]
for case in range(1, 15):
    inside = [v for v in range(4) if case >> v & 1]
    outside = [v for v in range(4) if not (case >> v & 1)]
    if len(inside) == 1:
        p = inside[0]
        e = [_etab(p, o) for o in outside]
        _CASE_TRIS[case] = [(e[0], e[1], e[2])]
    elif len(inside) == 3:
        q = outside[0]
        e = [_etab(q, i) for i in inside]
        _CASE_TRIS[case] = [(e[0], e[1], e[2])]
    elif len(inside) == 2:
        p, q = inside
        r, s = outside
        # quad cycle (p,r) (q,r) (q,s) (p,s)
        a, b, c, d = _etab(p, r), _etab(q, r), _etab(q, s), _etab(p, s)
        _CASE_TRIS[case] = [(a, b, c), (a, c, d)]

_TRI_TABLE = np.full((16, 2, 3), -1, dtype=np.int64)
_TRI_COUNT = np.zeros(16, dtype=np.int64)
for case, tris in enumerate(_CASE_TRIS):
    _TRI_COUNT[case] = len(tris)
    for t, tri in enumerate(tris):
        _TRI_TABLE[case, t] = tri


def marching_tetrahedra(volume: np.ndarray, level: float = 0.0,
                        spacing=(1.0, 1.0, 1.0), return_topology: bool = False,
                        compute_normals: bool = True):
    """Extract the ``level`` isosurface of a (Nx,Ny,Nz) scalar grid.

    Returns (verts, faces, normals, values) matching the
    skimage.measure.marching_cubes return convention
    (verts in physical units = index * spacing; normals point toward
    positive field values i.e. outside for SDFs).

    With ``return_topology`` additionally returns a dict
    {"u_lo", "u_hi", "t"}: per output vertex the two flat grid-point
    ids of its crossing edge and the interpolation parameter — the
    fixed combinatorial structure the differentiable extraction path
    (diff_mesh.py) re-parameterizes by field values.
    """
    V = np.asarray(volume, dtype=np.float64)
    if V.ndim != 3:
        raise ValueError("volume must be 3-D")
    nx, ny, nz = V.shape
    if min(nx, ny, nz) < 2:
        raise ValueError("volume must be at least 2 in every dimension")
    F = V - float(level)
    inside = F < 0

    # --- active cells: any corner-sign disagreement ---
    occ = inside[:-1, :-1, :-1]
    same = np.ones_like(occ, dtype=bool)
    for (dx, dy, dz) in _CORNERS[1:]:
        c = inside[dx:nx - 1 + dx, dy:ny - 1 + dy, dz:nz - 1 + dz]
        same &= c == occ
    ci, cj, ck = np.nonzero(~same)
    if ci.size == 0:
        empty = (np.zeros((0, 3)), np.zeros((0, 3), np.int64),
                 np.zeros((0, 3)), np.zeros(0))
        if return_topology:
            return (*empty, {"u_lo": np.zeros(0, np.int64),
                             "u_hi": np.zeros(0, np.int64), "t": np.zeros(0)})
        return empty

    # flat grid-point ids of the 8 corners of each active cell: (A, 8)
    corner_ids = ((ci[:, None] + _CORNERS[:, 0]) * ny
                  + (cj[:, None] + _CORNERS[:, 1])) * nz + (ck[:, None] + _CORNERS[:, 2])

    Ff = F.ravel()
    # per active cell × 6 tets → (A*6, 4) global point ids
    tet_pts = corner_ids[:, _TETS].reshape(-1, 4)
    tet_vals = Ff[tet_pts]
    tet_inside = tet_vals < 0
    case = (tet_inside * np.array([1, 2, 4, 8])).sum(axis=1)
    keep = (case > 0) & (case < 15)
    tet_pts = tet_pts[keep]
    case = case[keep]

    # expand to triangles
    ntri = _TRI_COUNT[case]                     # (T,) in {1,2}
    tri_tet_idx = np.repeat(np.arange(len(case)), ntri)
    tri_slot = (np.arange(ntri.sum()) - np.repeat(np.cumsum(ntri) - ntri, ntri))
    tri_edges = _TRI_TABLE[case[tri_tet_idx], tri_slot]        # (Ntri, 3) edge ids

    # edge → (global point a, global point b)
    ev = _TET_EDGES[tri_edges]                                 # (Ntri, 3, 2) local verts
    pa = np.take_along_axis(tet_pts[tri_tet_idx], ev[..., 0], axis=1)
    pb = np.take_along_axis(tet_pts[tri_tet_idx], ev[..., 1], axis=1)

    # canonicalize + weld shared edge-vertices
    lo = np.minimum(pa, pb)
    hi = np.maximum(pa, pb)
    ekey = lo.astype(np.int64) * (nx * ny * nz) + hi
    uniq, faces_flat = np.unique(ekey, return_inverse=True)
    faces = faces_flat.reshape(-1, 3)

    u_lo = (uniq // (nx * ny * nz)).astype(np.int64)
    u_hi = (uniq % (nx * ny * nz)).astype(np.int64)
    va = Ff[u_lo]
    vb = Ff[u_hi]
    t = va / (va - vb)
    t = np.clip(np.nan_to_num(t, nan=0.5), 0.0, 1.0)

    def coords(flat):
        i = flat // (ny * nz)
        j = (flat // nz) % ny
        k = flat % nz
        return np.stack([i, j, k], axis=1).astype(np.float64)

    sp = np.asarray(spacing, dtype=np.float64)
    c_lo, c_hi = coords(u_lo), coords(u_hi)
    verts = (c_lo * (1 - t[:, None]) + c_hi * t[:, None]) * sp

    # orient: normal must point toward +field. Every output vertex lies
    # on an edge crossing inside→outside; the inside→outside direction
    # of each crossing edge has a strictly positive component along the
    # outward normal of the (planar) in-tet surface patch, so the sum
    # over a face's three edge directions does too. This uses only the
    # per-vertex endpoint coords already in hand — the previous
    # inside/outside tet-centroid test converted 4 corner ids per
    # triangle (~7M id→coord conversions at flagship scale, the single
    # hottest block of the extraction).
    #
    # The test normal is computed from the EXACT t=1/2 midpoint
    # triangle, not the interpolated one: midpoints are integer-exact,
    # so the winding decision is a pure function of the crossing-edge
    # topology. The interpolated triangle of a sliver configuration has
    # a ULP-unstable normal, and the sparse two-level grid path
    # (grid_eval.eval_sdf_grid_sparse) reproduces the dense field only
    # to ~1 ULP — a position-dependent decision made those sliver
    # windings differ between sparse and dense extractions. The
    # midpoint triangle is isotopic to the interpolated one inside the
    # tet, so the decided orientation agrees for every non-degenerate
    # face.
    d_out = (c_hi - c_lo) * np.sign(vb - va)[:, None]          # (V, 3)
    mid = (c_lo + c_hi) * (0.5 * sp)
    tm = mid[faces]
    n_mid = np.cross(tm[:, 1] - tm[:, 0], tm[:, 2] - tm[:, 0])
    flip = (n_mid * d_out[faces].sum(axis=1)).sum(1) < 0
    faces[flip] = faces[flip][:, [0, 2, 1]]

    # drop degenerate (zero-area) triangles from edge-touching levels
    tv = verts[faces]
    area2 = np.linalg.norm(np.cross(tv[:, 1] - tv[:, 0], tv[:, 2] - tv[:, 0]), axis=1)
    faces = faces[area2 > 1e-300]

    # vertex normals from field gradient (toward +field) — central
    # differences evaluated ONLY at the crossing-edge endpoints (the
    # formula np.gradient applies everywhere, incl. its one-sided
    # boundary stencil, which index clamping reproduces exactly); a
    # full-volume np.gradient was ~3 s and 3 volume-sized temporaries
    # at 256³ for ~2·#verts needed values.
    if not compute_normals:
        # the differentiable path discards normals/values — skip the
        # two central-difference passes over the edge endpoints
        values = va * (1 - t) + vb * t + float(level)
        if return_topology:
            return verts, faces, None, values, {"u_lo": u_lo, "u_hi": u_hi, "t": t}
        return verts, faces, None, values

    idx_lo = np.stack([u_lo // (ny * nz), (u_lo // nz) % ny, u_lo % nz], 1)
    idx_hi = np.stack([u_hi // (ny * nz), (u_hi // nz) % ny, u_hi % nz], 1)
    dims = (nx, ny, nz)

    def grad_at(idx):
        out = np.empty((len(idx), 3))
        for a in range(3):
            ip = np.minimum(idx[:, a] + 1, dims[a] - 1)
            im = np.maximum(idx[:, a] - 1, 0)
            cols = [idx[:, 0], idx[:, 1], idx[:, 2]]
            cols_p = list(cols); cols_p[a] = ip
            cols_m = list(cols); cols_m[a] = im
            out[:, a] = (F[tuple(cols_p)] - F[tuple(cols_m)]) / ((ip - im) * sp[a])
        return out

    normals = grad_at(idx_lo) * (1 - t[:, None]) + grad_at(idx_hi) * t[:, None]
    norm = np.linalg.norm(normals, axis=1, keepdims=True)
    normals = normals / np.where(norm > 0, norm, 1.0)

    values = va * (1 - t) + vb * t + float(level)
    if return_topology:
        return verts, faces, normals, values, {"u_lo": u_lo, "u_hi": u_hi, "t": t}
    return verts, faces, normals, values


# API-compatible alias used by mesh extraction (mirrors skimage name)
marching_cubes = marching_tetrahedra
