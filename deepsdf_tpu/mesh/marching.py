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

# The union of all tet edges over the 6-tet decomposition is exactly 7
# stencil directions from each grid point (3 cube edges, 3 face
# diagonals — one per face pair, both faces of a pair use the same
# diagonal orientation — and the main diagonal). Enumerating crossing
# edges as 7 shifted sign-comparisons over the whole grid replaces the
# per-triangle np.unique weld (a sort over 3·#triangles int64 keys,
# the hottest block of the extraction at flagship scale).
_EDGE_DIRS = np.unique(np.concatenate([
    np.abs(_CORNERS[_TETS[:, a]] - _CORNERS[_TETS[:, b]])
    for a, b in _TET_EDGES]), axis=0)
assert len(_EDGE_DIRS) == 7

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


def _build_winding_table():
    """Precompute the outward-winding decision per (tet id, case, tri
    slot). The runtime test used the t=1/2 midpoint triangle's normal
    against the summed inside→outside edge directions; that decision is
    translation/positive-scaling invariant and independent of the field
    VALUES (the interpolated triangle is isotopic to the midpoint one
    inside the tet), so it is a pure function of (tet, case, slot) —
    evaluated once here on the canonical unit cube instead of per
    output face (the hottest block of the extraction at flagship
    scale). True = emit the triangle with vertices (0, 2, 1)."""
    flip = np.zeros((6, 16, 2), dtype=bool)
    for tet_id in range(6):
        corners = _CORNERS[_TETS[tet_id]].astype(np.float64)  # (4, 3)
        for case in range(1, 15):
            inside = [(case >> v) & 1 == 1 for v in range(4)]
            for slot, tri in enumerate(_CASE_TRIS[case]):
                pts, douts = [], []
                for e in tri:
                    a, b = _TET_EDGES[e]
                    pts.append(0.5 * (corners[a] + corners[b]))
                    sgn = 1.0 if inside[a] else -1.0  # a inside → a→b is in→out
                    douts.append(sgn * (corners[b] - corners[a]))
                n = np.cross(pts[1] - pts[0], pts[2] - pts[0])
                flip[tet_id, case, slot] = float(n @ np.sum(douts, axis=0)) < 0
    return flip


_FLIP_TABLE = _build_winding_table()


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
    # (int32: grid ids stay < 2^31 for any realistic grid, and the
    # triangle-expansion gathers below are memory-bound)
    corner_ids = (((ci[:, None] + _CORNERS[:, 0]) * ny
                   + (cj[:, None] + _CORNERS[:, 1])) * nz
                  + (ck[:, None] + _CORNERS[:, 2])).astype(np.int32)

    Ff = F.ravel()
    inside_f = inside.ravel()
    # per active cell × 6 tets → (A*6, 4) global point ids; the case
    # test gathers the precomputed BOOL mask, not the float64 field
    tet_pts = corner_ids[:, _TETS].reshape(-1, 4)
    tet_inside = inside_f[tet_pts]
    case = (tet_inside * np.array([1, 2, 4, 8])).sum(axis=1)
    keep = (case > 0) & (case < 15)
    tet_pts = tet_pts[keep]
    case = case[keep]
    tet6 = np.tile(np.arange(6, dtype=np.int8), len(ci))[keep]  # tet id in cube

    # expand to triangles, with the precomputed outward winding applied
    # at emission (replaces the per-face geometric orientation test)
    ntri = _TRI_COUNT[case]                     # (T,) in {1,2}
    tri_tet_idx = np.repeat(np.arange(len(case)), ntri)
    tri_slot = (np.arange(ntri.sum()) - np.repeat(np.cumsum(ntri) - ntri, ntri))
    case_t = case[tri_tet_idx]
    tri_edges = _TRI_TABLE[case_t, tri_slot]                   # (Ntri, 3) edge ids
    flip = _FLIP_TABLE[tet6[tri_tet_idx], case_t, tri_slot]
    tri_edges[flip] = tri_edges[flip][:, [0, 2, 1]]

    # edge → (global point a, global point b)
    ev = _TET_EDGES[tri_edges]                                 # (Ntri, 3, 2) local verts
    pa = np.take_along_axis(tet_pts[tri_tet_idx], ev[..., 0], axis=1)
    pb = np.take_along_axis(tet_pts[tri_tet_idx], ev[..., 1], axis=1)

    # --- weld shared edge-vertices (sort-free enumeration) ---
    # The output vertex set is exactly the set of sign-crossing tet
    # edges, and every tet edge is one of the 7 stencil directions
    # from its lower grid point — so enumerate crossing edges with 7
    # shifted sign-comparisons over the whole grid instead of welding
    # 3·#triangles duplicated keys with np.unique (a large sort, the
    # hottest block at flagship scale). Vertex ORDER is kept identical
    # to the former np.unique(lo·npts+hi): ascending (lo, hi), which
    # (since hi = lo + offset) equals ascending packed key lo·8+rank
    # with directions ranked by flat offset.
    npts = nx * ny * nz
    offs = (_EDGE_DIRS[:, 0] * ny + _EDGE_DIRS[:, 1]) * nz + _EDGE_DIRS[:, 2]
    rank = np.argsort(offs, kind="stable")
    offs_sorted = offs[rank]
    keys = []
    for d, di in enumerate(rank):
        dx, dy, dz = _EDGE_DIRS[di]
        m = inside[:nx - dx, :ny - dy, :nz - dz] != inside[dx:, dy:, dz:]
        ii, jj, kk = np.nonzero(m)
        keys.append((((ii * ny + jj) * nz + kk) * 8 + d).astype(np.int64))
    keys = np.concatenate(keys)
    keys.sort(kind="stable")
    u_lo = keys >> 3
    u_hi = u_lo + offs_sorted[keys & 7]

    # triangle corners → vertex ids. Direction rank by small lookup;
    # key→vertex-id by a direct-address table when it fits (one gather)
    # or binary search otherwise (every triangle edge is a crossing tet
    # edge, so lookups always hit).
    lo = np.minimum(pa, pb)
    delta = np.maximum(pa, pb) - lo
    dlut = np.zeros(int(offs_sorted[-1]) + 1, np.int64)
    dlut[offs_sorted] = np.arange(7)
    tri_keys = lo.astype(np.int64) * 8 + dlut[delta]
    if npts <= 4_000_000:                       # ≤128 MB table
        vmap = np.empty(npts * 8, np.int32)
        vmap[keys] = np.arange(len(keys), dtype=np.int32)
        faces = vmap[tri_keys].astype(np.int64)
    else:
        faces = np.searchsorted(keys, tri_keys)
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

    # orientation (normal toward +field) was applied at triangle
    # emission via _FLIP_TABLE — the same t=1/2 midpoint-triangle test
    # the former per-face pass ran (value-independent and invariant
    # under translation/positive scaling, so one decision per
    # (tet, case, slot) on the canonical cube covers every face; see
    # _build_winding_table).

    # drop degenerate (zero-area) triangles from edge-touching levels.
    # A face can only degenerate when a crossing lands exactly on a
    # grid point (t = 0 or 1): distinct tet edges intersect at corners
    # only, so strictly interior crossings are pairwise distinct.
    # Compute the exact area test only on those candidate faces.
    t_face = t[faces]
    cand = np.flatnonzero(((t_face == 0.0) | (t_face == 1.0)).any(axis=1))
    if len(cand):
        tv = verts[faces[cand]]
        area2 = np.linalg.norm(
            np.cross(tv[:, 1] - tv[:, 0], tv[:, 2] - tv[:, 0]), axis=1)
        bad = cand[area2 <= 1e-300]
        if len(bad):
            faces = np.delete(faces, bad, axis=0)

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
