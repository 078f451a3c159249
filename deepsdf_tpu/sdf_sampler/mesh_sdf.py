"""Signed distance from a triangle mesh — accelerator-native.

Replaces the reference's libigl ``point_mesh_squared_distance`` +
embree ray-containment sign (ref: sdf_sampler/sdf_sampler.py:201-242)
with a single fused JAX computation:

  * unsigned distance: exact point-triangle distance (Ericson's
    region-classification scheme, branchless via masks) reduced over
    all triangles,
  * sign: generalized winding number (van Oosterom–Strackee solid
    angle per triangle, Barill et al. 2018) — numerically robust for
    watertight and even moderately degenerate meshes, no ray casting
    or BVH needed on a TPU: the all-pairs sweep is a bandwidth-friendly
    streaming reduction that XLA pipelines.

Complexity is O(Q·T) streamed in tiles; for the reference's workloads
(≤1e5 queries × ~1e4 triangles) this is a sub-second device kernel.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from functools import partial


def _point_triangle_sq_dist(p, a, b, c):
    """Squared distance from points ``p`` (Q,3) to one triangle per row
    of (T,3) broadcast as (Q,T,3) — returns (Q,T)."""
    ab = b - a
    ac = c - a
    ap = p - a

    d1 = jnp.sum(ab * ap, -1)
    d2 = jnp.sum(ac * ap, -1)
    d3 = jnp.sum(ab * (p - b), -1)
    d4 = jnp.sum(ac * (p - b), -1)
    d5 = jnp.sum(ab * (p - c), -1)
    d6 = jnp.sum(ac * (p - c), -1)

    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2

    eps = 1e-30
    # interior (face) projection
    denom = va + vb + vc
    v_face = vb / jnp.where(jnp.abs(denom) < eps, eps, denom)
    w_face = vc / jnp.where(jnp.abs(denom) < eps, eps, denom)
    proj_face = a + v_face[..., None] * ab + w_face[..., None] * ac

    # edge/vertex regions
    t_ab = jnp.clip(d1 / jnp.where(jnp.abs(d1 - d3) < eps, eps, d1 - d3), 0.0, 1.0)
    proj_ab = a + t_ab[..., None] * ab
    t_ac = jnp.clip(d2 / jnp.where(jnp.abs(d2 - d6) < eps, eps, d2 - d6), 0.0, 1.0)
    proj_ac = a + t_ac[..., None] * ac
    t_bc = jnp.clip((d4 - d3) / jnp.where(jnp.abs((d4 - d3) + (d5 - d6)) < eps, eps,
                                          (d4 - d3) + (d5 - d6)), 0.0, 1.0)
    proj_bc = b + t_bc[..., None] * (c - b)

    in_vert_a = (d1 <= 0) & (d2 <= 0)
    in_vert_b = (d3 >= 0) & (d4 <= d3)
    in_vert_c = (d6 >= 0) & (d5 <= d6)
    in_edge_ab = (vc <= 0) & (d1 >= 0) & (d3 <= 0)
    in_edge_ac = (vb <= 0) & (d2 >= 0) & (d6 <= 0)
    in_edge_bc = (va <= 0) & (d4 - d3 >= 0) & (d5 - d6 >= 0)

    proj = proj_face
    proj = jnp.where(in_edge_bc[..., None], proj_bc, proj)
    proj = jnp.where(in_edge_ac[..., None], proj_ac, proj)
    proj = jnp.where(in_edge_ab[..., None], proj_ab, proj)
    proj = jnp.where(in_vert_c[..., None], c, proj)
    proj = jnp.where(in_vert_b[..., None], b, proj)
    proj = jnp.where(in_vert_a[..., None], a, proj)

    d = p - proj
    return jnp.sum(d * d, -1)


def _solid_angle(p, a, b, c):
    """Signed solid angle of triangle (a,b,c) seen from p, /4pi.
    van Oosterom & Strackee 1983. Shapes broadcast to (Q,T)."""
    ra = a - p
    rb = b - p
    rc = c - p
    la = jnp.linalg.norm(ra, axis=-1)
    lb = jnp.linalg.norm(rb, axis=-1)
    lc = jnp.linalg.norm(rc, axis=-1)
    num = jnp.sum(ra * jnp.cross(rb, rc), -1)
    den = (la * lb * lc + jnp.sum(ra * rb, -1) * lc
           + jnp.sum(ra * rc, -1) * lb + jnp.sum(rb * rc, -1) * la)
    return 2.0 * jnp.arctan2(num, den) / (4.0 * jnp.pi)


@partial(jax.jit, static_argnames=("tri_chunk",))
def _signed_distance_chunk(queries, va, vb, vc, tri_chunk: int = 2048):
    """(Qc,3) queries vs padded triangle arrays (Tpad,3) → (Qc,) signed."""
    n_tri = va.shape[0]

    def body(carry, tri_idx):
        best_sq, wind = carry
        sl = lambda x: jax.lax.dynamic_slice_in_dim(x, tri_idx * tri_chunk, tri_chunk)
        a, b, c = sl(va), sl(vb), sl(vc)
        p = queries[:, None, :]
        sq = _point_triangle_sq_dist(p, a[None], b[None], c[None])
        best_sq = jnp.minimum(best_sq, jnp.min(sq, axis=1))
        wind = wind + jnp.sum(_solid_angle(p, a[None], b[None], c[None]), axis=1)
        return (best_sq, wind), None

    n_chunks = n_tri // tri_chunk
    init = (jnp.full(queries.shape[0], jnp.inf), jnp.zeros(queries.shape[0]))
    (best_sq, wind), _ = jax.lax.scan(body, init, jnp.arange(n_chunks))
    dist = jnp.sqrt(best_sq)
    inside = wind > 0.5
    return jnp.where(inside, -dist, dist)


class SDFfromMesh:
    """Signed distance for triangle meshes (API ref: sdf_sampler.py:201-242).

    Accepts either an object with ``.vertices``/``.faces`` or an
    explicit (vertices, faces) pair.
    """

    def __init__(self, mesh=None, dtype=np.float32, flip_sign=False,
                 vertices=None, faces=None, tri_chunk=2048, query_chunk=8192):
        if mesh is not None:
            vertices = np.asarray(mesh.vertices, dtype=np.float32)
            faces = np.asarray(mesh.faces, dtype=np.int32)
        vertices = np.asarray(vertices, dtype=np.float32)
        faces = np.asarray(faces, dtype=np.int32)
        self.dtype = dtype
        self.flip_sign = flip_sign
        self.query_chunk = int(query_chunk)

        tri = vertices[faces]  # (T, 3, 3)
        n_tri = tri.shape[0]
        tri_chunk = min(tri_chunk, max(128, n_tri))
        pad = (-n_tri) % tri_chunk
        if pad:
            # pad with far-away degenerate triangles: distance ~inf, zero solid angle
            far = np.full((pad, 3, 3), 1e6, dtype=np.float32)
            tri = np.concatenate([tri, far], axis=0)
        self._va = jnp.asarray(tri[:, 0])
        self._vb = jnp.asarray(tri[:, 1])
        self._vc = jnp.asarray(tri[:, 2])
        self._tri_chunk = tri_chunk

    def __call__(self, queries):
        q = np.asarray(queries, dtype=np.float32)
        out = np.empty(q.shape[0], dtype=self.dtype)
        for start in range(0, q.shape[0], self.query_chunk):
            chunk = q[start:start + self.query_chunk]
            n = chunk.shape[0]
            pad = (-n) % 256
            if pad:
                chunk = np.concatenate([chunk, np.zeros((pad, 3), np.float32)])
            d = _signed_distance_chunk(
                jnp.asarray(chunk), self._va, self._vb, self._vc, self._tri_chunk
            )
            out[start:start + n] = np.asarray(d)[:n]
        if self.flip_sign:
            out = -out
        return out.reshape(-1, 1)
