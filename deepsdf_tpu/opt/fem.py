"""Linear-elasticity FEM on tetrahedral meshes — JAX, matrix-free, TPU-ready.

Replaces the reference's PyMFEM solver (ref:
analysis/MFEMLinearElasticity.py:268-424 ``LinearElasticitySolver``):
P1 vector elements on tets, bilinear form
a(u,v) = ∫ λ div u div v + 2μ ε(u):ε(v), essential BCs by dof masking,
surface loads as lumped nodal forces, CG with block-Jacobi (per-node
3×3) preconditioning. The operator is applied matrix-free:
gather element dofs → 12×12 element stiffness contraction → scatter-add
— the gather/compute/scatter pattern XLA maps well to TPU, replacing
the host-side sparse GSSmoother CG of the reference (ref :317-326).

Outputs match the reference's API surface: compliance
(∫ strain-energy density, ref :371-385), volume (ref :387-403), and
Allaire boundary-form shape derivatives for compliance and volume
(ref :343-369, :405-424).
"""

from __future__ import annotations

import logging
import math
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

logger = logging.getLogger(__name__)


class FEMSolveDiverged(RuntimeError):
    """Raised when every solver level fails: the stiffness system is
    mechanism-singular (structure detached / pinched off). The
    optimization driver treats this as a graceful end of the run
    (mirrors the reference's own round_cross_base log, which ends in
    the same regime — optimization_runs/PARITY_NOTES.md)."""


# ---------------- element geometry ----------------

def _det3(e):
    """Batched 3×3 determinant, closed form (keeps the TPU program on
    plain VPU arithmetic — the batched-LU `jnp.linalg.det/inv` path is
    both slower and was implicated in the flagship-scale kernel fault)."""
    return (e[..., 0, 0] * (e[..., 1, 1] * e[..., 2, 2] - e[..., 1, 2] * e[..., 2, 1])
            - e[..., 0, 1] * (e[..., 1, 0] * e[..., 2, 2] - e[..., 1, 2] * e[..., 2, 0])
            + e[..., 0, 2] * (e[..., 1, 0] * e[..., 2, 1] - e[..., 1, 1] * e[..., 2, 0]))


def _inv3(e, det=None):
    """Batched 3×3 inverse via the adjugate (closed form)."""
    if det is None:
        det = _det3(e)
    adj = jnp.stack([
        jnp.stack([e[..., 1, 1] * e[..., 2, 2] - e[..., 1, 2] * e[..., 2, 1],
                   e[..., 0, 2] * e[..., 2, 1] - e[..., 0, 1] * e[..., 2, 2],
                   e[..., 0, 1] * e[..., 1, 2] - e[..., 0, 2] * e[..., 1, 1]], -1),
        jnp.stack([e[..., 1, 2] * e[..., 2, 0] - e[..., 1, 0] * e[..., 2, 2],
                   e[..., 0, 0] * e[..., 2, 2] - e[..., 0, 2] * e[..., 2, 0],
                   e[..., 0, 2] * e[..., 1, 0] - e[..., 0, 0] * e[..., 1, 2]], -1),
        jnp.stack([e[..., 1, 0] * e[..., 2, 1] - e[..., 1, 1] * e[..., 2, 0],
                   e[..., 0, 1] * e[..., 2, 0] - e[..., 0, 0] * e[..., 2, 1],
                   e[..., 0, 0] * e[..., 1, 1] - e[..., 0, 1] * e[..., 1, 0]], -1),
    ], -2)
    return adj / det[..., None, None]


def _grad_shape(verts, tets):
    """P1 shape-function gradients per element: (T, 4, 3), + volumes (T,)."""
    v = verts[tets]                                   # (T, 4, 3)
    e = v[:, 1:] - v[:, :1]                           # (T, 3, 3) edge matrix rows
    det = _det3(e)
    vol = det / 6.0                                   # signed; positive for oriented mesh
    inv = _inv3(e, det)
    # barycentric λ satisfy x − v0 = Eᵀλ (E rows = edges) ⇒ ∂λ_i/∂x_j = inv(E)[j, i]
    gN = jnp.stack([inv[:, :, 0], inv[:, :, 1], inv[:, :, 2]], axis=1)  # (T,3,3) ∇N1..3
    g0 = -gN.sum(axis=1, keepdims=True)
    return jnp.concatenate([g0, gN], axis=1), vol     # (T,4,3), (T,)


def _element_strain(u_e, gN):
    """u_e: (T, 4, 3) nodal displacements; gN: (T, 4, 3) shape grads.
    Returns grad (T, 3, 3) = ∂u_i/∂x_j (constant per element)."""
    return jnp.einsum("tai,taj->tij", u_e, gN)


# ---------------- mesh container ----------------

class ElasticitySolver:
    """API in the spirit of ref LinearElasticitySolver (:268-330)."""

    def __init__(self, vertices, tets, lam: float, mu: float):
        # host-resident by default: the optimization outer loop runs FEM on
        # CPU (like the reference); arrays move to device only in the
        # method='jax' solve path
        self.vertices = np.asarray(vertices, dtype=np.float64)
        self.tets = np.asarray(tets, dtype=np.int32)
        self.lam = float(lam)
        self.mu = float(mu)
        self.ess_mask = None       # (V,) bool — essential (fixed) vertices
        self.force = None          # (V, 3) nodal force vector
        self.u = None

    # ---- boundary conditions ----

    def set_essential_vertices(self, vert_mask):
        self.ess_mask = np.asarray(vert_mask, dtype=bool)

    def set_surface_load(self, faces, load):
        """Lumped consistent load: each marked boundary face spreads
        area·load/3 to its vertices (ref VectorBoundaryLFIntegrator,
        :304-305)."""
        faces = np.asarray(faces)
        verts = np.asarray(self.vertices)
        f = np.zeros_like(verts)
        if len(faces):
            tv = verts[faces]
            area = 0.5 * np.linalg.norm(
                np.cross(tv[:, 1] - tv[:, 0], tv[:, 2] - tv[:, 0]), axis=1)
            contrib = (area[:, None] / 3.0) * np.asarray(load)[None, :]
            for k in range(3):
                np.add.at(f, faces[:, k], contrib)
        self.force = f

    # ---- solve ----

    def solve(self, rel_tol: float = 1e-10, max_iter: int = 10000,
              method: str = "scipy", u0=None):
        """``method='scipy'``: float64 sparse-assembled CG on host (the
        reference's FEM also runs host-side, ref :317-326); ``'jax'``:
        matrix-free block-Jacobi CG on the accelerator. ``u0`` warm-starts
        the refinement (e.g. the previous optimization iterate's field)."""
        if self.force is None:
            raise ValueError("no load set — call set_surface_load first")
        if self.ess_mask is None or not self.ess_mask.any():
            # no essential dofs: pure-Neumann elasticity is singular
            # (rigid-body modes) — diverging CG would mask the real
            # problem, usually a structure detached from the fixed plane
            raise ValueError(
                "no essential boundary vertices — the structure does not "
                "reach the fixed-BC plane (marker 1); the FEM system is "
                "singular")
        if method == "jax":
            self.u = _solve_jax_refined(self.vertices, self.tets, self.lam,
                                        self.mu, self.force, self.ess_mask,
                                        rel_tol, max_iter, x0=u0)
        else:
            self.u = _solve_scipy(self.vertices, self.tets, self.lam, self.mu,
                                  self.force, self.ess_mask, rel_tol, max_iter,
                                  x0=u0)
        return self.u

    # ---- outputs ----

    def strain_energy_density_elements(self):
        """Host (numpy) SED per element + |volumes|."""
        gN, vol = _grad_shape_np(self.vertices, self.tets)
        grad = np.einsum("tai,taj->tij", self.u[self.tets], gN)
        div = np.trace(grad, axis1=1, axis2=2)
        sed = (self.lam * div ** 2
               + self.mu * np.einsum("tij,tij->t", grad,
                                     grad + np.swapaxes(grad, 1, 2)))
        return sed, np.abs(vol)

    def vertex_sed(self):
        """Volume-weighted nodal projection of the elementwise SED
        (analog of ref clcStrainEnergyDensity's H1 projection :338-341)."""
        sed, vol = self.strain_energy_density_elements()
        sed, vol = np.asarray(sed), np.asarray(vol)
        tets = np.asarray(self.tets)
        acc = np.zeros(len(self.vertices))
        wacc = np.zeros(len(self.vertices))
        for k in range(4):
            np.add.at(acc, tets[:, k], sed * vol)
            np.add.at(wacc, tets[:, k], vol)
        return acc / np.maximum(wacc, 1e-300)

    def compliance(self) -> float:
        """∫ SED = a(u,u) = f·u (ref clcTotCompliance :371-385)."""
        sed, vol = self.strain_energy_density_elements()
        return float(np.sum(sed * vol))

    def volume(self) -> float:
        _, vol = _grad_shape_np(self.vertices, self.tets)
        return float(np.sum(np.abs(vol)))

    def boundary_normal_integral(self, faces, vertex_vec):
        """∫_Γ v·n over marked faces with P1 vector field v
        (ref BoundaryNormalLFIntegrator b.Sum(), :363-369,:418-424).

        ``vertex_vec``: (V, 3) → float, or (V, 3, D) → (D,) array (one
        integral per trailing design direction — the optimization
        driver's batched-sensitivity path)."""
        verts = np.asarray(self.vertices)
        v = np.asarray(vertex_vec)
        tv = verts[faces]
        n = 0.5 * np.cross(tv[:, 1] - tv[:, 0], tv[:, 2] - tv[:, 0])  # area-weighted normal
        vmean = v[faces].mean(axis=1)
        if v.ndim == 3:
            return np.einsum("fi,fid->d", n, vmean)
        return float(np.einsum("fi,fi->", n, vmean))

    def compliance_shape_derivative(self, faces, theta) -> float:
        """dC[θ] = −∫_Γ SED (θ·n) (ref clcComplianceShapeDerivative
        :343-369: boundary-normal integral of −SED·θ)."""
        sed_v = self.vertex_sed()
        return self.boundary_normal_integral(faces, -sed_v[:, None] * np.asarray(theta))

    def volume_shape_derivative(self, faces, theta) -> float:
        """dV[θ] = ∫_Γ θ·n (ref clcVolumeShapeDerivative :405-424)."""
        return self.boundary_normal_integral(faces, theta)


# ---------------- host (float64) path ----------------

def _grad_shape_np(verts, tets):
    v = verts[tets]
    e = v[:, 1:] - v[:, :1]
    vol = np.linalg.det(e) / 6.0
    inv = np.linalg.inv(e)
    gN = np.stack([inv[:, :, 0], inv[:, :, 1], inv[:, :, 2]], axis=1)
    g0 = -gN.sum(axis=1, keepdims=True)
    return np.concatenate([g0, gN], axis=1), vol


def _island_filter(tets, ess_mask, force, V):
    """Island removal, shared by both FEM paths: a design step can pinch
    a strut to zero so a piece of the structure detaches outright. A
    detached component carries rigid-body modes — the assembled system
    is EXACTLY singular and no solver level can produce a meaningful
    iterate (observed: round_cross_more_knot_vecs iter 27+, relres
    pinned at ~1 across the whole ladder). Graph-partition the tet mesh
    and keep only components anchored to the essential boundary:
    dropped (unloaded) debris gets u=0 and contributes nothing to f·u,
    so the anchored structure's compliance stays exact. Load on a
    detached component means infinite physical compliance — that IS a
    mechanism, raise FEMSolveDiverged.

    Returns (referenced, anchored) bool masks over vertices."""
    from scipy.sparse import csr_matrix
    from scipy.sparse.csgraph import connected_components

    referenced = np.zeros(V, bool)
    referenced[np.asarray(tets).reshape(-1)] = True

    t_arr = np.asarray(tets)
    gi = np.concatenate([t_arr[:, 0], t_arr[:, 0], t_arr[:, 0]])
    gj = np.concatenate([t_arr[:, 1], t_arr[:, 2], t_arr[:, 3]])
    # int32 data: COO construction sums duplicate slot-pairs; int8
    # could in principle wrap to 0 mod 256 and silently delete an edge
    # (only the sparsity pattern matters here)
    adj = csr_matrix((np.ones(len(gi), np.int32), (gi, gj)), shape=(V, V))
    n_comp, labels = connected_components(adj + adj.T, directed=False)
    anchored_labels = np.unique(labels[ess_mask & referenced])
    anchored = np.isin(labels, anchored_labels) & referenced
    n_drop = int(referenced.sum() - anchored.sum())
    if n_drop:
        loose = referenced & ~anchored
        f_loose = float(np.abs(np.asarray(force)[loose]).sum())
        if f_loose > 0:
            raise FEMSolveDiverged(
                f"structure detached: {n_drop} vertices in components "
                f"with no essential anchoring carry {f_loose:.3g} of "
                "applied load — the loaded part is a free body (infinite "
                "compliance)")
        logger.warning(
            "island removal: dropping %d unanchored vertices in %d loose "
            "component(s) (unloaded debris; u=0 there)", n_drop,
            len(np.unique(labels[loose])))
    return referenced, anchored


def _solve_scipy(verts, tets, lam, mu, force, ess_mask, rel_tol, max_iter,
                 x0=None):
    """Host float64 solve, converged: ILU-preconditioned BiCGStab with
    an SA-AMG-CG fallback.

    The reference runs CG+GSSmoother at PrintLevel(0) (ref :317-326) —
    it never reports whether it converged. On the optimizer's trimmed
    lattice meshes the system is dominated by a BAND of localized
    floppy modes (struts thinned toward mechanisms; measured
    lambda_min ~1e-5..1e-4 vs O(1) diagonal, participation ratio
    <0.14, round-3 eigen study), which defeats every one-level smoother
    (Jacobi-CG stalls at 1e-1) and rigid-body SA-AMG coarse spaces
    (0.98/iter tail even with an EXACT 25k-dof coarse solve). Local
    modes yield to local factorization: SuperLU ILUTP (drop 1e-4,
    fill ~3x, setup ~20 s at 386k dofs) + BiCGStab (ILUTP pivoting is
    unsymmetric, so CG is invalid) reaches ~1e-7 relative residual in
    ~250 iterations on the worst observed flagship mesh. The system is
    restricted to REFERENCED free dofs first: stuffed meshes carry
    ~27% grid vertices referenced by no tet (zero rows) which waste
    work and break factorizations."""
    from scipy.sparse import coo_matrix
    from scipy.sparse.linalg import bicgstab, cg, spilu

    V = len(verts)
    gN, vol = _grad_shape_np(verts, tets)
    vol = np.abs(vol)
    # element stiffness K[ai, bj] = vol [λ g_ai g_bj + μ(g_a·g_b)δ_ij + μ g_bi g_aj]
    dots = np.einsum("tai,tbi->tab", gN, gN)
    K = (lam * np.einsum("t,tai,tbj->taibj", vol, gN, gN)
         + mu * np.einsum("t,tab,ij->taibj", vol, dots, np.eye(3))
         + mu * np.einsum("t,tbi,taj->taibj", vol, gN, gN))
    rows = (3 * tets[:, :, None, None, None] + np.arange(3)[None, None, :, None, None])
    cols = (3 * tets[:, None, None, :, None] + np.arange(3)[None, None, None, None, :])
    rows = np.broadcast_to(rows, K.shape).ravel()
    cols = np.broadcast_to(cols, K.shape).ravel()
    A = coo_matrix((K.ravel(), (rows, cols)), shape=(3 * V, 3 * V)).tocsr()

    referenced, anchored = _island_filter(tets, ess_mask, force, V)

    keep_v = anchored & ~ess_mask
    keep = np.repeat(keep_v, 3)
    b = force.ravel()[keep]
    Aff = A[keep][:, keep]

    from scipy.sparse.linalg import LinearOperator
    import time as _time

    bnorm = max(np.linalg.norm(b), 1e-300)
    x0f = None if x0 is None else np.asarray(x0, np.float64).ravel()[keep]

    def _relres(x):
        return np.linalg.norm(Aff @ x - b) / bnorm

    x = None
    best = None  # (relres, x) across attempts
    # accept well below the request but far above float64 noise: at
    # 1e-6 the compliance error (energy-norm-squared) is negligible
    accept_tol = max(rel_tol * 1e3, 1e-6)
    # BiCGStab costs 2 matvecs + 2 precond applies per iteration; a
    # converged ILU solve needs O(10^2) iterations, so a 10^4 budget
    # would just burn ~30 min before falling back. Bound it.
    bicg_iter = min(max_iter, 1500)

    class _Abort(Exception):
        pass

    class _Monitor:
        """Kill doomed BiCGStab runs early: a diverging or stagnating
        weak-ILU attempt used to burn the full 1500-iteration budget
        (~700 s on the flagship mesh) before escalation, while the
        stronger factor then converged in ~10 iterations. One extra
        matvec every `check` iterations buys the exit."""

        def __init__(self, check=50):
            self.n = 0
            self.check = check
            self.last_rr = None
            self.xk = None
            self.stalled = 0

        def __call__(self, xk):
            self.n += 1
            self.xk = xk
            if self.n % self.check:
                return
            rr = _relres(xk)
            if rr > 5.0:
                raise _Abort(f"diverged: relres {rr:.2e} at iter {self.n}")
            if self.last_rr is not None and rr > accept_tol:
                # BiCGStab residuals are non-monotone: a single flat
                # checkpoint can be a transient plateau, so require TWO
                # consecutive stagnant checkpoints before giving up on
                # this factorization (advisor round 3)
                f = rr / max(self.last_rr, 1e-300)
                if f >= 0.95:
                    self.stalled += 1
                    if self.stalled >= 2:
                        raise _Abort(f"stagnated: relres {rr:.2e} "
                                     f"(x{f:.3f}/{self.check} iters, "
                                     f"2 checks) at iter {self.n}")
                else:
                    self.stalled = 0
            self.last_rr = rr

    # escalating factor strength: thinner struts (late optimizer
    # iterations) occasionally defeat the cheap factor. The level that
    # last converged is sticky across solves (consecutive optimizer
    # iterations share mesh character, so a failed weak factor would
    # keep failing every iteration).
    levels = ((1e-4, 12), (3e-6, 30))
    # The level that last converged is sticky PER PROBLEM-SIZE BUCKET.
    # Exact ndof is the wrong key: trimmed-lattice meshes change vertex
    # count every optimizer iteration, so an exact key never re-fires
    # and every iteration re-pays a doomed weak-ILU attempt (~165 s on
    # the opti_double_lattice family — observed round 5). A ~15%-wide
    # log-space bucket groups consecutive iterations of one mesh family
    # while still separating unrelated runs/tests in the same process
    # (the advisor-round-3 leak concern). The weak factor is retried
    # every 8th solve so a transient escalation doesn't pin the
    # fill_factor=30 cost forever.
    key = _size_bucket(Aff.shape[0])
    start = _solve_scipy._sticky_level.get(key, 0)
    _solve_scipy._solve_count[key] = _solve_scipy._solve_count.get(key, 0) + 1
    if start > 0 and _solve_scipy._solve_count[key] % 8 == 0:
        start = 0
    # sticky level len(levels) == the direct solver: during a
    # mechanism-adjacent phase both ILU factorizations fail every
    # iteration (2 setups + 2x50 wasted BiCGStab iters, ~5-10 min on
    # this mesh family) before the direct level rescues the solve —
    # skip straight there until the periodic retry above resets.
    for li in range(min(start, len(levels)), len(levels)):
        drop, ff = levels[li]
        t0 = _time.time()
        try:
            ilu = spilu(Aff.tocsc(), drop_tol=drop, fill_factor=ff,
                        permc_spec="MMD_AT_PLUS_A",
                        options=dict(SymmetricMode=True))
            Minv = LinearOperator(Aff.shape, matvec=ilu.solve)
            t_setup = _time.time() - t0
            mon = _Monitor()
            t0 = _time.time()
            try:
                cand, info = bicgstab(Aff, b, rtol=rel_tol,
                                      maxiter=bicg_iter, M=Minv, x0=x0f,
                                      callback=mon)
            except _Abort as e:
                logger.warning("ILU(%g,%g)-BiCGStab aborted early: %s "
                               "(solve %.1fs)", drop, ff, e,
                               _time.time() - t0)
                cand, info = mon.xk, -1
                if cand is None:
                    continue
            rr = _relres(cand)
            logger.info("ILU(%g,%g)-BiCGStab: %d iters, relres %.2e "
                        "(setup %.1fs, solve %.1fs)", drop, ff, mon.n, rr,
                        t_setup, _time.time() - t0)
            if np.isfinite(rr) and (best is None or rr < best[0]):
                best = (rr, cand)
            if rr <= accept_tol:
                x = cand
                _solve_scipy._sticky_level[key] = li
                break
            logger.warning("ILU(%g)-BiCGStab stalled at relres %.2e "
                           "(info=%s)", drop, rr, info)
        except Exception:
            logger.exception("ILU(%g) setup/solve failed", drop)

    if x is None and Aff.shape[0] <= 350_000:
        # Direct factorization as the next level: localized floppy
        # modes (λ_min ~1e-5, thin struts near mechanism) defeat every
        # Krylov/AMG combination but are still well inside float64 for
        # a pivoted LU — this is what lets an optimization survive a
        # near-mechanism iterate instead of feeding ~1e7 garbage
        # compliance into MMA (round_cross_more_knot_vecs iter 10).
        # Gated by ndof where the factorization stays minutes-scale on
        # this box: at 457k dofs (round_cross family) a single splu ran
        # >2 h under contention — bigger systems rely on the MMA
        # bisect-retry (mma.py) + AMG instead.
        from scipy.sparse.linalg import splu
        try:
            t0 = _time.time()
            lu = splu(Aff.tocsc(), permc_spec="MMD_AT_PLUS_A",
                      options=dict(SymmetricMode=True))
            cand = lu.solve(b)
            rr = _relres(cand)
            logger.info("SuperLU direct: relres %.2e (%.1fs)", rr,
                        _time.time() - t0)
            if np.isfinite(rr) and (best is None or rr < best[0]):
                best = (rr, cand)
            if rr <= max(accept_tol, 1e-8):
                x = cand
                _solve_scipy._sticky_level[key] = len(levels)
        except Exception:
            logger.exception("direct solve failed")

    if x is None:
        from .amg import SmoothedAggregationAMG
        t0 = _time.time()
        Minv = SmoothedAggregationAMG(Aff.tocsr(), verts[keep_v]).as_preconditioner()
        t_setup = _time.time() - t0
        n_it = [0]
        t0 = _time.time()
        x0_amg = best[1] if best is not None else x0f
        x, info = cg(Aff, b, rtol=rel_tol, maxiter=min(max_iter, 800),
                     M=Minv, x0=x0_amg,
                     callback=lambda xk: n_it.__setitem__(0, n_it[0] + 1))
        rr = _relres(x)
        if rr > accept_tol:
            logger.warning("AMG-CG did not fully converge (info=%s); "
                           "residual %.3e", info, rr)
        logger.info("SA-AMG-CG: %d iters, relres %.2e (setup %.1fs, "
                    "solve %.1fs)", n_it[0], rr, t_setup, _time.time() - t0)
        if best is not None and (not np.isfinite(rr) or best[0] < rr):
            x = best[1]
            logger.info("keeping best ILU iterate (relres %.2e)", best[0])
    final_rr = _relres(x)
    if not (final_rr <= 1e-3):  # NaN-safe: nan > t is False, nan <= t too
        # every level (ILU ladder, direct LU, AMG) failed: the system
        # is mechanism-singular, not merely ill-conditioned. Returning
        # this x would hand the optimizer a meaningless compliance.
        raise FEMSolveDiverged(
            f"all solver levels diverged (best relres {final_rr:.2e}) — "
            "the structure has detached into a mechanism")
    u = np.zeros(3 * V)
    u[keep] = x
    return u.reshape(V, 3)


# which ILU strength last converged, keyed by ndof; see levels loop above
def _size_bucket(ndof: int) -> int:
    """~15%-wide log-space problem-size bucket for solver-level stickiness.

    Consecutive optimizer iterations of one mesh family (ndof drift ~1%)
    share a bucket; unrelated problems (test meshes vs production, or
    different run families) land in distant buckets.
    """
    return int(round(math.log(max(ndof, 1)) / math.log(1.15)))


_solve_scipy._sticky_level = {}
_solve_scipy._solve_count = {}


# ---------------- jitted kernels ----------------
# (the live device kernels are inlined in solve_elasticity below so the
# element geometry is computed once per solve; the f64 host mirror of
# the operator follows)

def _apply_operator_np(u, gN, vol, tets, lam, mu, ess_mask):
    """float64 numpy mirror of _apply_operator (for refinement residuals)."""
    u0 = np.where(ess_mask[:, None], 0.0, u)
    grad = np.einsum("tai,taj->tij", u0[tets], gN)
    div = np.trace(grad, axis1=1, axis2=2)
    eye = np.eye(3)
    sigma = lam * div[:, None, None] * eye + mu * (grad + np.swapaxes(grad, 1, 2))
    f_e = np.einsum("t,tij,taj->tai", vol, sigma, gN)
    y = np.zeros_like(u)
    np.add.at(y, tets.reshape(-1), f_e.reshape(-1, 3))
    return np.where(ess_mask[:, None], u, y)


def _solve_jax_refined(verts, tets, lam, mu, force, ess_mask,
                       rel_tol: float = 1e-10, max_iter: int = 10000,
                       max_rounds: int = 6, x0=None) -> np.ndarray:
    """Accelerator CG with float64 iterative refinement.

    TPUs have no native f64, and a single f32 CG stalls ~1e-6 relative
    residual — far short of the reference's 1e-10 MFEM solve (ref
    :317-326). Refinement closes the gap: each round runs a f32
    block-Jacobi CG on the accelerator against the TRUE f64 residual
    (cheap host matvec, once per round), so the f64 defect shrinks by
    ~1e-6 per round while all the heavy lifting stays on device."""
    V = len(verts)
    # island removal (shared with the scipy path): pin every vertex in
    # a component not anchored to the essential boundary — u=0 there is
    # the exact solution for unloaded debris, and it removes the exact
    # singularity that stalls CG; loaded detached components raise
    # FEMSolveDiverged inside the helper. Unreferenced grid vertices
    # (zero operator rows) are pinned too.
    _, anchored = _island_filter(tets, ess_mask, force, V)
    ess_mask = np.asarray(ess_mask, bool) | ~anchored
    gN64, vol64 = _grad_shape_np(verts, tets)
    vol64 = np.abs(vol64)
    b = np.where(ess_mask[:, None], 0.0, force)
    bnorm = np.linalg.norm(b) + 1e-300

    # --- shape bucketing: each optimization iterate re-stuffs the tet
    # mesh, and jax.jit keys on array shapes — unpadded, EVERY design
    # iteration would recompile solve_elasticity through the (volatile,
    # 20-500 s) tunnel. Pad V/T up to power-of-two buckets: padded
    # vertices are essential-pinned (identity rows), padded tets all
    # reference a unit dummy tet built from 4 padded vertices, so their
    # stiffness lands only in pinned rows. ≤2x waste per solve, but the
    # compile caches across the whole optimization run.
    def bucket(n):
        return 1 << max(4, int(np.ceil(np.log2(max(n, 1)))))

    Vp = bucket(V + 4)
    Tp = bucket(len(tets))
    verts_p = np.zeros((Vp, 3), verts.dtype if hasattr(verts, "dtype") else np.float64)
    verts_p[:V] = verts
    verts_p[V:V + 4] = [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]]  # dummy tet
    tets_p = np.full((Tp, 4), V, dtype=np.int64)
    tets_p[:, 1], tets_p[:, 2], tets_p[:, 3] = V + 1, V + 2, V + 3
    tets_p[:len(tets)] = tets
    mask_p = np.ones(Vp, bool)
    mask_p[:V] = ess_mask

    vj = jnp.asarray(verts_p, jnp.float32)
    tj = jnp.asarray(tets_p)
    mj = jnp.asarray(mask_p)
    perm_j = jnp.asarray(np.argsort(tets_p.reshape(-1), kind="stable"),
                         jnp.int32)

    x = np.zeros_like(b)
    if x0 is not None:
        cand = np.where(ess_mask[:, None], 0.0, np.asarray(x0, np.float64))
        r0 = b - _apply_operator_np(cand, gN64, vol64, tets, lam, mu, ess_mask)
        # a transferred field can carry interface discontinuities that
        # inflate the residual — keep it only if it actually starts closer
        if np.linalg.norm(r0) < bnorm:
            x = cand
    inner_tol = max(rel_tol, 1e-6)
    r_pad = np.zeros((Vp, 3), np.float64)
    relres = None
    for round_ in range(max_rounds):
        r = b - _apply_operator_np(x, gN64, vol64, tets, lam, mu, ess_mask)
        rnorm = np.linalg.norm(r)
        relres = rnorm / bnorm
        if relres <= rel_tol:
            break
        # unit-normalize the rhs: late-round residuals are tiny and
        # would underflow f32 norms inside the device CG (CG is linear)
        r_pad[:V] = r / rnorm
        # solve_elasticity runs chunked CG: one 3-float status read per
        # 100-iteration chunk (the unbounded single-program form killed
        # the TPU worker at flagship scale), plus this final device_get
        d, it = jax.device_get(solve_elasticity(
            vj, tj, lam, mu, jnp.asarray(r_pad, jnp.float32), mj,
            inner_tol, max_iter, perm_j))
        logger.debug("refinement round %d: relres %.3e, %d CG iterations",
                     round_, relres, int(it))
        x = x + rnorm * np.asarray(d, np.float64)[:V]
    else:
        # report the TRUE final defect (the loop variable is one
        # correction stale when the rounds are exhausted)
        r = b - _apply_operator_np(x, gN64, vol64, tets, lam, mu, ess_mask)
        relres = np.linalg.norm(r) / bnorm
        if relres > rel_tol:
            logger.warning("refined CG stalled at relres %.3e", relres)
    return x


def _cg_ops(verts, tets, lam, mu, ess_mask, perm):
    """Shared element precompute + (A, M, accumulate) closures."""
    gN, vol = _grad_shape(verts, tets)
    vol = jnp.abs(vol)
    eye = jnp.eye(3, dtype=jnp.float32)
    V = verts.shape[0]
    # Sorted-accumulation form: every assembly is a gather by a
    # HOST-precomputed permutation + contiguous segment_sum instead of
    # an unsorted scatter-add (TPU scatter serializes on duplicate
    # indices; a 4M-row device argsort is also avoidable since the
    # permutation is static per mesh).
    if perm is None:
        perm = jnp.argsort(tets.reshape(-1))
    seg_ids = tets.reshape(-1)[perm]

    def accumulate(per_corner):                        # (4T, ...) -> (V, ...)
        return jax.ops.segment_sum(per_corner[perm], seg_ids,
                                   num_segments=V, indices_are_sorted=True)

    outer = jnp.einsum("tai,taj->taij", gN, gN)
    dots = jnp.einsum("tai,tai->ta", gN, gN)
    blocks = ((lam + mu) * outer
              + mu * dots[..., None, None] * eye) * vol[:, None, None, None]
    acc = accumulate(blocks.reshape(-1, 3, 3))
    acc = jnp.where(ess_mask[:, None, None], eye[None], acc)
    # vertices referenced by no tet (e.g. after orphan removal) have a
    # zero block — pin them to identity like the scipy path's d[d==0]=1
    unref = jnp.abs(acc).sum(axis=(1, 2)) == 0
    acc = jnp.where(unref[:, None, None], eye[None], acc)
    pinv = _inv3(acc)

    def A(u):
        u0 = jnp.where(ess_mask[:, None], 0.0, u)
        grad = _element_strain(u0[tets], gN)
        div = jnp.trace(grad, axis1=1, axis2=2)
        sigma = lam * div[:, None, None] * eye + mu * (grad + jnp.swapaxes(grad, 1, 2))
        f_e = jnp.einsum("t,tij,taj->tai", vol, sigma, gN)
        y = accumulate(f_e.reshape(-1, 3))
        return jnp.where(ess_mask[:, None], u, y)

    def M(r):
        return jnp.einsum("vij,vj->vi", pinv, r)

    return A, M


@jax.jit
def _cg_start(verts, tets, lam, mu, force, ess_mask, perm):
    b = jnp.where(ess_mask[:, None], 0.0, force)
    A, M = _cg_ops(verts, tets, lam, mu, ess_mask, perm)
    r0 = b - A(jnp.zeros_like(b))
    z0 = M(r0)
    bnorm2 = jnp.sum(b * b) + 1e-30
    return (jnp.zeros_like(b), r0, z0, z0, jnp.sum(r0 * z0),
            jnp.int32(0), jnp.bool_(True)), bnorm2


@partial(jax.jit, static_argnames=("chunk",), donate_argnums=(6,))
def _cg_chunk(verts, tets, lam, mu, ess_mask, perm, state, tol2,
              chunk: int = 100):
    """Up to ``chunk`` PCG iterations as one device program. Bounding
    the per-dispatch iteration count keeps single XLA programs short —
    an unbounded 748k-tet while_loop reproducibly killed the TPU worker
    through the tunnel — and makes the TOTAL budget a dynamic value (no
    recompile per max_iter)."""
    A, M = _cg_ops(verts, tets, lam, mu, ess_mask, perm)

    def cond(carry):
        state, n = carry
        x, r, z, p, rz, it, ok = state
        return (n < chunk) & (jnp.sum(r * r) > tol2) & ok

    def body(carry):
        state, n = carry
        x, r, z, p, rz, it, ok = state
        Ap = A(p)
        pAp = jnp.sum(p * Ap)
        # f32 breakdown guard: A is SPD, so pAp <= 0 (or rz <= 0) means
        # rounding noise has taken over — stop and let the f64 refinement
        # wrapper restart from the true residual
        good = (pAp > 0) & (rz > 0)
        alpha = jnp.where(good, rz / jnp.where(good, pAp, 1.0), 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        z = M(r)
        rz_new = jnp.sum(r * z)
        p = z + jnp.where(good, rz_new / jnp.where(good, rz, 1.0), 0.0) * p
        return (x, r, z, p, rz_new, it + 1, good), n + 1

    state, _ = jax.lax.while_loop(cond, body, (state, jnp.int32(0)))
    x, r, z, p, rz, it, ok = state
    # one tiny packed status read per chunk (host decides to continue)
    status = jnp.stack([jnp.sum(r * r), it.astype(jnp.float32),
                        ok.astype(jnp.float32)])
    return state, status


def solve_elasticity(verts, tets, lam, mu, force, ess_mask,
                     rel_tol: float = 1e-10, max_iter: int = 10000,
                     perm=None, chunk: int = 100):
    """Preconditioned CG on the masked operator; returns (x, iterations).

    Element geometry (shape gradients, volumes, preconditioner blocks)
    is computed once per dispatch; the iteration runs in ``chunk``-sized
    device programs with one scalar status read between chunks (~1 RTT
    each through the tunnel). ``perm``: host-precomputed argsort of
    ``tets.reshape(-1)`` (computed on device if omitted)."""
    if perm is None:
        perm = jnp.argsort(tets.reshape(-1))
    lam = jnp.float32(lam)
    mu = jnp.float32(mu)
    state, bnorm2 = _cg_start(verts, tets, lam, mu, force, ess_mask, perm)
    tol2 = jnp.float32(rel_tol ** 2) * bnorm2
    it = 0
    while it < max_iter:
        # chunk size stays static across calls (one compile per shape
        # bucket); the budget may overshoot max_iter by < chunk
        state, status = _cg_chunk(verts, tets, lam, mu, ess_mask, perm,
                                  state, tol2, chunk=chunk)
        res2, it_f, ok = np.asarray(status)   # host sync, 3 floats
        it = int(it_f)
        if res2 <= float(np.asarray(tol2)) or not ok:
            break
    return state[0], state[5]
