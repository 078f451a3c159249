"""Earth mover's distance between surface point clouds.

The reference reserves ``Evaluation/<ckpt>/emd`` in its directory
contract (ref: README.md:69, deep_sdf/workspace.py:14) but never ships
an implementation — upstream DeepSDF reported EMD in the paper yet the
open-source tree carries only chamfer. This module fills that gap
TPU-first:

* ``emd_sinkhorn`` — entropic-regularized OT (log-domain Sinkhorn) in
  JAX. Each iteration is a dense (n, m) logsumexp reduction — large,
  static-shape, fusible work that XLA maps onto the MXU/VPU; the loop
  is a ``lax.scan`` so the whole solve is ONE compiled program. This is
  the default for the usual n = 2048–4096 evaluation subsamples.
* ``emd_exact`` — Hungarian assignment (scipy) for small clouds; used
  in tests as ground truth for the Sinkhorn approximation.

Both take raw point arrays; ``compute_emd`` handles the area-weighted
mesh sampling + subsampling convention (mirrors metrics/chamfer.py).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from .chamfer import sample_surface


def _pairwise_dist(a: jax.Array, b: jax.Array) -> jax.Array:
    """(n, m) Euclidean distances; ||a||²+||b||²−2ab form keeps the
    heavy term a single MXU matmul."""
    sq = (
        jnp.sum(a * a, axis=1)[:, None]
        + jnp.sum(b * b, axis=1)[None, :]
        - 2.0 * a @ b.T
    )
    return jnp.sqrt(jnp.maximum(sq, 1e-12))


@partial(jax.jit, static_argnames=("n_iters",))
def _sinkhorn_cost(a: jax.Array, b: jax.Array, epsilon: float,
                   n_iters: int) -> jax.Array:
    n, m = a.shape[0], b.shape[0]
    C = _pairwise_dist(a, b)
    log_mu = jnp.full((n,), -jnp.log(n))
    log_nu = jnp.full((m,), -jnp.log(m))
    negC_eps = -C / epsilon

    def body(carry, _):
        f, g = carry
        # log-domain updates: f_i = ε(log μ_i − logsumexp_j((g_j − C_ij)/ε))
        f = epsilon * (log_mu - jax.scipy.special.logsumexp(
            negC_eps + g[None, :] / epsilon, axis=1))
        g = epsilon * (log_nu - jax.scipy.special.logsumexp(
            negC_eps + f[:, None] / epsilon, axis=0))
        return (f, g), None

    (f, g), _ = jax.lax.scan(body, (jnp.zeros((n,)), jnp.zeros((m,))),
                             None, length=n_iters)
    # transport plan P = exp((f ⊕ g − C)/ε) · (μ ⊗ ν) in log domain
    logP = (f[:, None] + g[None, :] - C) / epsilon
    P = jnp.exp(logP)
    return jnp.sum(P * C)


def emd_sinkhorn(a_points: np.ndarray, b_points: np.ndarray,
                 epsilon: float = 0.01, n_iters: int = 200) -> float:
    """Entropic-OT approximation of EMD (mean matched distance) between
    two clouds with uniform weights. ε is in distance units — 0.01 on
    the [-1,1]³ domain gives ≲2% bias vs the exact assignment."""
    a = jnp.asarray(a_points, jnp.float32)
    b = jnp.asarray(b_points, jnp.float32)
    return float(_sinkhorn_cost(a, b, float(epsilon), int(n_iters)))


def emd_exact(a_points: np.ndarray, b_points: np.ndarray) -> float:
    """Exact EMD via Hungarian assignment (requires len(a) == len(b);
    O(n³) — use for n ≲ 2048)."""
    from scipy.optimize import linear_sum_assignment
    from scipy.spatial.distance import cdist

    a = np.asarray(a_points, np.float64)
    b = np.asarray(b_points, np.float64)
    if len(a) != len(b):
        raise ValueError("exact EMD needs equal-size clouds")
    C = cdist(a, b)
    rows, cols = linear_sum_assignment(C)
    return float(C[rows, cols].mean())


def compute_emd(gt_points: np.ndarray, gen_vertices: np.ndarray,
                gen_faces: np.ndarray, offset=0.0, scale=1.0,
                num_samples: int = 2048, seed: int = 0,
                epsilon: float = 0.01, n_iters: int = 200) -> float:
    """EMD between ``num_samples`` area-weighted samples of the
    generated mesh and an equal-size subsample of the GT cloud, with
    the same normalization convention as compute_chamfer."""
    rng = np.random.default_rng(seed)
    gen = sample_surface(gen_vertices, gen_faces, num_samples, rng)
    gen = gen / scale - offset
    gt = np.asarray(gt_points, np.float64)
    if len(gt) < num_samples:
        idx = rng.choice(len(gt), num_samples, replace=True)
    else:
        idx = rng.choice(len(gt), num_samples, replace=False)
    return emd_sinkhorn(gt[idx], gen, epsilon=epsilon, n_iters=n_iters)
