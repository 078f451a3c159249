"""Isolate which device op faults in the flagship-scale FEM solve.

The full solve (Vp=2^18 verts, Tp=2^20 tets after bucketing) crashes
the TPU worker ("kernel fault"). Run each constituent op alone at the
same padded scale in its own process:

    python scripts/debug_fem_ops.py geom      # det/inv on (Tp,3,3)
    python scripts/debug_fem_ops.py blocks    # element blocks einsum
    python scripts/debug_fem_ops.py scatter   # 4*Tp scatter-add into (Vp,3,3)
    python scripts/debug_fem_ops.py pinv      # batched 3x3 inverse (Vp)
    python scripts/debug_fem_ops.py matvec    # one operator application
    python scripts/debug_fem_ops.py cg10      # 10 CG iterations
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def load_padded():
    d = np.load("/tmp/fem_mesh.npz")
    verts, tets = d["vertices"], d["tets"]
    bf, markers = d["bf"], d["markers"]
    V = len(verts)
    ess = np.zeros(V, bool)
    ess[np.unique(bf[markers == 1])] = True

    def bucket(n):
        return 1 << max(4, int(np.ceil(np.log2(max(n, 1)))))

    Vp, Tp = bucket(V + 4), bucket(len(tets))
    verts_p = np.zeros((Vp, 3), np.float64)
    verts_p[:V] = verts
    verts_p[V:V + 4] = [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]]
    tets_p = np.full((Tp, 4), V, dtype=np.int64)
    tets_p[:, 1], tets_p[:, 2], tets_p[:, 3] = V + 1, V + 2, V + 3
    tets_p[:len(tets)] = tets
    mask_p = np.ones(Vp, bool)
    mask_p[:V] = ess
    print(f"V={V} Vp={Vp} Tp={Tp}", flush=True)
    return (jnp.asarray(verts_p, jnp.float32), jnp.asarray(tets_p),
            jnp.asarray(mask_p))


def main(which):
    from deepsdf_tpu.opt.fem import _grad_shape

    vj, tj, mj = load_padded()
    Vp = vj.shape[0]

    if which == "geom":
        gN, vol = jax.jit(_grad_shape)(vj, tj)
        print("geom ok", float(jnp.abs(vol).sum()), flush=True)
        return

    gN, vol = jax.jit(_grad_shape)(vj, tj)
    vol = jnp.abs(vol)
    print("geom done", float(vol.sum()), flush=True)
    lam, mu = 0.0, 105.0
    eye = jnp.eye(3, dtype=jnp.float32)

    @jax.jit
    def blocks_fn(gN, vol):
        outer = jnp.einsum("tai,taj->taij", gN, gN)
        dots = jnp.einsum("tai,tai->ta", gN, gN)
        return ((lam + mu) * outer
                + mu * dots[..., None, None] * eye) * vol[:, None, None, None]

    if which == "blocks":
        b = blocks_fn(gN, vol)
        print("blocks ok", float(jnp.abs(b).sum()), flush=True)
        return

    blocks = blocks_fn(gN, vol)
    print("blocks done", flush=True)

    @jax.jit
    def scatter_fn(blocks, tets):
        return jnp.zeros((Vp, 3, 3), jnp.float32).at[tets.reshape(-1)].add(
            blocks.reshape(-1, 3, 3))

    if which == "scatter":
        acc = scatter_fn(blocks, tj)
        print("scatter ok", float(jnp.abs(acc).sum()), flush=True)
        return

    acc = scatter_fn(blocks, tj)
    print("scatter done", flush=True)

    @jax.jit
    def pinv_fn(acc, mask):
        acc = jnp.where(mask[:, None, None], eye[None], acc)
        unref = jnp.abs(acc).sum(axis=(1, 2)) == 0
        acc = jnp.where(unref[:, None, None], eye[None], acc)
        return jnp.linalg.inv(acc)

    if which == "pinv":
        p = pinv_fn(acc, mj)
        print("pinv ok", float(jnp.abs(p).sum()), flush=True)
        return

    pinv = pinv_fn(acc, mj)
    print("pinv done", flush=True)

    @jax.jit
    def matvec(u):
        u0 = jnp.where(mj[:, None], 0.0, u)
        grad = jnp.einsum("tai,taj->tij", u0[tj], gN)
        div = jnp.trace(grad, axis1=1, axis2=2)
        sigma = lam * div[:, None, None] * eye + mu * (grad + jnp.swapaxes(grad, 1, 2))
        f_e = jnp.einsum("t,tij,taj->tai", vol, sigma, gN)
        y = jnp.zeros_like(u).at[tj.reshape(-1)].add(f_e.reshape(-1, 3))
        return jnp.where(mj[:, None], u, y)

    u = jnp.ones((Vp, 3), jnp.float32)
    if which == "matvec":
        y = matvec(u)
        print("matvec ok", float(jnp.abs(y).sum()), flush=True)
        return

    y = matvec(u)
    print("matvec done", flush=True)

    if which == "cg10":
        from deepsdf_tpu.opt.fem import solve_elasticity
        force = jnp.ones((Vp, 3), jnp.float32) * 1e-3
        x, it = solve_elasticity(vj, tj, lam, mu, force, mj, 1e-6, 10)
        print("cg10 ok iters", int(it), float(jnp.abs(x).max()), flush=True)
        return

    raise SystemExit(f"unknown op {which}")


if __name__ == "__main__":
    main(sys.argv[1])
