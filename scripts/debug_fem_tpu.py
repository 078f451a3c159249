"""Isolate the TPU crash in the flagship-scale FEM solve.

Stage 1 (CPU ok): build the opti_double_lattice_8x4 geometry at x0=0,
stuff tets, dump verts/tets/BCs to /tmp/fem_mesh.npz.
Stage 2 (TPU): load the dump and run solve_elasticity at increasing
truncations to find the crash scale.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def stage1():
    from deepsdf_tpu.opt.config import Config
    from deepsdf_tpu.opt.geometry import DeepSDFMesh

    options = Config.load_json("optimization_runs/opti_double_lattice_8x4/config.json")
    geo = DeepSDFMesh(options["mesh"])
    n_cp = geo.get_n_control_points()
    n_lat = geo.get_latent_shape()
    print("control points:", n_cp, "latent:", n_lat)
    geo.generate_surface_mesh(np.zeros((n_cp, n_lat)))
    print("surface verts/faces:", geo.surface_vertices.shape, geo.surface_faces.shape)
    geo.tetrahedralize_surface()
    m = geo.volumes
    bf, markers = geo.boundary_conditions()
    print("verts:", m.vertices.shape, "tets:", m.tets.shape,
          "bfaces:", np.shape(bf))
    np.savez("/tmp/fem_mesh.npz", vertices=m.vertices, tets=m.tets,
             bf=np.asarray(bf), markers=np.asarray(markers))


def stage2(frac=1.0, max_iter=2000):
    import jax
    import jax.numpy as jnp

    from deepsdf_tpu.opt.fem import solve_elasticity

    d = np.load("/tmp/fem_mesh.npz")
    verts, tets = d["vertices"], d["tets"]
    bf, markers = d["bf"], d["markers"]
    T = int(len(tets) * frac)
    tets = tets[:T]
    ess = np.zeros(len(verts), bool)
    ess[np.unique(bf[markers == 1])] = True
    force = np.zeros((len(verts), 3), np.float32)
    load_faces = bf[markers == 2]
    if len(load_faces):
        tv = verts[load_faces]
        area = 0.5 * np.linalg.norm(
            np.cross(tv[:, 1] - tv[:, 0], tv[:, 2] - tv[:, 0]), axis=1)
        contrib = (area[:, None] / 3.0) * np.array([0, 0, -0.01])
        for k in range(3):
            np.add.at(force, load_faces[:, k], contrib)
    perm = jnp.asarray(np.argsort(tets.reshape(-1), kind="stable"), jnp.int32)
    print(f"solving V={len(verts)} T={T} ess={ess.sum()} mi={max_iter} ...",
          flush=True)
    x, it = jax.device_get(solve_elasticity(
        jnp.asarray(verts, jnp.float32), jnp.asarray(tets),
        0.0, 105.0, jnp.asarray(force), jnp.asarray(ess), 1e-6, max_iter,
        perm))
    print("done: iters", int(it), "max|u|", float(np.abs(x).max()), flush=True)


if __name__ == "__main__":
    if sys.argv[1] == "1":
        stage1()
    else:
        stage2(float(sys.argv[2]) if len(sys.argv) > 2 else 1.0,
               int(sys.argv[3]) if len(sys.argv) > 3 else 2000)
