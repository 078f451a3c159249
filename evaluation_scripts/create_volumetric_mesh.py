#!/usr/bin/env python3
"""Generate a volumetric (tet) mesh of a microstructure from a trained
experiment (parity with ref evaluation_scripts/06_create_volumetric_mesh.py:
DeepSDFMesh → tetrahedralize → MFEM export with BC markers)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json


def main(config_path, out_mesh, control_points=None):
    import numpy as np

    from deepsdf_tpu.opt.geometry import DeepSDFMesh

    with open(config_path) as f:
        cfg = json.load(f)
    mesh_opts = cfg["mesh"] if "mesh" in cfg else cfg
    geo = DeepSDFMesh(mesh_opts)
    C, L = geo.get_n_control_points(), geo.get_latent_shape()
    if control_points is None:
        cpts = np.tile(geo.latent[0], (C, 1))
    else:
        cpts = np.asarray(json.loads(control_points)).reshape(C, L)
    geo.generate_surface_mesh(cpts)
    geo.tetrahedralize_surface()
    geo.export_volume_mesh(out_mesh)
    bf, markers = geo.boundary_conditions()
    print(f"wrote {out_mesh}: {len(geo.volumes.tets)} tets, "
          f"{geo.volumes.num_vertices} verts, volume {geo.volumes.total_volume():.4f}, "
          f"BC faces 1/2/3: {(markers == 1).sum()}/{(markers == 2).sum()}/"
          f"{(markers == 3).sum()}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("config", help="optimization config.json (or its 'mesh' section)")
    p.add_argument("--out", default="volume.mesh")
    p.add_argument("--control-points", default=None,
                   help="JSON array of control-point values")
    args = p.parse_args()
    main(args.config, args.out, args.control_points)
