#!/usr/bin/env python3
"""Build the reference training datasets with the TPU-native sampler.

Dataset recipes mirror the reference data-gen scripts:
  corner_spheres / round_cross — ref evaluation_scripts/04_simple_geom_creation.py
  snappy3D                      — ref evaluation_scripts/08_facade_microtile_creation.py
  double_lattice                — ref evaluation_scripts/10_gen_double_lattice_training_data.py
"""

import argparse
import os
import pathlib

import numpy as np

from deepsdf_tpu.mesh.ply import write_ply
from deepsdf_tpu.sdf_sampler import (
    CornerSpheresSDF, CrossMsSDF, SDFSampler, SDFfromMesh,
)
from deepsdf_tpu.sdf_sampler.tiles import DoubleLatticeExtruded, Snappy3D


# Bump whenever the GT-surface generation algorithm changes: existing
# plys of a different (or unrecorded) provenance are wiped and
# regenerated, so resumed runs never keep mixed-method GT clouds
# (advisor round 3 — the 48^3+Newton projection replaced dense 128^3
# marching but resume kept old plys).
_SURFACE_METHOD = "marching48-newton-project-v2"


def _write_gt_surfaces(sampler, info, names, sdfs=None, meshes=None,
                       n_points=30000, grid_n=48):
    """GT surface point clouds under <data>/SurfaceSamples/... for
    chamfer/EMD evaluation (the role of the reference's
    SampleVisibleMeshSurface outputs, src/SampleVisibleMeshSurface.cpp:23,
    for analytic/tile datasets): level-set extraction of the SDF or
    area-weighted sampling of the tile mesh."""
    import json

    from deepsdf_tpu.eval.evaluate import (
        surface_samples_from_sdf, write_surface_samples,
    )
    from deepsdf_tpu.metrics.chamfer import sample_surface

    data_root = str(pathlib.Path(sampler.outdir).parent)
    cls_dir = (pathlib.Path(data_root) / "SurfaceSamples"
               / info["dataset_name"] / info["class_name"])
    manifest = cls_dir / ".method.json"
    tag = None
    if manifest.exists():
        try:
            tag = json.load(open(manifest)).get("method")
        except (json.JSONDecodeError, OSError):
            tag = None
    if tag != _SURFACE_METHOD:
        stale = list(cls_dir.glob("*.ply")) if cls_dir.exists() else []
        if stale:
            print(f"surface samples: method changed ({tag!r} -> "
                  f"{_SURFACE_METHOD!r}), regenerating {len(stale)} plys "
                  f"in {cls_dir}")
            for p in stale:
                p.unlink()
        cls_dir.mkdir(parents=True, exist_ok=True)
        json.dump({"method": _SURFACE_METHOD}, open(manifest, "w"))
    for i, name in enumerate(names):
        done = cls_dir / (name + ".ply")
        if done.exists():
            continue  # deterministic per-shape seeds make reruns resumable
        if sdfs is not None:
            pts = surface_samples_from_sdf(sdfs[i], n_points=n_points, seed=i,
                                           grid_n=grid_n)
        else:
            verts, faces = meshes[i]
            pts = sample_surface(verts, faces, n_points,
                                 np.random.default_rng(i))
        path = write_surface_samples(data_root, info["dataset_name"],
                                     info["class_name"], name, pts)
        print(f"surface samples: {path}")


def gen_corner_spheres(sampler, n_samples, surface_samples=False):
    """ref 04_simple_geom_creation.py:24-30."""
    ms = [CornerSpheresSDF(r, limit=0.9) for r in np.linspace(0.4, 1, 20)]
    info = {"dataset_name": "microstructure", "class_name": "corner_spheres"}
    split = sampler.sample_sdfs([m.SDF for m in ms], info, n_samples=n_samples)
    sampler.write_json("corner_spheres_only.json", info, split)
    sampler.write_json("corner_spheres.json", info, split)  # ref ships both names
    if surface_samples:
        _write_gt_surfaces(sampler, info, split, sdfs=[m.SDF for m in ms])


def gen_round_cross(sampler, n_samples, surface_samples=False, extended=False):
    """ref 04_simple_geom_creation.py:9-14 (20 shapes, r∈[0.1,0.75]).

    ``extended`` appends 20 more shapes (ids 10020–10039) so the class
    covers the 40 ids the reference's snappy_and_cylinders.json split
    references (ref data/splits/snappy_and_cylinders.json). The
    reference script generating those 40 is absent from the snapshot
    (04_simple_geom_creation.py postdates it with 20), so the extra
    radii are the odd points of a 41-point refinement of [0.1, 0.75]
    (i.e. midpoints of a 21-point grid — a DIFFERENT lattice than the
    committed 20-radius sweep; chosen to interleave the sweep range
    evenly). Split ids 10020–10039 bake these radii into committed
    data — do not change them. round_cross_only ids 10000–10019 keep
    the exact committed-script radii either way.
    """
    radii = list(np.linspace(0.1, 0.75, 20))
    if extended:
        radii += list(np.linspace(0.1, 0.75, 41)[1::2])
    ms = [CrossMsSDF(r) for r in radii]
    info = {"dataset_name": "microstructure", "class_name": "round_cross"}
    split = sampler.sample_sdfs([m.SDF for m in ms], info, n_samples=n_samples)
    sampler.write_json("round_cross_only.json", info, split[:20])
    if extended:
        sampler.write_json("round_cross_all.json", info, split)
    if surface_samples:
        _write_gt_surfaces(sampler, info, split, sdfs=[m.SDF for m in ms])
    return split


def gen_simple_geom(sampler, n_samples, surface_samples=False):
    """simple_geom training data: 20 corner-spheres (default limit) +
    20 round-cross shapes as ONE class (ref
    04_simple_geom_creation.py:16-22, split
    microstructure_round_cross_train.json)."""
    ms = ([CornerSpheresSDF(r) for r in np.linspace(0.4, 1, 20)]
          + [CrossMsSDF(r) for r in np.linspace(0.1, 0.75, 20)])
    info = {"dataset_name": "microstructure",
            "class_name": "corner_spheres_and_round_cross"}
    split = sampler.sample_sdfs([m.SDF for m in ms], info, n_samples=n_samples)
    sampler.write_json("microstructure_round_cross_train.json", info, split)
    if surface_samples:
        _write_gt_surfaces(sampler, info, split, sdfs=[m.SDF for m in ms])


def _mesh_sdf(verts, faces):
    """Prefer the native C++ BVH/winding sampler (fast, CPU-only);
    fall back to the JAX winding SDF."""
    try:
        from deepsdf_tpu.native import NativeMesh

        mesh = NativeMesh(vertices=verts, faces=faces)
        return lambda q: mesh.signed_distance(q).reshape(-1, 1)
    except Exception:
        return SDFfromMesh(vertices=verts.astype(np.float32), faces=faces)


def gen_snappy(sampler, n_samples, geometry_dir, resolution=20,
               surface_samples=False):
    """ref 08_facade_microtile_creation.py:19-34 (40 shapes, t∈[0,0.2])."""
    os.makedirs(geometry_dir, exist_ok=True)
    sdfs, meshes = [], []
    for i, t in enumerate(np.linspace(0, 0.2, 40)):
        verts, faces = Snappy3D().create_surface_mesh(
            parameters=np.array([[t]]), resolution=resolution)
        write_ply(str(pathlib.Path(geometry_dir) / f"snappy_{i}.ply"), verts, faces)
        meshes.append((verts, faces))
        sdfs.append(_mesh_sdf(verts, faces))
    info = {"dataset_name": "microstructure", "class_name": "snappy3D"}
    split = sampler.sample_sdfs(sdfs, info, n_samples=n_samples)
    sampler.write_json("snappy3D.json", info, split)
    if surface_samples:
        _write_gt_surfaces(sampler, info, split, meshes=meshes)
    return split


def gen_double_lattice(sampler, n_samples, geometry_dir, analytic=True,
                       surface_samples=False, no_topo=False):
    """Double-lattice tile datasets (ref
    10_gen_double_lattice_training_data.py:22-41).

    ``no_topo=False``: the FLAGSHIP 400-shape sweep t1,t2∈[0.01,0.2]
    20×20 (the reference's double_lattice_3D.json has exactly 400 ids;
    its script's comment "old was from 0.01 to 0.2" names the range).
    ``no_topo=True``: the committed script's 441-shape 21×21 sweep
    t∈[0.05,0.2] that avoids topological changes
    (double_lattice_no_topo_3D.json). ``analytic`` samples the exact
    CSG SDF on device; otherwise meshes each tile and uses the
    winding-number SDF."""
    os.makedirs(geometry_dir, exist_ok=True)
    if no_topo:
        ts = np.linspace(0.05, 0.2, 21)
        cls, split_name = "double_lattice_no_topo", "double_lattice_no_topo_3D.json"
    else:
        ts = np.linspace(0.01, 0.2, 20)
        cls, split_name = "double_lattice", "double_lattice_3D.json"
    sdfs = []
    index = 0
    tile = DoubleLatticeExtruded()
    for t1 in ts:
        for t2 in ts:
            if analytic:
                sdfs.append(tile.sdf(np.array([[t1, t2]])))
            else:
                verts, faces = tile.create_surface_mesh(np.array([[t1, t2]]))
                fname = f"{index}_{cls}_{t1:.2f}_{t2:.2f}".replace(".", "_")
                write_ply(str(pathlib.Path(geometry_dir) / (fname + ".ply")),
                          verts, faces)
                sdfs.append(SDFfromMesh(vertices=verts.astype(np.float32),
                                        faces=faces))
            index += 1
    info = {"dataset_name": "microstructure", "class_name": cls}
    split = sampler.sample_sdfs(sdfs, info, n_samples=n_samples)
    sampler.write_json(split_name, info, split)
    if surface_samples:
        # the flagship sweep reaches t=0.01 (walls ~0.02 in [-1,1]
        # units): seed-marching needs h<~0.016 to detect them (48^3
        # loses whole walls, measured ref->cloud p99 0.67); no_topo's
        # t>=0.05 walls are safe at the cheap default
        _write_gt_surfaces(sampler, info, split, sdfs=sdfs,
                           grid_n=48 if no_topo else 128)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("datasets", nargs="+",
                   choices=("corner_spheres", "round_cross", "snappy3D",
                            "double_lattice", "double_lattice_no_topo",
                            "simple_geom", "snappy_and_cylinders"))
    p.add_argument("--outdir", default="data/SdfSamples")
    p.add_argument("--splitdir", default="data/splits")
    p.add_argument("--geometry-dir", default="data/geometry")
    p.add_argument("--samples", type=float, default=1e5)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (keeps the TPU tunnel free "
                        "for training jobs; sampling is PRNG-deterministic "
                        "either way)")
    p.add_argument("--surface-samples", action="store_true",
                   help="also write 30k-point GT surface clouds to "
                        "<data>/SurfaceSamples for chamfer/EMD evaluation")
    args = p.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    sampler = SDFSampler(args.outdir, args.splitdir, seed=args.seed)
    for ds in args.datasets:
        if ds == "corner_spheres":
            gen_corner_spheres(sampler, args.samples, args.surface_samples)
        elif ds == "round_cross":
            gen_round_cross(sampler, args.samples, args.surface_samples)
        elif ds == "simple_geom":
            gen_simple_geom(sampler, args.samples, args.surface_samples)
        elif ds == "snappy3D":
            gen_snappy(sampler, args.samples,
                       os.path.join(args.geometry_dir, "snappy_tile"),
                       surface_samples=args.surface_samples)
        elif ds == "double_lattice":
            gen_double_lattice(sampler, args.samples,
                               os.path.join(args.geometry_dir, "double_lattice"),
                               surface_samples=args.surface_samples)
        elif ds == "double_lattice_no_topo":
            gen_double_lattice(sampler, args.samples,
                               os.path.join(args.geometry_dir, "double_lattice"),
                               surface_samples=args.surface_samples, no_topo=True)
        elif ds == "snappy_and_cylinders":
            # snappy 40 + the 40-id extended round_cross class, one
            # combined split (ref data/splits/snappy_and_cylinders.json)
            import json as _json
            snappy_split = gen_snappy(
                sampler, args.samples,
                os.path.join(args.geometry_dir, "snappy_tile"),
                surface_samples=args.surface_samples)
            rc_split = gen_round_cross(sampler, args.samples,
                                       args.surface_samples, extended=True)
            combined = {"microstructure": {"snappy3D": snappy_split,
                                           "round_cross": rc_split}}
            with open(os.path.join(args.splitdir, "snappy_and_cylinders.json"),
                      "w") as f:
                _json.dump(combined, f, indent=2)
