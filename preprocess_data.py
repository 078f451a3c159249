#!/usr/bin/env python3
"""Preprocess mesh datasets into SDF samples / surface samples.

Restores the upstream entry point the reference deleted but still
documents (ref README.md:79-108,139-145: ``preprocess_data.py`` drives
the C++ binaries over a split). The GPU/Pangolin render oracle is
replaced by the in-repo native BVH + fast-winding-number sampler
(native/preprocess/deepsdf_native.cpp; same sampling recipe as ref
src/PreprocessMesh.cpp:23-565).

    python preprocess_data.py --source <mesh_root> --name <dataset> \
        --split data/splits/foo.json [--surface] [--threads 8]

Mesh lookup per split id, under <source>/<class>/:
  <id>.obj | <id>.ply | <id>/models/model_normalized.obj (ShapeNet).
SDF mode writes <data_dir>/SdfSamples/<dataset>/<class>/<id>.npz;
--surface writes <data_dir>/SurfaceSamples/.../<id>.ply plus
<data_dir>/NormalizationParameters/.../<id>.npz (ref
src/SampleVisibleMeshSurface.cpp:23-324 outputs).
"""

import argparse
import concurrent.futures
import json
import os
import pathlib
import subprocess
import sys

_BIN_DIR = pathlib.Path(__file__).parent / "native" / "preprocess" / "build"


def find_mesh(source: pathlib.Path, cls: str, instance: str) -> pathlib.Path | None:
    base = source / cls
    for cand in (base / f"{instance}.obj", base / f"{instance}.ply",
                 base / instance / "models" / "model_normalized.obj",
                 base / instance / "model.obj"):
        if cand.is_file():
            return cand
    return None


def process_one(mesh: pathlib.Path, out: pathlib.Path, surface: bool,
                samples: int, seed: int, norm_out: pathlib.Path | None,
                skip: bool) -> str:
    out.parent.mkdir(parents=True, exist_ok=True)
    if skip and out.exists():
        return f"skip {out}"
    if surface:
        cmd = [str(_BIN_DIR / "sample_visible_mesh_surface"), "-m", str(mesh),
               "-o", str(out), "--seed", str(seed)]
        if norm_out is not None:
            norm_out.parent.mkdir(parents=True, exist_ok=True)
            cmd += ["-n", str(norm_out)]
    else:
        cmd = [str(_BIN_DIR / "preprocess_mesh"), "-m", str(mesh),
               "-o", str(out), "-s", str(samples), "--seed", str(seed)]
    r = subprocess.run(cmd, capture_output=True, text=True)
    if r.returncode != 0:
        return f"FAIL {mesh}: {r.stderr.strip()[:300]}"
    return f"ok {out}"


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--data_dir", "-d", default="data")
    p.add_argument("--source", "-s", required=True,
                   help="root directory of the raw mesh dataset")
    p.add_argument("--name", "-n", required=True,
                   help="dataset name used in the output directory layout")
    p.add_argument("--split", required=True)
    p.add_argument("--surface", action="store_true",
                   help="sample surface points (for evaluation) instead of SDFs")
    p.add_argument("--samples", type=int, default=500000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--skip", action="store_true", help="skip existing outputs")
    p.add_argument("--threads", type=int, default=os.cpu_count() or 4)
    args = p.parse_args()

    if not (_BIN_DIR / "preprocess_mesh").exists():
        print("native binaries missing — run `make` in native/preprocess/",
              file=sys.stderr)
        return 1

    with open(args.split) as f:
        split = json.load(f)
    source = pathlib.Path(args.source)
    data_dir = pathlib.Path(args.data_dir)
    subdir = "SurfaceSamples" if args.surface else "SdfSamples"

    jobs = []
    missing = 0
    for _, classes in split.items():
        for cls, instances in classes.items():
            for inst in instances:
                mesh = find_mesh(source, cls, inst)
                if mesh is None:
                    print(f"missing mesh for {cls}/{inst}", file=sys.stderr)
                    missing += 1
                    continue
                out_base = data_dir / subdir / args.name / cls
                if args.surface:
                    out = out_base / f"{inst}.ply"
                    norm = (data_dir / "NormalizationParameters" / args.name
                            / cls / f"{inst}.npz")
                else:
                    out = out_base / f"{inst}.npz"
                    norm = None
                jobs.append((mesh, out, args.surface, args.samples,
                             args.seed, norm, args.skip))

    failures = 0
    with concurrent.futures.ThreadPoolExecutor(args.threads) as ex:
        for msg in ex.map(lambda j: process_one(*j), jobs):
            print(msg, flush=True)
            failures += msg.startswith("FAIL")
    print(f"done: {len(jobs) - failures}/{len(jobs)} processed, "
          f"{missing} meshes missing, {failures} failures")
    # missing source meshes are an error too (strict, like
    # get_instance_filenames): a split resolving zero meshes must not
    # let a pipeline proceed silently on a partial dataset
    return 1 if (failures or missing) else 0


if __name__ == "__main__":
    raise SystemExit(main())
