#!/usr/bin/env python3
"""Sequential fixture pipeline: train -> reconstruct -> evaluate for a
list of experiments, one TPU job at a time (the axon tunnel stalls
under concurrent heavy jobs — CLAUDE.md). Resumable: finished stages
are detected from their artifacts and skipped.

    python scripts/train_fixtures.py exp1 exp2 ...     # names under experiments/
    python scripts/train_fixtures.py --all             # the round-2 queue
"""

import argparse
import json
import os
import pathlib
import subprocess
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parent.parent

# round-2 queue: VERDICT-critical first (external pipeline proof, the
# optimization's decoder, the explicitly-requested retrains, the
# flagship), then recipes new this round, cheap before expensive
DEFAULT_QUEUE = [
    "external_knots",
    "double_lattice_3D_small_network",
    "corner_spheres_only_small_network",
    "double_lattice_3D",
    # next two gate the round_cross_* and no_topo optimization runs
    "round_cross_big_network",
    "double_lattice_3D_no_topo",
    "simple_geom",
    "round_cross_small_network",
    "snappy3D_latent_2D_smaller_network",
    "snappy3D",
    "corner_spheres_only",
    "snappy3D_latent_2D",
    "snappy_and_cylinders",
    # most expensive last: 10000 epochs, resumable via SnapshotFrequency=2000
    "double_lattice_3D_longer_training",
]


def run(cmd, log_path):
    print(f"$ {' '.join(cmd)}  (log: {log_path})", flush=True)
    t0 = time.time()
    with open(log_path, "a") as log:
        r = subprocess.run(cmd, cwd=ROOT, stdout=log, stderr=subprocess.STDOUT)
    print(f"  -> rc={r.returncode} in {time.time() - t0:.0f}s", flush=True)
    return r.returncode


def pipeline(name: str, fused: bool = True, force: bool = False) -> bool:
    exp = ROOT / "experiments" / name
    specs = json.load(open(exp / "specs.json"))
    last = str(specs["NumEpochs"])
    log = f"/tmp/fixture_{name}.log"

    if force or not (exp / "ModelParameters" / f"{last}.npz").exists():
        cmd = [sys.executable, "train_deep_sdf.py", "-e", str(exp)]
        if fused:
            cmd.append("--fused")
        if (exp / "ModelParameters" / "latest.npz").exists():
            cmd += ["--continue", "latest"]
        if run(cmd, log):
            return False
    else:
        print(f"  {name}: trained ({last}.npz present)", flush=True)

    eval_marker = exp / "Evaluation" / last / "chamfer.json"
    if not force and _eval_complete(exp, specs, eval_marker):
        # committed evaluation already covers the split; mesh plys are
        # machine-local (gitignored) and not worth regenerating
        print(f"  {name}: PIPELINE COMPLETE (evaluation committed)", flush=True)
        return True

    recon_marker = exp / "Reconstructions" / last / "Meshes"
    n_meshes = len(list(recon_marker.rglob("*.ply"))) if recon_marker.exists() else 0
    if force or n_meshes < max(_split_size(specs), 1):
        cmd = [sys.executable, "reconstruct.py", "-e", str(exp), "-c", last]
        # hundreds-of-shapes sweeps: 256^3 host marching is ~20 s/shape
        # on a busy 2-core box (hours for 400 shapes); reconstruction
        # meshes for the big double_lattice families use 128^3 (the
        # chamfer eval is self-consistent — the reference ships no
        # evaluation artifacts to match, having deleted evaluate.py)
        if _split_size(specs) >= 200:
            cmd += ["--resolution", "128"]
        if run(cmd, log):
            return False

    if force or not _eval_complete(exp, specs, eval_marker):
        if run([sys.executable, "evaluate.py", "-e", str(exp), "-c", last,
                "--emd"], log):
            return False
        if not _eval_complete(exp, specs, eval_marker):
            print(f"  {name}: EVAL INCOMPLETE (missing GT surface "
                  "samples? rerun datagen then this queue)", flush=True)
            return False
    print(f"  {name}: PIPELINE COMPLETE", flush=True)
    return True


def _split_size(specs) -> int:
    split_path = ROOT / specs["TestSplit"]
    if not split_path.exists():
        return 0
    split = json.load(open(split_path))
    return sum(len(ids) for ds in split.values() for ids in ds.values())


def _eval_complete(exp, specs, eval_marker) -> bool:
    """chamfer.json must cover the whole test split: evaluate.py skips
    shapes whose GT surface samples are missing (with a warning), so a
    partial artifact would otherwise pass the done-check forever."""
    if not eval_marker.exists():
        return False
    split_path = ROOT / specs["TestSplit"]
    if not split_path.exists():
        return True  # split not generated on this machine; can't audit
    split_ids = set()
    split = json.load(open(split_path))
    for ds_name, ds in split.items():
        for cls_name, ids in ds.items():
            split_ids.update(f"{ds_name}/{cls_name}/{i}" for i in ids)
    done = json.load(open(eval_marker))  # keys are "ds/cls/id"
    return split_ids <= set(done)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("experiments", nargs="*")
    p.add_argument("--all", action="store_true")
    p.add_argument("--no-fused", action="store_true")
    p.add_argument("--force", action="store_true")
    args = p.parse_args()
    queue = DEFAULT_QUEUE if args.all else args.experiments
    failures = []
    for name in queue:
        print(f"=== {name} ===", flush=True)
        try:
            ok = pipeline(name, fused=not args.no_fused, force=args.force)
        except Exception as e:
            print(f"  {name}: EXCEPTION {e}", flush=True)
            ok = False
        if not ok:
            failures.append(name)
    print(f"queue done; failures: {failures or 'none'}", flush=True)
    sys.exit(1 if failures else 0)
