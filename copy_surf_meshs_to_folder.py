#!/usr/bin/env python3
"""Collect ``*surf*.inp`` surface meshes from optimization runs into one folder.

Parity with the reference utility of the same name
(reference copy_surf_meshs_to_folder.py:15-40): walks a source tree, copies
every file whose name contains ``surf`` and ends in ``.inp`` to the
destination, and reports per-file and total sizes.
"""

import argparse
import os
import shutil


def human_size(n: int) -> str:
    units = ("B", "KB", "MB", "GB", "TB")
    i = 0
    size = float(n)
    while size >= 1024.0 and i < len(units) - 1:
        size /= 1024.0
        i += 1
    return f"{size:.2f} {units[i]}"


def find_and_copy_files(source_dir: str, destination_dir: str) -> int:
    os.makedirs(destination_dir, exist_ok=True)
    total = 0
    for root, _dirs, files in os.walk(source_dir):
        for name in files:
            if "surf" in name and name.endswith(".inp"):
                src = os.path.join(root, name)
                size = os.path.getsize(src)
                total += size
                shutil.copy(src, destination_dir)
                print(f"Copied: {src} ({human_size(size)}) to {destination_dir}")
    print(f"\nTotal size of copied files: {human_size(total)}")
    return total


def main():
    parser = argparse.ArgumentParser(
        description="Find and copy *surf*.inp files to a new directory.")
    parser.add_argument("source_dir", help="directory to search")
    parser.add_argument("destination_dir", help="directory to copy into")
    args = parser.parse_args()
    find_and_copy_files(args.source_dir, args.destination_dir)


if __name__ == "__main__":
    main()
