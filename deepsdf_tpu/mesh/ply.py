"""Minimal PLY mesh IO (replaces the ``plyfile`` dependency).

The reference writes PLY via a per-vertex Python loop flagged as slow
(ref: deep_sdf/mesh.py:136-149, SURVEY.md §3.2); here both binary and
ascii paths are fully vectorized numpy structured-array writes.
"""

from __future__ import annotations

import numpy as np


def write_ply(filename: str, vertices: np.ndarray, faces: np.ndarray,
              binary: bool = True) -> None:
    vertices = np.asarray(vertices, dtype=np.float32)
    faces = np.asarray(faces, dtype=np.int32)
    fmt = "binary_little_endian" if binary else "ascii"
    header = (
        "ply\n"
        f"format {fmt} 1.0\n"
        f"element vertex {len(vertices)}\n"
        "property float x\nproperty float y\nproperty float z\n"
        f"element face {len(faces)}\n"
        "property list uchar int vertex_indices\n"
        "end_header\n"
    )
    with open(filename, "wb") as f:
        f.write(header.encode("ascii"))
        if binary:
            f.write(np.ascontiguousarray(vertices, "<f4").tobytes())
            face_rec = np.empty(len(faces), dtype=[("n", "u1"), ("idx", "<i4", (3,))])
            face_rec["n"] = 3
            face_rec["idx"] = faces
            f.write(face_rec.tobytes())
        else:
            np.savetxt(f, vertices, fmt="%.7g")
            np.savetxt(f, np.hstack([np.full((len(faces), 1), 3), faces]), fmt="%d")


def read_ply(filename: str) -> tuple[np.ndarray, np.ndarray]:
    """Read vertex positions + triangle faces (binary-LE or ascii,
    x/y/z float32 + uchar-int32 face lists as written by write_ply;
    tolerates extra vertex properties by skipping them in ascii)."""
    with open(filename, "rb") as f:
        # ---- header ----
        line = f.readline().strip()
        if line != b"ply":
            raise ValueError("not a PLY file")
        fmt = None
        n_verts = n_faces = 0
        vert_props: list[tuple[str, str]] = []
        in_vertex = False
        while True:
            line = f.readline().strip()
            if line == b"end_header":
                break
            parts = line.decode("ascii").split()
            if not parts:
                continue
            if parts[0] == "format":
                fmt = parts[1]
            elif parts[0] == "element":
                in_vertex = parts[1] == "vertex"
                if parts[1] == "vertex":
                    n_verts = int(parts[2])
                elif parts[1] == "face":
                    n_faces = int(parts[2])
            elif parts[0] == "property" and in_vertex and parts[1] != "list":
                vert_props.append((parts[2], parts[1]))

        type_map = {"float": "<f4", "float32": "<f4", "double": "<f8",
                    "uchar": "u1", "uint8": "u1", "int": "<i4", "int32": "<i4"}
        if fmt == "binary_little_endian":
            vdt = np.dtype([(n, type_map[t]) for n, t in vert_props])
            vraw = np.frombuffer(f.read(n_verts * vdt.itemsize), dtype=vdt)
            verts = np.stack([vraw["x"], vraw["y"], vraw["z"]], axis=1).astype(np.float32)
            fdt = np.dtype([("n", "u1"), ("idx", "<i4", (3,))])
            fraw = np.frombuffer(f.read(n_faces * fdt.itemsize), dtype=fdt)
            faces = fraw["idx"].astype(np.int32)
        elif fmt == "ascii":
            rows = [f.readline().split() for _ in range(n_verts)]
            arr = np.asarray(rows, dtype=np.float64)
            names = [n for n, _ in vert_props]
            ix, iy, iz = names.index("x"), names.index("y"), names.index("z")
            verts = arr[:, [ix, iy, iz]].astype(np.float32)
            faces = np.asarray([f.readline().split()[1:4] for _ in range(n_faces)],
                               dtype=np.int32)
        else:
            raise ValueError(f"unsupported PLY format {fmt}")
    return verts, faces
