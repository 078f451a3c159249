"""ctypes binding for the native preprocessing library.

Builds on demand (``make -C native/preprocess``) and exposes the C API
of native/preprocess/deepsdf_native.cpp: mesh loading, unit-sphere
normalization, BVH signed distances, surface/SDF sampling, npz output.
Capability surface of the reference's C++ components C23–C26/C28
(SURVEY.md §2) without the Pangolin/OpenGL stack.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "native", "preprocess")
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "libdeepsdf_native.so")

_lib = None


def build_native(force: bool = False) -> str:
    """Compile the native library if missing; returns its path."""
    if force or not os.path.isfile(_LIB_PATH):
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
    return _LIB_PATH


def _get_lib():
    global _lib
    if _lib is None:
        path = build_native()
        lib = ctypes.CDLL(path)
        lib.dsdf_load_mesh.restype = ctypes.c_void_p
        lib.dsdf_load_mesh.argtypes = [ctypes.c_char_p]
        lib.dsdf_load_mesh_arrays.restype = ctypes.c_void_p
        lib.dsdf_load_mesh_arrays.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.c_int]
        lib.dsdf_free_mesh.argtypes = [ctypes.c_void_p]
        lib.dsdf_num_vertices.argtypes = [ctypes.c_void_p]
        lib.dsdf_num_faces.argtypes = [ctypes.c_void_p]
        lib.dsdf_normalize.argtypes = [
            ctypes.c_void_p, ctypes.c_float,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float)]
        lib.dsdf_signed_distance.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float)]
        lib.dsdf_sample_surface.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_float)]
        lib.dsdf_sample_sdf.restype = ctypes.c_int
        lib.dsdf_sample_sdf.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_float, ctypes.c_float,
            ctypes.c_float, ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float)]
        lib.dsdf_write_sdf_npz.restype = ctypes.c_int
        lib.dsdf_write_sdf_npz.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int]
        lib.dsdf_write_normalization_npz.restype = ctypes.c_int
        lib.dsdf_write_normalization_npz.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_float]
        lib.dsdf_assemble_jacobian.restype = None
        lib.dsdf_assemble_jacobian.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.c_longlong,
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_float)]
        _lib = lib
    return _lib


def assemble_jacobian(e: np.ndarray, gl: np.ndarray, gh: np.ndarray,
                      Blo: np.ndarray, Bhi: np.ndarray) -> np.ndarray:
    """out[v,x,c,l] = e[v,x]*(gl[v,l]*Blo[v,c] + gh[v,l]*Bhi[v,c]) —
    the diff-mesh jacobian rank-1 expansion, streamed by the OpenMP
    kernel in deepsdf_native.cpp (one pass over the output instead of
    the 2-3 full-tensor numpy/torch passes)."""
    lib = _get_lib()
    V, L = gl.shape
    C = Blo.shape[1]
    arrs = [np.ascontiguousarray(a, dtype=np.float32)
            for a in (e, gl, gh, Blo, Bhi)]
    out = np.empty((V, 3, C, L), dtype=np.float32)
    lib.dsdf_assemble_jacobian(*[_fptr(a) for a in arrs], V, C, L, _fptr(out))
    return out


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


class NativeMesh:
    """RAII wrapper over the native mesh handle."""

    def __init__(self, path: str | None = None, vertices=None, faces=None):
        lib = _get_lib()
        if path is not None:
            self._h = lib.dsdf_load_mesh(path.encode())
        else:
            v = np.ascontiguousarray(vertices, dtype=np.float32)
            f = np.ascontiguousarray(faces, dtype=np.int32)
            self._h = lib.dsdf_load_mesh_arrays(
                _fptr(v), len(v), f.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
                len(f))
        if not self._h:
            raise IOError(f"could not load mesh {path!r}")
        self._lib = lib

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.dsdf_free_mesh(self._h)
            self._h = None

    @property
    def num_vertices(self) -> int:
        return self._lib.dsdf_num_vertices(self._h)

    @property
    def num_faces(self) -> int:
        return self._lib.dsdf_num_faces(self._h)

    def normalize(self, buffer: float = 1.03):
        """Unit-sphere normalization (ref Utils.cpp buffer 1.03).
        Returns (offset (3,), scale)."""
        off = (ctypes.c_float * 3)()
        scale = ctypes.c_float()
        self._lib.dsdf_normalize(self._h, buffer, off, ctypes.byref(scale))
        return np.asarray(off[:]), float(scale.value)

    def signed_distance(self, queries: np.ndarray) -> np.ndarray:
        q = np.ascontiguousarray(queries, dtype=np.float32)
        out = np.empty(len(q), dtype=np.float32)
        self._lib.dsdf_signed_distance(self._h, _fptr(q), len(q), _fptr(out))
        return out

    def sample_surface(self, n: int, seed: int = 0) -> np.ndarray:
        out = np.empty((n, 3), dtype=np.float32)
        self._lib.dsdf_sample_surface(self._h, n, seed, _fptr(out))
        return out

    def sample_sdf(self, num_sample: int = 500000, variance: float = 0.005,
                   near_ratio: float = 47.0 / 50.0, cube_dim: float = 2.0,
                   seed: int = 0):
        """(xyz (n,3), sdf (n,)) — ref PreprocessMesh sampling recipe."""
        xyz = np.empty((num_sample, 3), dtype=np.float32)
        sdf = np.empty(num_sample, dtype=np.float32)
        n = self._lib.dsdf_sample_sdf(self._h, num_sample, variance, near_ratio,
                                      cube_dim, seed, _fptr(xyz), _fptr(sdf))
        return xyz[:n], sdf[:n]


def write_sdf_npz(path: str, pos: np.ndarray, neg: np.ndarray) -> None:
    lib = _get_lib()
    pos = np.ascontiguousarray(pos, dtype=np.float32)
    neg = np.ascontiguousarray(neg, dtype=np.float32)
    rc = lib.dsdf_write_sdf_npz(path.encode(), _fptr(pos), len(pos),
                                _fptr(neg), len(neg), 1)
    if rc != 0:
        raise IOError(f"failed writing {path}")


def preprocess_mesh_to_npz(mesh_path: str, out_path: str, num_sample: int = 500000,
                           variance: float = 0.005, seed: int = 0,
                           normalize: bool = True):
    """End-to-end C23 parity: mesh file → normalized → sampled → npz."""
    m = NativeMesh(mesh_path)
    offset, scale = (np.zeros(3), 1.0)
    if normalize:
        offset, scale = m.normalize()
    xyz, sdf = m.sample_sdf(num_sample=num_sample, variance=variance, seed=seed)
    rows = np.concatenate([xyz, sdf[:, None]], axis=1)
    write_sdf_npz(out_path, rows[sdf >= 0], rows[sdf < 0])
    return offset, scale
