"""Analytic microstructure SDF classes (ref: sdf_sampler/microstructures.py:3-37).

Thin object wrappers over the JAX primitives in
``deepsdf_tpu.ops.sdf_primitives`` — the ``.SDF`` method name matches
the reference API (used as ``[MS.SDF for MS in ms]`` in the data-gen
scripts, ref: evaluation_scripts/04_simple_geom_creation.py:13).
"""

from __future__ import annotations

import jax
import numpy as np

from ..ops import sdf_primitives as prim


class CrossMsSDF:
    """Three orthogonal cylinders (ref: microstructures.py:3-20)."""

    def __init__(self, radius):
        self.r = radius
        self._f = jax.jit(prim.cross_ms(float(radius)))

    def SDF(self, xyz):
        return np.asarray(self._f(np.asarray(xyz))).reshape(-1, 1)

    __call__ = SDF


class CornerSpheresSDF:
    """Cube minus 8 corner p=3 spheres (ref: microstructures.py:23-37)."""

    def __init__(self, radius, limit=1):
        self.r = radius
        self.limit = limit
        self._f = jax.jit(prim.corner_spheres(float(radius), float(limit)))

    def SDF(self, xyz):
        return np.asarray(self._f(np.asarray(xyz))).reshape(-1, 1)

    __call__ = SDF
