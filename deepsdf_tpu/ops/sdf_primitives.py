"""Analytic SDF primitives and CSG combinators, JAX-native.

TPU-first replacement for the reference's numpy SDF zoo
(ref: sdf_sampler/microstructures.py:3-37, sdf_sampler/sdf_sampler.py:60-68):
every primitive is a pure function (N,3)→(N,) that jits/vmaps, so
ground-truth sampling for data generation runs on-device in one fused
kernel instead of a per-shape numpy loop.

Behavioral quirks preserved:
  * ``cross_ms`` starts from the *unshifted* inf-norm (no size
    subtraction) before min-ing in the three cylinders — exactly the
    reference's formula (microstructures.py:7-20).
  * ``corner_spheres`` subtracts p=3-norm "spheres" at the 8 cube
    corners (microstructures.py:28-37).
"""

from __future__ import annotations

import jax.numpy as jnp


# ---- combinators (ref: sdf_sampler.py:36-58 — union via max/min trick) ----

def union(*sdfs):
    def f(q):
        vals = [s(q) for s in sdfs]
        out = vals[0]
        for v in vals[1:]:
            out = jnp.minimum(out, v)
        return out
    return f


def intersection(*sdfs):
    def f(q):
        vals = [s(q) for s in sdfs]
        out = vals[0]
        for v in vals[1:]:
            out = jnp.maximum(out, v)
        return out
    return f


def negate(sdf):
    return lambda q: -sdf(q)


def subtract(a, b):
    """a minus b (max(a, -b))."""
    return lambda q: jnp.maximum(a(q), -b(q))


# ---- primitives ----

def box(box_size: float = 1.0, center=(0.0, 0.0, 0.0)):
    """Chebyshev-norm box (ref: sdf_sampler.py:60-68 BoxSDF)."""
    c = jnp.asarray(center)

    def f(q):
        return jnp.linalg.norm(q - c, ord=jnp.inf, axis=-1) - box_size
    return f


def sphere(radius: float = 1.0, center=(0.0, 0.0, 0.0), ord=2):
    c = jnp.asarray(center)

    def f(q):
        d = q - c
        if ord == 2:
            return jnp.sqrt(jnp.sum(d * d, axis=-1)) - radius
        return jnp.sum(jnp.abs(d) ** ord, axis=-1) ** (1.0 / ord) - radius
    return f


def cylinder(radius: float, axis: int):
    """Infinite cylinder along coordinate ``axis``."""
    def f(q):
        others = [i for i in range(q.shape[-1]) if i != axis]
        return jnp.sqrt(sum(q[..., i] ** 2 for i in others)) - radius
    return f


def plane(dim: int, offset: float, sign: float = 1.0):
    """Half-space: sign*(q[dim] - offset); negative on the kept side."""
    def f(q):
        return sign * (q[..., dim] - offset)
    return f


# ---- reference microstructures ----

def cross_ms(radius: float):
    """Three orthogonal cylinders ∪ (degenerate) cube term
    (ref: microstructures.py:3-20 CrossMsSDF, bug-for-bug: the cube
    term is |q|_inf with no size offset)."""
    def f(q):
        out = jnp.linalg.norm(q, ord=jnp.inf, axis=-1)
        out = jnp.minimum(out, jnp.sqrt(q[..., 1] ** 2 + q[..., 2] ** 2) - radius)
        out = jnp.minimum(out, jnp.sqrt(q[..., 0] ** 2 + q[..., 2] ** 2) - radius)
        out = jnp.minimum(out, jnp.sqrt(q[..., 0] ** 2 + q[..., 1] ** 2) - radius)
        return out
    return f


def corner_spheres(radius: float, limit: float = 1.0):
    """Cube (size ``limit``) minus 8 corner p=3-norm spheres
    (ref: microstructures.py:23-37 CornerSpheresSDF)."""
    corners = jnp.asarray(
        [[sx, sy, sz] for sx in (-1.0, 1.0) for sy in (-1.0, 1.0) for sz in (-1.0, 1.0)]
    )

    def f(q):
        out = jnp.linalg.norm(q, ord=jnp.inf, axis=-1) - limit
        d = q[..., None, :] - corners  # (N, 8, 3)
        sphere_like = jnp.sum(jnp.abs(d) ** 3, axis=-1) ** (1.0 / 3.0) - radius
        return jnp.maximum(out, jnp.max(-sphere_like, axis=-1))
    return f
