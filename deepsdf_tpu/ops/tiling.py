"""Microstructure tiling transform and border caps (JAX).

Faithful to the reference formulas (SURVEY.md Appendix A):
  * triangle-wave macro→tile transform with t%2 phase shift
    (ref deep_sdf/mesh.py:242-244, duplicated analysis/geometry.py:201-203)
  * cap convention: cap=-1 subtracts material (max with -plane),
    cap=+1 keeps/caps (min with plane), per face x0,x1,y0,y1,z0,z1
    (ref mesh.py:157-164,278-287), always followed by the unit-cube
    trim (ref mesh.py:292-294).
"""

from __future__ import annotations

import jax.numpy as jnp

# face name → (dim, multiplier) (ref mesh.py:157-164)
location_lookup = {
    "x0": (0, -1), "x1": (0, 1),
    "y0": (1, -1), "y1": (1, 1),
    "z0": (2, -1), "z1": (2, 1),
}

# default: subtract material at every face (ref mesh.py:169-175 CapBorderDict)
DEFAULT_CAP_BORDER = {
    loc: {"cap": -1, "measure": 0} for loc in location_lookup
}


def tile_transform(x, t: int):
    """Map macro coordinate x∈[-1,1] to unit-tile coordinate, tiling t
    times: p=2/t; (2/p)·|((x−t%2) mod 2p) − p| − 1 (ref mesh.py:242-244)."""
    p = 2.0 / t
    return (2.0 / p) * jnp.abs(jnp.mod(x - t % 2, p * 2) - p) - 1.0


def tile_transform3(xyz, tiling):
    tx, ty, tz = (int(v) for v in tiling)
    return jnp.stack([
        tile_transform(xyz[..., 0], tx),
        tile_transform(xyz[..., 1], ty),
        tile_transform(xyz[..., 2], tz),
    ], axis=-1)


def apply_border_caps(sdf, samples_orig, cap_border_dict):
    """Per-face plane caps in macro coordinates (ref mesh.py:278-287)."""
    for loc, cap_dict in cap_border_dict.items():
        cap, measure = cap_dict["cap"], cap_dict["measure"]
        dim, multiplier = location_lookup[loc]
        border_sdf = (samples_orig[..., dim] - multiplier * (1 - measure)) * -multiplier
        if cap == -1:
            sdf = jnp.maximum(sdf, -border_sdf)
        elif cap == 1:
            sdf = jnp.minimum(sdf, border_sdf)
        else:
            raise ValueError("Cap must be -1 or 1")
    return sdf


def apply_unit_cube_trim(sdf, samples_orig):
    """Remove everything outside [-1,1]³ (ref mesh.py:292-294)."""
    for dim, measure in zip((0, 0, 1, 1, 2, 2), (-1, 1, -1, 1, -1, 1)):
        border_sdf = (samples_orig[..., dim] - measure) * -measure
        sdf = jnp.maximum(sdf, -border_sdf)
    return sdf
