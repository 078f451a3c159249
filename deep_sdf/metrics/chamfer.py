"""deep_sdf.metrics.chamfer facade (ref: deep_sdf/metrics/chamfer.py)."""

from deepsdf_tpu.metrics.chamfer import compute_trimesh_chamfer  # noqa: F401
