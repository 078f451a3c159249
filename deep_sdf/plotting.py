"""deep_sdf.plotting facade (ref: deep_sdf/plotting.py)."""

from deepsdf_tpu.tools.plotting import show_random_training_files  # noqa: F401
