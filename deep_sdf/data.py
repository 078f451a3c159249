"""deep_sdf.data facade (ref: deep_sdf/data.py)."""

from deepsdf_tpu.data.dataset import (  # noqa: F401
    SDFSamples,
    get_instance_filenames,
    remove_nans,
    unpack_sdf_samples,
)
