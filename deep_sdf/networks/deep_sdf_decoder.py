"""deep_sdf.networks.deep_sdf_decoder facade: the reference's dynamic
NetworkArch import point (ref train_deep_sdf.py:275) resolves here."""

from deepsdf_tpu.networks.decoder import Decoder  # noqa: F401
