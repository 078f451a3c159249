"""deep_sdf.utils facade (ref: deep_sdf/utils.py)."""

from __future__ import annotations

import numpy as np

from deepsdf_tpu.utils import (  # noqa: F401
    add_common_args,
    configure_logging,
    format_memory_size,
    log_memory_usage,
)


def decode_sdf(decoder, latent_vector, queries):
    """ref utils.py:54-65."""
    import jax.numpy as jnp

    from deepsdf_tpu.networks.decoder import decode_sdf as _decode

    lv = None if latent_vector is None else jnp.asarray(latent_vector).reshape(-1)
    return _decode(decoder.config, decoder.params, lv, jnp.asarray(queries))


def get_MS(decoder, latent_vector, res: int = 100):
    """ref utils.py:67-86 (2-D slice evaluation)."""
    from deepsdf_tpu.tools.plotting import get_MS as _get

    return _get(decoder.config, decoder.params, np.asarray(latent_vector), res=res)
