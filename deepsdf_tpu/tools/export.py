"""Decoder export for external inference.

Two paths (capability superset of ref create_libtorch_executable.py:4-33,
which traced the torch decoder to ``cpp_model.pt``):

* ``export_torchscript`` — builds an equivalent torch module from the
  JAX params (CPU torch, lazy import) and traces it, producing a
  drop-in ``cpp_model.pt`` artifact loadable by LibTorch — byte-level
  capability parity with C22.
* ``export_stablehlo`` — serializes the jitted decoder via
  ``jax.export`` to portable StableHLO, the TPU-native serving format
  (re-loadable by any XLA runtime, incl. C++ PJRT clients).
"""

from __future__ import annotations

import os

import numpy as np


def _torch_module_from_params(config, params):
    import torch
    import torch.nn as nn

    from ..networks.decoder import effective_weight

    class TracedDecoder(nn.Module):
        def __init__(self):
            super().__init__()
            self.geom = config.geom_dimension
            self.latent_in = tuple(config.latent_in)
            self.xyz_in_all = bool(config.xyz_in_all)
            self.use_tanh = bool(config.use_tanh)
            self.num_layers = config.num_layers
            self.norm = []
            for layer in range(config.num_layers - 1):
                w = np.asarray(effective_weight(params[f"lin{layer}"]))
                b = np.asarray(params[f"lin{layer}"]["b"])
                lin = nn.Linear(w.shape[0], w.shape[1])
                with torch.no_grad():
                    lin.weight.copy_(torch.from_numpy(w.T.copy()))
                    lin.bias.copy_(torch.from_numpy(b.copy()))
                setattr(self, f"lin{layer}", lin)
                if config.has_layer_norm(layer):
                    bn = nn.LayerNorm(w.shape[1])
                    with torch.no_grad():
                        bn.weight.copy_(torch.from_numpy(
                            np.asarray(params[f"bn{layer}"]["scale"]).copy()))
                        bn.bias.copy_(torch.from_numpy(
                            np.asarray(params[f"bn{layer}"]["bias"]).copy()))
                    setattr(self, f"bn{layer}", bn)
                    self.norm.append(layer)

        def forward(self, inputs):
            xyz = inputs[:, -self.geom:]
            x = inputs
            for layer in range(self.num_layers - 1):
                if layer in self.latent_in:
                    x = torch.cat([x, inputs], dim=1)
                elif layer != 0 and self.xyz_in_all:
                    x = torch.cat([x, xyz], dim=1)
                x = getattr(self, f"lin{layer}")(x)
                if layer == self.num_layers - 2 and self.use_tanh:
                    x = torch.tanh(x)
                if layer < self.num_layers - 2:
                    if layer in self.norm:
                        x = getattr(self, f"bn{layer}")(x)
                    x = torch.relu(x)
            return torch.tanh(x)

    return TracedDecoder()


def export_torchscript(config, params, filename: str) -> str:
    """Trace + save a LibTorch-loadable module
    (ref create_libtorch_executable.py:10-27 traced with a (1, L+geom)
    example and saved as cpp_model.pt)."""
    import torch

    mod = _torch_module_from_params(config, params)
    mod.eval()
    example = torch.zeros(1, config.latent_size + config.geom_dimension)
    traced = torch.jit.trace(mod, example)
    scripted = torch.jit.script(traced)
    os.makedirs(os.path.dirname(os.path.abspath(filename)), exist_ok=True)
    scripted.save(filename)
    return filename


def export_torchscript_from_experiment(experiment_directory: str,
                                       checkpoint: str = "latest",
                                       filename: str | None = None) -> str:
    from .. import workspace as ws

    config, params = ws.load_trained_model(experiment_directory, checkpoint)
    filename = filename or os.path.join(experiment_directory, "cpp_model.pt")
    return export_torchscript(config, params, filename)


def export_stablehlo(config, params, filename: str, batch: int = 0) -> str:
    """Serialize the jitted decoder to portable StableHLO bytes.

    ``batch=0`` exports with a symbolic (polymorphic) batch dimension.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from ..networks.decoder import decoder_forward

    in_dim = config.latent_size + config.geom_dimension

    def fn(inputs):
        return decoder_forward(config, params, inputs)

    if batch == 0:
        (b,) = jexport.symbolic_shape("b")
        arg = jax.ShapeDtypeStruct((b, in_dim), jnp.float32)
    else:
        arg = jax.ShapeDtypeStruct((batch, in_dim), jnp.float32)
    exported = jexport.export(jax.jit(fn))(arg)
    data = exported.serialize()
    os.makedirs(os.path.dirname(os.path.abspath(filename)), exist_ok=True)
    with open(filename, "wb") as f:
        f.write(data)
    return filename


def load_stablehlo(filename: str):
    from jax import export as jexport

    with open(filename, "rb") as f:
        return jexport.deserialize(f.read())
