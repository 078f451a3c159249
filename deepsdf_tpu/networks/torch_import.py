"""Import reference PyTorch checkpoints into deepsdf_tpu param pytrees.

The reference stores ``{"epoch": e, "model_state_dict": ...}`` .pth
files (ref: train_deep_sdf.py:96-103) with DataParallel ``module.``
prefixes (ref: train_deep_sdf.py:353, SURVEY.md Appendix A), and the
LibTorch export ``cpp_model.pt`` is a TorchScript trace whose
state_dict keeps the same parameter names (ref:
create_libtorch_executable.py:4-33).

torch (CPU build) is only imported lazily here — it never touches the
TPU compute path.
"""

from __future__ import annotations

import numpy as np


def _strip_module_prefix(state_dict: dict) -> dict:
    return {
        (k[len("module."):] if k.startswith("module.") else k): v
        for k, v in state_dict.items()
    }


def params_from_state_dict(state_dict: dict, config) -> dict:
    """Convert a torch state_dict (tensor values) into a decoder pytree.

    Handles both plain Linear (``lin{i}.weight``) and weight-normed
    layers. Two weight-norm naming schemes exist in torch:
      * new parametrizations API: ``lin{i}.parametrizations.weight.original0``
        (g, shape (out,1)) and ``...original1`` (v, shape (out,in))
      * legacy ``lin{i}.weight_g`` / ``lin{i}.weight_v``
    Torch Linear weights are (out,in); we transpose to (in,out).
    """
    import jax.numpy as jnp

    sd = {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
          for k, v in _strip_module_prefix(state_dict).items()}
    params: dict = {}
    for layer in range(config.num_layers - 1):
        p = f"lin{layer}"
        b = sd[f"{p}.bias"]
        if f"{p}.parametrizations.weight.original0" in sd:
            g = sd[f"{p}.parametrizations.weight.original0"]
            v = sd[f"{p}.parametrizations.weight.original1"]
        elif f"{p}.weight_g" in sd:
            g = sd[f"{p}.weight_g"]
            v = sd[f"{p}.weight_v"]
        else:
            w = sd[f"{p}.weight"]
            params[p] = {"w": jnp.asarray(w.T), "b": jnp.asarray(b)}
            if config.has_layer_norm(layer):
                params[f"bn{layer}"] = {
                    "scale": jnp.asarray(sd[f"bn{layer}.weight"]),
                    "bias": jnp.asarray(sd[f"bn{layer}.bias"]),
                }
            continue
        if not config.has_weight_norm(layer):
            raise ValueError(f"layer {layer} has weight-norm params but config disagrees")
        params[p] = {
            "v": jnp.asarray(v.T),            # (in, out)
            "g": jnp.asarray(g.reshape(-1)),  # (out,)
            "b": jnp.asarray(b),
        }
    return params


def load_reference_model(path: str, config) -> tuple[dict, int | None]:
    """Load a reference .pth checkpoint or TorchScript .pt trace.

    Returns (params, epoch) — epoch is None for TorchScript traces.
    """
    import torch

    if path.endswith(".pt"):
        mod = torch.jit.load(path, map_location="cpu")
        return params_from_state_dict(mod.state_dict(), config), None
    data = torch.load(path, map_location="cpu", weights_only=True)
    sd = data["model_state_dict"] if "model_state_dict" in data else data
    return params_from_state_dict(sd, config), data.get("epoch")


def load_reference_latents(path: str) -> tuple[np.ndarray, int | None]:
    """Load a reference LatentCodes .pth file → (num_shapes, L) array.

    Supports both the Embedding-state and legacy stacked-tensor formats
    (ref: train_deep_sdf.py:157-174, workspace.py:97-115).
    """
    import torch

    data = torch.load(path, map_location="cpu", weights_only=True)
    codes = data["latent_codes"]
    if isinstance(codes, torch.Tensor):
        # legacy: (num, 1, L)
        arr = codes.detach().cpu().numpy()
        return arr.reshape(arr.shape[0], arr.shape[-1]), data.get("epoch")
    return codes["weight"].detach().cpu().numpy(), data.get("epoch")
