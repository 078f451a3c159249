"""Functional DeepSDF auto-decoder for TPU (JAX).

Re-implements the behavior of the reference Decoder
(ref: deep_sdf/networks/deep_sdf_decoder.py:9-111) as a pure function
over an explicit parameter pytree — no mutable modules, PRNG keys are
threaded explicitly, and the forward is a chain of dense matmuls that
XLA tiles onto the MXU.

Behavioral notes preserved exactly (SURVEY.md Appendix A):
  * final ``tanh`` is applied unconditionally (ref :73,108-109), *in
    addition to* the optional ``use_tanh`` pre-tanh at the last linear
    layer (ref :94-95) — i.e. double tanh when ``use_tanh``.
  * a layer listed in ``latent_in`` concatenates the raw network input
    onto the running activation *before* its linear (ref :88-89), and
    the preceding layer's out_dim is reduced by ``dims[0]`` so the
    concat restores the configured width (ref :42-46).
  * ``xyz_in_all`` appends xyz before every non-first, non-last layer
    (ref :47-48, :90-91).
  * weight norm: w = g * v/|v|_row, per-output-row norms (torch
    ``weight_norm`` with default dim=0); mutually exclusive with
    LayerNorm on the same layer (ref :50-64).
  * dropout p=``dropout_prob`` after ReLU on listed layers, latent
    dropout p=0.2 on the latent slice of the input (ref :79-82,:105-106).

Weights are stored transposed relative to torch — ``w``/``v`` have
shape (in_dim, out_dim) so the forward is ``x @ w + b``.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp

Params = Any  # nested dict pytree


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    """Static architecture config (hashable — usable as a jit static arg).

    Mirrors the reference constructor signature
    (ref: deep_sdf/networks/deep_sdf_decoder.py:10-23).
    """

    latent_size: int
    dims: tuple[int, ...]
    geom_dimension: int = 3
    dropout: tuple[int, ...] | None = None
    dropout_prob: float = 0.0
    norm_layers: tuple[int, ...] = ()
    latent_in: tuple[int, ...] = ()
    weight_norm: bool = False
    xyz_in_all: bool = False
    use_tanh: bool = False
    latent_dropout: bool = False

    @classmethod
    def from_specs(cls, specs: dict) -> "DecoderConfig":
        """Build from a reference-compatible specs.json dict
        (ref: train_deep_sdf.py:275,345-349)."""
        ns = dict(specs["NetworkSpecs"])
        kw = dict(
            latent_size=specs["CodeLength"],
            dims=tuple(ns.pop("dims")),
            geom_dimension=ns.pop("geom_dimension", 3),
        )
        if "dropout" in ns:
            d = ns.pop("dropout")
            kw["dropout"] = tuple(d) if d is not None else None
        for key in ("norm_layers", "latent_in"):
            if key in ns:
                kw[key] = tuple(ns.pop(key))
        for key in ("dropout_prob", "weight_norm", "xyz_in_all", "use_tanh", "latent_dropout"):
            if key in ns:
                v = ns.pop(key)
                kw[key] = bool(v) if isinstance(v, bool) or key != "dropout_prob" else v
        if ns:
            raise ValueError(f"unknown NetworkSpecs keys: {sorted(ns)}")
        kw["xyz_in_all"] = bool(kw.get("xyz_in_all") or False)
        return cls(**kw)

    # ---- derived static shapes (mirror ref __init__ logic) ----

    @property
    def all_dims(self) -> tuple[int, ...]:
        return (self.latent_size + self.geom_dimension, *self.dims, 1)

    @property
    def num_layers(self) -> int:
        return len(self.all_dims)

    def layer_out_dim(self, layer: int) -> int:
        """ref: deep_sdf_decoder.py:42-48"""
        dims = self.all_dims
        if (layer + 1) in self.latent_in:
            return dims[layer + 1] - dims[0]
        out = dims[layer + 1]
        if self.xyz_in_all and layer != self.num_layers - 2:
            out -= self.geom_dimension
        return out

    def layer_in_dim(self, layer: int) -> int:
        """Input width of linear ``layer`` after any concat."""
        dims = self.all_dims
        in_dim = dims[layer] if layer == 0 else self.layer_out_dim(layer - 1)
        if layer in self.latent_in:
            in_dim += dims[0]
        elif layer != 0 and self.xyz_in_all:
            in_dim += self.geom_dimension
        return in_dim

    def has_weight_norm(self, layer: int) -> bool:
        return self.weight_norm and layer in self.norm_layers

    def has_layer_norm(self, layer: int) -> bool:
        return (not self.weight_norm) and layer in self.norm_layers


def init_decoder_params(key: jax.Array, config: DecoderConfig, dtype=jnp.float32) -> Params:
    """Initialize parameters matching torch nn.Linear defaults
    (kaiming-uniform weights, uniform bias in ±1/sqrt(fan_in))."""
    params: dict[str, Any] = {}
    for layer in range(config.num_layers - 1):
        in_dim = config.layer_in_dim(layer)
        out_dim = config.layer_out_dim(layer)
        key, wk, bk = jax.random.split(key, 3)
        # torch kaiming_uniform_(a=√5): gain=√(2/6)=1/√3, std=1/√(3·fan_in),
        # bound=√3·std = 1/√fan_in (NOT √(3/fan_in) — that extra √3 makes
        # deep weight-normed stacks saturate the final tanh)
        bound_w = math.sqrt(1.0 / in_dim)
        w = jax.random.uniform(wk, (in_dim, out_dim), dtype, -bound_w, bound_w)
        bound_b = 1.0 / math.sqrt(in_dim)
        if layer == config.num_layers - 2:
            # Final (SDF-output) layer: zero bias. The torch bound
            # 1/sqrt(fan_in) exceeds ClampingDistance=0.1 for narrow nets
            # (fan_in 32 → ±0.177), and a draw past the band puts EVERY
            # initial prediction outside the clamp where the L1 gradient
            # is identically zero — training never starts (torch.clamp
            # has the same dead zone; the reference's committed runs just
            # won that seed lottery, train_deep_sdf.py:516-521). Zero is
            # the mean of torch's draw and keeps init predictions
            # centered in the band.
            b = jnp.zeros((out_dim,), dtype)
        else:
            b = jax.random.uniform(bk, (out_dim,), dtype, -bound_b, bound_b)
        if config.has_weight_norm(layer):
            g = jnp.linalg.norm(w, axis=0)  # per-output-row norm (torch dim=0)
            params[f"lin{layer}"] = {"v": w, "g": g, "b": b}
        else:
            params[f"lin{layer}"] = {"w": w, "b": b}
        if config.has_layer_norm(layer):
            params[f"bn{layer}"] = {
                "scale": jnp.ones((out_dim,), dtype),
                "bias": jnp.zeros((out_dim,), dtype),
            }
    return params


def effective_weight(layer_params: dict) -> jax.Array:
    """Materialize the (in, out) weight; resolves weight-norm reparam."""
    if "v" in layer_params:
        v = layer_params["v"]
        norm = jnp.linalg.norm(v, axis=0, keepdims=True)
        return layer_params["g"][None, :] * v / norm
    return layer_params["w"]


def _layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array, eps: float = 1e-5) -> jax.Array:
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def _dropout(x: jax.Array, rate: float, key: jax.Array) -> jax.Array:
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


class Decoder:
    """Thin convenience wrapper pairing a config with pure functions.

    The real API is the module-level pure functions; this class mirrors
    the reference's ``Decoder`` object surface for familiarity.
    """

    def __init__(self, latent_size: int, dims: Sequence[int], geom_dimension: int = 3, **kw):
        if "dropout" in kw and kw["dropout"] is not None:
            kw["dropout"] = tuple(kw["dropout"])
        for key in ("norm_layers", "latent_in"):
            if key in kw:
                kw[key] = tuple(kw[key])
        self.config = DecoderConfig(
            latent_size=latent_size, dims=tuple(dims), geom_dimension=geom_dimension, **kw
        )

    def init(self, key: jax.Array, dtype=jnp.float32) -> Params:
        return init_decoder_params(key, self.config, dtype)

    def apply(self, params: Params, inputs: jax.Array, *, training: bool = False,
              rng: jax.Array | None = None) -> jax.Array:
        return decoder_forward(self.config, params, inputs, training=training, rng=rng)

    __call__ = apply


def decoder_forward(config: DecoderConfig, params: Params, inputs: jax.Array, *,
                    training: bool = False, rng: jax.Array | None = None) -> jax.Array:
    """Forward pass: (N, latent+geom) → (N, 1) SDF.

    Faithful to ref deep_sdf_decoder.py:76-111. ``training`` enables
    dropout; ``rng`` is required iff training with dropout configured.
    """
    geom = config.geom_dimension
    xyz = inputs[:, -geom:]

    needs_rng = training and (
        (config.dropout is not None and config.dropout_prob > 0) or config.latent_dropout
    )
    if needs_rng:
        if rng is None:
            raise ValueError("training forward with dropout requires an rng key")
        n_drop = (len(config.dropout) if config.dropout else 0) + 1
        drop_keys = list(jax.random.split(rng, n_drop))
    else:
        drop_keys = []

    if inputs.shape[1] > geom and config.latent_dropout and training:
        latent_vecs = _dropout(inputs[:, :-geom], 0.2, drop_keys.pop())
        x = jnp.concatenate([latent_vecs, xyz], axis=1)
    else:
        x = inputs

    for layer in range(config.num_layers - 1):
        if layer in config.latent_in:
            x = jnp.concatenate([x, inputs], axis=1)
        elif layer != 0 and config.xyz_in_all:
            x = jnp.concatenate([x, xyz], axis=1)
        lp = params[f"lin{layer}"]
        x = x @ effective_weight(lp) + lp["b"]
        if layer == config.num_layers - 2 and config.use_tanh:
            x = jnp.tanh(x)
        if layer < config.num_layers - 2:
            if config.has_layer_norm(layer):
                bn = params[f"bn{layer}"]
                x = _layer_norm(x, bn["scale"], bn["bias"])
            x = jax.nn.relu(x)
            if training and config.dropout is not None and layer in config.dropout \
                    and config.dropout_prob > 0:
                x = _dropout(x, config.dropout_prob, drop_keys.pop())

    return jnp.tanh(x)  # ref :108-109 — unconditional final tanh


def decode_sdf(config: DecoderConfig, params: Params, latent_vector: jax.Array | None,
               queries: jax.Array) -> jax.Array:
    """Broadcast one latent over a query batch, or accept pre-concatenated
    queries when ``latent_vector is None`` (ref: deep_sdf/utils.py:54-65)."""
    if latent_vector is None:
        inputs = queries
    else:
        latent_repeat = jnp.broadcast_to(
            latent_vector.reshape(1, -1), (queries.shape[0], latent_vector.size)
        )
        inputs = jnp.concatenate([latent_repeat, queries], axis=1)
    return decoder_forward(config, params, inputs)
