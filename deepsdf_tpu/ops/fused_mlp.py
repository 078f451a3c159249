"""Fused point-MLP Pallas kernels — the decoder hot path on TPU.

The auto-decoder forward/backward over millions of points is
bandwidth-bound under plain XLA: every 512-wide activation round-trips
HBM between layers, and dropout masks add another full-tensor pass.
These kernels keep ALL layer weights resident in VMEM and stream point
tiles through the whole MLP in one pass:

  * ``fused_mlp_forward`` — grid over point tiles; per tile: 9 matmuls
    (MXU, bf16 in / f32 accumulate) + ReLU + in-kernel dropout
    (``pltpu.prng_random_bits``) + final tanh; HBM traffic = x in,
    pred out. Used for inference (grid eval) and as the fwd of
    training.
  * backward — custom_vjp recomputes the forward chain per tile
    (activations never touch HBM) and accumulates dW/db in VMEM
    scratch across the sequential TPU grid, writing them once. The
    training fwd additionally streams the split-point activation
    a_{hi-1} to HBM so the upper bwd kernel resumes from it instead
    of recomputing the lower half of the chain (~16% of the fwd+bwd
    matmul FLOPs). Dropout masks are regenerated bit-identically from
    the (seed, tile, layer) PRNG seed tuple.

Architecture coverage: uniform-hidden-width decoders (all reference
configs: 512×8 or 64×4/32×4) with weight-norm (materialized outside —
the (g,v) chain stays in XLA), ``latent_in`` re-concat and
``xyz_in_all`` expressed as per-layer split matmuls
(out = h@A_l + x@B_l + b_l, so no in-kernel concat), optional
pre-tanh. LayerNorm configs fall back to the XLA path
(networks/decoder.py).

ref: the loop this replaces is deep_sdf_decoder.py:86-109 ×
train_deep_sdf.py:509-533.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..networks.decoder import DecoderConfig, effective_weight


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@dataclasses.dataclass(frozen=True)
class FusedMLPSpec:
    """Static kernel plan derived from a DecoderConfig."""

    n_linear: int                 # number of linear layers
    width: int                    # padded uniform hidden width (mult of 128)
    p_in: int                     # padded input feature width (mult of 128)
    in_dim: int                   # real input dim (latent + geom)
    has_b: tuple[bool, ...]       # which layers consume the raw input x
    dropout_layers: tuple[int, ...]
    dropout_prob: float
    use_tanh: bool                # pre-final tanh (ref :94-95)
    tile: int = 512
    bwd_tile: int = 512           # bwd tile (VMEM: weights + dW accumulators + acts)
    bwd_impl: str = "split"       # "split": two kernels, dW in VMEM accumulators,
                                  #   upper resumes from the fwd's a_{hi-1} ckpt
                                  # "stream": dz/acts to HBM + XLA GEMMs
    input_hilo: bool = True       # split x into hi+lo bf16 halves for the B
                                  # matmuls: recovers ~f32 input precision
                                  # (bf16's 8 mantissa bits quantize coords to
                                  # ~0.4% — the dominant kernel error term)
                                  # for 2 extra small matmuls per has_b layer

    @classmethod
    def plan(cls, config: DecoderConfig, tile: int = 512,
             bwd_tile: int | None = None, bwd_impl: str = "split") -> "FusedMLPSpec":
        dims = config.all_dims
        hidden = set(dims[1:-1])
        if len(hidden) != 1:
            raise ValueError(f"fused kernel needs uniform hidden width, got {dims}")
        if any(config.has_layer_norm(l) for l in range(config.num_layers - 1)):
            raise ValueError("LayerNorm configs use the XLA path")
        if config.latent_dropout:
            raise ValueError("latent_dropout uses the XLA path")
        width = _round_up(next(iter(hidden)), 128)
        p_in = _round_up(dims[0], 128)
        if bwd_tile is None:
            # wide inputs (chairs: p_in=384) need the smaller tile to fit
            # x/dx/dB tiles + accumulators next to the weights in VMEM;
            # the stream impl holds per-layer dz+act tiles, so smaller again
            bwd_tile = 256 if bwd_impl == "stream" else \
                512 if p_in <= 256 else 256
        n_linear = config.num_layers - 1
        has_b = tuple(
            l == 0 or l in config.latent_in or (config.xyz_in_all and l != 0)
            for l in range(n_linear)
        )
        dropout_layers = tuple(config.dropout) if (
            config.dropout is not None and config.dropout_prob > 0) else ()
        return cls(
            n_linear=n_linear, width=width, p_in=p_in, in_dim=dims[0],
            has_b=has_b, dropout_layers=dropout_layers,
            dropout_prob=config.dropout_prob, use_tanh=config.use_tanh, tile=tile,
            bwd_tile=bwd_tile, bwd_impl=bwd_impl,
        )


def pack_params(config: DecoderConfig, params: Any, spec: FusedMLPSpec):
    """Materialize weight-norm and zero-pad into the kernel layout.

    Returns (A, B, bias):
      A: (n_linear, width, width) bf16 — h-part weights (A[0] unused=0;
         last layer's single output column lives in column 0)
      B: (n_linear, p_in, width) bf16 — x-part weights (zero when unused)
      bias: (n_linear, width) f32
    This runs in XLA per step; it is differentiable, so the custom_vjp
    of the kernel chains dA/dB/dbias back to (v, g, b) automatically.
    """
    n, D, P = spec.n_linear, spec.width, spec.p_in
    A = jnp.zeros((n, D, D), jnp.float32)
    B = jnp.zeros((n, P, D), jnp.float32)
    bias = jnp.zeros((n, D), jnp.float32)
    geom = config.geom_dimension

    h_width = 0  # real width of the running h entering layer l
    for l in range(spec.n_linear):
        W = effective_weight(params[f"lin{l}"])     # (in_real, out_real)
        b = params[f"lin{l}"]["b"]
        out_real = W.shape[1]
        if l == 0:
            B = B.at[0, :spec.in_dim, :out_real].set(W)
        elif l in config.latent_in:
            A = A.at[l, :h_width, :out_real].set(W[:h_width])
            B = B.at[l, :spec.in_dim, :out_real].set(W[h_width:])
        elif config.xyz_in_all:
            A = A.at[l, :h_width, :out_real].set(W[:h_width])
            # xyz occupies the LAST geom columns of the real input
            B = B.at[l, spec.in_dim - geom:spec.in_dim, :out_real].set(W[h_width:])
        else:
            A = A.at[l, :h_width, :out_real].set(W)
        bias = bias.at[l, :out_real].set(b)
        h_width = out_real
    return A.astype(jnp.bfloat16), B.astype(jnp.bfloat16), bias


def _split_hilo(spec: FusedMLPSpec, x):
    """Split an f32 x tile into (hi, lo) bf16 halves so hi+lo ≈ x to
    ~16 mantissa bits; lo is None when the hilo path is off."""
    if not spec.input_hilo:
        return x, None
    x_hi = x.astype(jnp.bfloat16)
    x_lo = (x.astype(jnp.float32) - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return x_hi, x_lo


def _dot_x(x_hi, x_lo, B):
    """x @ B with the optional low-order correction matmul."""
    z = jnp.dot(x_hi, B, preferred_element_type=jnp.float32)
    if x_lo is not None:
        z = z + jnp.dot(x_lo, B, preferred_element_type=jnp.float32)
    return z


def _inv_keep(spec: FusedMLPSpec) -> float:
    """Inverted-dropout scale, rounded to bf16 (the mask is applied on
    the bf16 activation — half the VPU vector work of an f32 apply).
    Exact for the reference p=0.2 (1.25 is a bf16 value); ≤0.4% scale
    quantization otherwise."""
    if not spec.dropout_layers:
        return 1.0
    # ml_dtypes.bfloat16 is a NUMPY scalar type — safe at trace time;
    # jnp.bfloat16(x) would build a traced array inside the kernel
    import ml_dtypes
    return float(np.float32(ml_dtypes.bfloat16(1.0 / (1.0 - spec.dropout_prob))))


def _layer_act(spec: FusedMLPSpec, training: bool, z, l: int, seed_ref, tile_id):
    """ReLU + (training) dropout for hidden layer ``l``; bf16 result.

    NOTE: the z = bias + h@A (+ x@B) → _layer_act layer chain is
    instantiated in FOUR kernels (_fwd_kernel, _bwd_kernel,
    _recompute_acts, _bwd_upper_kernel); gradients rely on them
    regenerating BIT-IDENTICAL activations/masks — any change to the
    chain or to this function must be applied to all four in lockstep.

    The dropout mask is reproducible from (seed, tile, layer) alone so
    any kernel regenerates any single layer's mask without replaying
    preceding layers. Drop when the draw lands in the TOP p-fraction:
    interpret mode (which yields zero bits) then degrades to
    keep-everything instead of drop-everything."""
    h = jnp.maximum(z, 0.0).astype(jnp.bfloat16)
    if training and l in spec.dropout_layers:
        # Mosaic caps prng_seed at 2 values — fold (tile, layer) into
        # one stream id (layer count < 256 always; tile counts < 2^23)
        pltpu.prng_seed(seed_ref[0], tile_id * 256 + l)
        bits = pltpu.bitcast(pltpu.prng_random_bits(h.shape), jnp.uint32)
        thresh = np.uint32(int((1.0 - spec.dropout_prob) * 2 ** 32))
        h = jnp.where(bits < thresh, h * jnp.bfloat16(_inv_keep(spec)),
                      jnp.bfloat16(0.0))
    return h


def _head_pred(spec: FusedMLPSpec, z_last):
    """Final-layer nonlinearity: optional pre-tanh (full width) then the
    always-on output tanh on column 0 (ref deep_sdf_decoder.py:94-109)."""
    if spec.use_tanh:
        z_last = jnp.tanh(z_last)
    return jnp.tanh(z_last[:, :1])


def _head_dz(spec: FusedMLPSpec, z_last, g):
    """dL/dz_{n-1} (full width, zero outside column 0) from dL/dpred."""
    if spec.use_tanh:
        w = jnp.tanh(z_last[:, :1])
        y = jnp.tanh(w)
        dz_col = g * (1.0 - y * y) * (1.0 - w * w)
    else:
        y = jnp.tanh(z_last[:, :1])
        dz_col = g * (1.0 - y * y)
    return jnp.concatenate(
        [dz_col, jnp.zeros((dz_col.shape[0], spec.width - 1), jnp.float32)], axis=1)


def _fwd_kernel(spec: FusedMLPSpec, training: bool, ckpt_layer: int | None,
                seed_ref, x_ref, A_ref, B_ref, bias_ref, out_ref, *maybe_ckpt):
    """Full forward chain; optionally writes the activation after layer
    ``ckpt_layer`` (= a_{hi-1}, the split-point checkpoint) to HBM."""
    tile_id = pl.program_id(0)
    x = x_ref[...]
    n = spec.n_linear
    x_hi, x_lo = _split_hilo(spec, x)
    h = None
    for l in range(n):
        z = bias_ref[l][None, :].astype(jnp.float32)
        if l > 0:
            z = z + jnp.dot(h, A_ref[l], preferred_element_type=jnp.float32)
        if spec.has_b[l]:
            z = z + _dot_x(x_hi, x_lo, B_ref[l])
        if l == n - 1:
            out_ref[...] = _head_pred(spec, z)
            return
        h = _layer_act(spec, training, z, l, seed_ref, tile_id)
        if ckpt_layer is not None and l == ckpt_layer:
            maybe_ckpt[0][...] = h


def _bwd_kernel(spec: FusedMLPSpec, training: bool,
                seed_ref, x_ref, A_ref, B_ref, bias_ref, g_ref,
                dx_ref, dz_ref, act_ref):
    """Per tile: recompute fwd (bit-identical dropout from the
    (seed, tile, layer) key), backprop the dz chain, and stream
    dz_l / activations to HBM in bf16. The dW/db contractions happen
    outside as large XLA GEMMs — this keeps VMEM to weights + one tile
    regardless of layer count.
    """
    tile_id = pl.program_id(0)
    x = x_ref[...]
    n = spec.n_linear
    inv_keep = _inv_keep(spec)
    x_hi, x_lo = _split_hilo(spec, x)

    # --- recompute fwd, activations stay in VMEM ---
    acts = []  # h after layer l (bf16), l = 0..n-2
    h = None
    z_last = None
    for l in range(n):
        z = bias_ref[l][None, :].astype(jnp.float32)
        if l > 0:
            z = z + jnp.dot(h, A_ref[l], preferred_element_type=jnp.float32)
        if spec.has_b[l]:
            z = z + _dot_x(x_hi, x_lo, B_ref[l])
        if l == n - 1:
            z_last = z
            break
        h = _layer_act(spec, training, z, l, seed_ref, tile_id)
        acts.append(h)
        act_ref[l] = h

    dz = _head_dz(spec, z_last, g_ref[...])

    dx = jnp.zeros((x.shape[0], spec.p_in), jnp.float32)
    # --- walk layers in reverse ---
    for l in range(n - 1, -1, -1):
        dz_b = dz.astype(jnp.bfloat16)
        dz_ref[l] = dz_b
        if spec.has_b[l]:
            dx = dx + jax.lax.dot_general(
                dz_b, B_ref[l], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        if l == 0:
            break
        da = jax.lax.dot_general(
            dz_b, A_ref[l], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        a_here = acts[l - 1].astype(jnp.float32)
        scale = inv_keep if (training and (l - 1) in spec.dropout_layers) else 1.0
        dz = jnp.where(a_here > 0, da * scale, 0.0)

    dx_ref[...] = dx


def _pad_points(x: jax.Array, spec: FusedMLPSpec, tile: int):
    N = x.shape[0]
    pad_rows = (-N) % tile
    pad_cols = spec.p_in - x.shape[1]
    return jnp.pad(x, ((0, pad_rows), (0, pad_cols))), N


def _fwd_tile(spec: FusedMLPSpec, training: bool) -> int:
    # dropout masks are generated per (tile, layer) from the tile id;
    # the training fwd must therefore tile identically to the bwd
    # recompute
    return spec.bwd_tile if (training and spec.dropout_layers) else spec.tile


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def fused_mlp(spec: FusedMLPSpec, training: bool, x, A, B, bias, seed):
    """pred (N, 1) = decoder MLP over points x (N, in_dim).

    ``seed``: int32 scalar array driving in-kernel dropout.
    """
    return _fused_fwd_impl(spec, training, x, A, B, bias, seed)


def _kernel_in_dtype(spec: FusedMLPSpec):
    return jnp.float32 if spec.input_hilo else jnp.bfloat16


def _use_split(spec: FusedMLPSpec) -> bool:
    return spec.bwd_impl == "split" and spec.n_linear >= 3


def _fused_fwd_impl(spec, training, x, A, B, bias, seed, want_ckpt=False):
    tile = _fwd_tile(spec, training)
    if want_ckpt:
        # ckpt blocks are re-read by the bwd at bwd_tile granularity;
        # keep the fwd padding a multiple of it
        tile = spec.bwd_tile if tile % spec.bwd_tile else tile
    xp, N = _pad_points(x.astype(_kernel_in_dtype(spec)), spec, tile)
    n_tiles = xp.shape[0] // tile
    ckpt_layer = _split_point(spec.n_linear) - 1 if want_ckpt else None
    out_specs = [pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((xp.shape[0], 1), jnp.float32)]
    if want_ckpt:
        out_specs.append(pl.BlockSpec((tile, spec.width), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((xp.shape[0], spec.width),
                                              jnp.bfloat16))
    res = pl.pallas_call(
        functools.partial(_fwd_kernel, spec, training, ckpt_layer),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tile, spec.p_in), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((spec.n_linear, spec.width, spec.width), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((spec.n_linear, spec.p_in, spec.width), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((spec.n_linear, spec.width), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
    )(seed.reshape(1), xp, A, B, bias)
    if want_ckpt:
        return res[0][:N], res[1]
    return res[0][:N]


def _fused_fwd_rule(spec, training, x, A, B, bias, seed):
    if _use_split(spec):
        pred, ckpt = _fused_fwd_impl(spec, training, x, A, B, bias, seed,
                                     want_ckpt=True)
        return pred, (x, A, B, bias, seed, ckpt)
    pred = _fused_fwd_impl(spec, training, x, A, B, bias, seed)
    return pred, (x, A, B, bias, seed, None)


def _fused_bwd_rule(spec, training, residuals, g):
    if _use_split(spec):
        return _fused_bwd_split(spec, training, residuals, g)
    return _fused_bwd_stream(spec, training, residuals, g)


def _fused_bwd_stream(spec, training, residuals, g):
    x, A, B, bias, seed, _ckpt = residuals
    # == spec.bwd_tile in both branches of the old conditional; masks
    # regenerate per (seed, tile, layer) so bwd MUST tile at bwd_tile
    tile = spec.bwd_tile
    xp, N = _pad_points(x.astype(_kernel_in_dtype(spec)), spec, tile)
    gp = jnp.pad(g.astype(jnp.float32), ((0, xp.shape[0] - N), (0, 0)))
    n_tiles = xp.shape[0] // tile
    n, D, P = spec.n_linear, spec.width, spec.p_in
    dx, dz, acts = pl.pallas_call(
        functools.partial(_bwd_kernel, spec, training),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tile, P), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, D, D), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, P, D), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile, P), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, tile, D), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((max(n - 1, 1), tile, D), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((xp.shape[0], P), jnp.float32),
            jax.ShapeDtypeStruct((n, xp.shape[0], D), jnp.bfloat16),
            jax.ShapeDtypeStruct((max(n - 1, 1), xp.shape[0], D), jnp.bfloat16),
        ],
    )(seed.reshape(1), xp, A, B, bias, gp)

    # dW/db contractions as large MXU GEMMs (XLA):
    #   dA[l] = acts[l-1]ᵀ @ dz[l]   (l ≥ 1)
    #   dB[l] = xᵀ @ dz[l]           (has_b layers)
    #   dbias[l] = Σ_rows dz[l]
    dA = jnp.concatenate([
        jnp.zeros((1, D, D), jnp.float32),
        jax.lax.dot_general(acts[:n - 1], dz[1:], (((1,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32),
    ], axis=0) if n > 1 else jnp.zeros((n, D, D), jnp.float32)
    dB_rows = []
    for l in range(n):
        if spec.has_b[l]:
            dB_rows.append(jax.lax.dot_general(
                xp, dz[l].astype(xp.dtype), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
        else:
            dB_rows.append(jnp.zeros((P, D), jnp.float32))
    dB = jnp.stack(dB_rows, axis=0)
    dbias = jnp.sum(dz.astype(jnp.float32), axis=1)

    dx_real = dx[:N, :x.shape[1]].astype(x.dtype)
    return dx_real, dA.astype(A.dtype), dB.astype(B.dtype), dbias, None


def _split_point(n: int) -> int:
    return max(2, n // 2 + 1)


def _recompute_acts(spec, training, n_acts, x_hi, x_lo, A_ref, B_at, bias_ref,
                    seed_ref, tile_id):
    """Fwd chain producing activations a_0..a_{n_acts-1} (dict keyed by
    layer). ``A_ref`` rows are absolute layer indices; ``B_at`` maps a
    has_b layer to its (P, width) block."""
    acts = {}
    h = None
    for l in range(n_acts):
        z = bias_ref[l][None, :].astype(jnp.float32)
        if l > 0:
            z = z + jnp.dot(h, A_ref[l], preferred_element_type=jnp.float32)
        if spec.has_b[l]:
            z = z + _dot_x(x_hi, x_lo, B_at(l))
        h = _layer_act(spec, training, z, l, seed_ref, tile_id)
        acts[l] = h
    return acts


def _accumulate_layer(spec, training, l, dz, x_hi, x_lo, acts, A_at, B_at,
                      dA_refs, dB_refs, db_refs, dx):
    """Shared per-layer bwd bookkeeping; d*_refs map layer → (ref, row),
    ``acts`` maps layer → its post-act h, ``A_at``/``B_at`` map a layer
    to its weight block. Returns (dz_{l-1}, dx)."""
    inv_keep = _inv_keep(spec)
    dz_b = dz.astype(jnp.bfloat16)
    if l > 0 and l in dA_refs:
        ref, row = dA_refs[l]
        ref[row] += jax.lax.dot_general(
            acts[l - 1], dz_b, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    if spec.has_b[l]:
        if l in dB_refs:
            ref, row = dB_refs[l]
            dB_tile = jax.lax.dot_general(
                x_hi, dz_b, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            if x_lo is not None:
                dB_tile += jax.lax.dot_general(
                    x_lo, dz_b, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            ref[row] += dB_tile
        dx = dx + jax.lax.dot_general(
            dz_b, B_at(l), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    if l in db_refs:
        ref, row = db_refs[l]
        ref[row] += jnp.sum(dz, axis=0)
    if l == 0:
        return None, dx
    da = jax.lax.dot_general(
        dz_b, A_at(l), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    a_here = acts[l - 1].astype(jnp.float32)
    scale = inv_keep if (training and (l - 1) in spec.dropout_layers) else 1.0
    return jnp.where(a_here > 0, da * scale, 0.0), dx


def _bwd_upper_kernel(spec, training, hi, b_layers_up,
                      seed_ref, ckpt_ref, A_ref, bias_ref, g_ref, x_ref, B_ref,
                      dzb_ref, dx_ref, dA_ref, dB_ref, db_ref):
    """Linears hi..n-1, resuming from the fwd's a_{hi-1} checkpoint:
    recompute only this range, backprop to dz_{hi-1} (written to HBM),
    accumulate the range's dA/dB/db in VMEM accumulators. ``A_ref`` /
    ``bias_ref`` hold rows hi..n-1 (row = l - hi); ``x_ref``/``B_ref``/
    ``dx_ref``/``dB_ref`` are None when no has_b layer is in range."""
    tile_id = pl.program_id(0)

    @pl.when(tile_id == 0)
    def _zero():
        dA_ref[...] = jnp.zeros(dA_ref.shape, dA_ref.dtype)
        db_ref[...] = jnp.zeros(db_ref.shape, db_ref.dtype)
        if dB_ref is not None:
            dB_ref[...] = jnp.zeros(dB_ref.shape, dB_ref.dtype)

    n = spec.n_linear
    A_at = lambda l: A_ref[l - hi]
    B_at = lambda l: B_ref[b_layers_up.index(l)]
    x_hi = x_lo = None
    if x_ref is not None:
        x_hi, x_lo = _split_hilo(spec, x_ref[...])

    # --- recompute linears hi..n-1 from the checkpoint ---
    acts = {hi - 1: ckpt_ref[...]}
    h = acts[hi - 1]
    z_last = None
    for l in range(hi, n):
        z = bias_ref[l - hi][None, :].astype(jnp.float32)
        z = z + jnp.dot(h, A_at(l), preferred_element_type=jnp.float32)
        if spec.has_b[l]:
            z = z + _dot_x(x_hi, x_lo, B_at(l))
        if l == n - 1:
            z_last = z
            break
        h = _layer_act(spec, training, z, l, seed_ref, tile_id)
        acts[l] = h

    dz = _head_dz(spec, z_last, g_ref[...])

    dA_refs = {l: (dA_ref, l - hi) for l in range(hi, n)}
    dB_refs = {l: (dB_ref, k) for k, l in enumerate(b_layers_up)}
    db_refs = {l: (db_ref, l - hi) for l in range(hi, n)}
    dx = jnp.zeros((ckpt_ref.shape[0], spec.p_in), jnp.float32)
    for l in range(n - 1, hi - 1, -1):
        dz, dx = _accumulate_layer(spec, training, l, dz, x_hi, x_lo, acts,
                                   A_at, B_at, dA_refs, dB_refs, db_refs, dx)
    dzb_ref[...] = dz.astype(jnp.bfloat16)   # dz_{hi-1}, already masked
    if dx_ref is not None:
        dx_ref[...] = dx


def _bwd_lower_kernel(spec, training, hi, b_layers_lo,
                      seed_ref, x_ref, A_ref, B_ref, bias_ref, dzb_ref,
                      dx_ref, dA_ref, dB_ref, db_ref):
    """Linears 0..hi-1: recompute acts a_0..a_{hi-2}, consume dz_{hi-1}.
    ``A_ref``/``bias_ref`` hold rows 0..hi-1 (row = l); ``B_ref`` holds
    only the has_b layers in range, in ``b_layers_lo`` order."""
    tile_id = pl.program_id(0)

    @pl.when(tile_id == 0)
    def _zero():
        dA_ref[...] = jnp.zeros(dA_ref.shape, dA_ref.dtype)
        dB_ref[...] = jnp.zeros(dB_ref.shape, dB_ref.dtype)
        db_ref[...] = jnp.zeros(db_ref.shape, db_ref.dtype)

    x = x_ref[...]
    x_hi, x_lo = _split_hilo(spec, x)
    A_at = lambda l: A_ref[l]
    B_at = lambda l: B_ref[b_layers_lo.index(l)]
    acts = _recompute_acts(spec, training, hi - 1, x_hi, x_lo, A_ref, B_at,
                           bias_ref, seed_ref, tile_id)

    dz = dzb_ref[...].astype(jnp.float32)
    dA_refs = {l: (dA_ref, l - 1) for l in range(1, hi)}
    dB_refs = {l: (dB_ref, k) for k, l in enumerate(b_layers_lo)}
    db_refs = {l: (db_ref, l) for l in range(hi)}
    dx = jnp.zeros((x.shape[0], spec.p_in), jnp.float32)
    for l in range(hi - 1, -1, -1):
        dz, dx = _accumulate_layer(spec, training, l, dz, x_hi, x_lo, acts,
                                   A_at, B_at, dA_refs, dB_refs, db_refs, dx)
    dx_ref[...] = dx


def _fused_bwd_split(spec, training, residuals, g):
    """Two-kernel backward: dW/db accumulate in VMEM across the grid —
    no dz/activation streaming, no XLA GEMM pass. The upper kernel
    resumes from the fwd's a_{hi-1} checkpoint; each kernel sees only
    its layer range's weights so the f32 accumulators fit VMEM."""
    x, A, B, bias, seed, ckpt = residuals
    n, D, P = spec.n_linear, spec.width, spec.p_in
    hi = _split_point(n)
    b_layers_up = tuple(l for l in range(hi, n) if spec.has_b[l])
    b_layers_lo = tuple(l for l in range(hi) if spec.has_b[l])

    tile = spec.bwd_tile
    xp, N = _pad_points(x.astype(_kernel_in_dtype(spec)), spec, tile)
    gp = jnp.pad(g.astype(jnp.float32), ((0, xp.shape[0] - N), (0, 0)))
    n_tiles = xp.shape[0] // tile

    seed_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    row_tile = lambda w: pl.BlockSpec((tile, w), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM)
    whole = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                       memory_space=pltpu.VMEM)

    # ---- upper: layers hi..n-1 from the checkpoint ----
    nb_up = len(b_layers_up)
    emit_dx_up = nb_up > 0
    up_ins = [seed_spec, row_tile(D), whole((n - hi, D, D)),
              whole((n - hi, D)), row_tile(1)]
    up_args = [seed.reshape(1), ckpt, A[hi:], bias[hi:], gp]
    if emit_dx_up:
        up_ins += [row_tile(P), whole((nb_up, P, D))]
        up_args += [xp, B[jnp.array(b_layers_up)]]
    up_outs = [row_tile(D), whole((n - hi, D, D)), whole((n - hi, D))]
    up_shapes = [
        jax.ShapeDtypeStruct((xp.shape[0], D), jnp.bfloat16),
        jax.ShapeDtypeStruct((n - hi, D, D), jnp.float32),
        jax.ShapeDtypeStruct((n - hi, D), jnp.float32),
    ]
    if emit_dx_up:
        up_outs[1:1] = [row_tile(P), whole((nb_up, P, D))]
        up_shapes[1:1] = [jax.ShapeDtypeStruct((xp.shape[0], P), jnp.float32),
                          jax.ShapeDtypeStruct((nb_up, P, D), jnp.float32)]

    def upper(seed_ref, ckpt_ref, A_ref, bias_ref, g_ref, *rest):
        if emit_dx_up:
            x_ref, B_ref, dzb_ref, dx_ref, dB_ref, dA_ref, db_ref = rest
        else:
            (dzb_ref, dA_ref, db_ref), x_ref, B_ref, dx_ref, dB_ref = \
                rest, None, None, None, None
        _bwd_upper_kernel(spec, training, hi, b_layers_up,
                          seed_ref, ckpt_ref, A_ref, bias_ref, g_ref,
                          x_ref, B_ref, dzb_ref, dx_ref, dA_ref, dB_ref, db_ref)

    up_results = pl.pallas_call(
        upper, grid=(n_tiles,), in_specs=up_ins,
        out_specs=up_outs, out_shape=up_shapes,
    )(*up_args)
    if emit_dx_up:
        dzb, dx_up, dB_up, dA_up, db_up = up_results
    else:
        dzb, dA_up, db_up = up_results
        dx_up, dB_up = None, None

    # ---- lower: layers 0..hi-1 ----
    nb_lo = len(b_layers_lo)      # ≥ 1: layer 0 always consumes x
    lo_results = pl.pallas_call(
        functools.partial(_bwd_lower_kernel, spec, training, hi, b_layers_lo),
        grid=(n_tiles,),
        in_specs=[seed_spec, row_tile(P), whole((hi, D, D)),
                  whole((nb_lo, P, D)), whole((hi, D)), row_tile(D)],
        out_specs=[row_tile(P), whole((hi - 1, D, D)),
                   whole((nb_lo, P, D)), whole((hi, D))],
        out_shape=[
            jax.ShapeDtypeStruct((xp.shape[0], P), jnp.float32),
            jax.ShapeDtypeStruct((hi - 1, D, D), jnp.float32),
            jax.ShapeDtypeStruct((nb_lo, P, D), jnp.float32),
            jax.ShapeDtypeStruct((hi, D), jnp.float32),
        ],
    )(seed.reshape(1), xp, A[:hi], B[jnp.array(b_layers_lo)], bias[:hi], dzb)
    dx_lo, dA_lo, dB_lo, db_lo = lo_results

    # ---- assemble full-layer gradients ----
    dA = jnp.concatenate([jnp.zeros((1, D, D), jnp.float32), dA_lo, dA_up], axis=0)
    dB = jnp.zeros((n, P, D), jnp.float32)
    for k, l in enumerate(b_layers_lo):
        dB = dB.at[l].set(dB_lo[k])
    for k, l in enumerate(b_layers_up):
        dB = dB.at[l].set(dB_up[k])
    dbias = jnp.concatenate([db_lo, db_up], axis=0)
    dx = dx_lo if dx_up is None else dx_lo + dx_up
    dx_real = dx[:N, :x.shape[1]].astype(x.dtype)
    return dx_real, dA.astype(A.dtype), dB.astype(B.dtype), dbias, None


fused_mlp.defvjp(_fused_fwd_rule, _fused_bwd_rule)


def fused_decoder_forward(config: DecoderConfig, params: Any, inputs: jax.Array,
                          *, training: bool = False, seed=0,
                          tile: int = 512) -> jax.Array:
    """Drop-in fused replacement for networks.decoder.decoder_forward
    on supported architectures. Differentiable w.r.t. params and inputs."""
    spec = FusedMLPSpec.plan(config, tile=tile)
    A, B, bias = pack_params(config, params, spec)
    seed_arr = jnp.asarray(seed, dtype=jnp.int32)
    return fused_mlp(spec, training, inputs, A, B, bias, seed_arr)


def supports_fused(config: DecoderConfig) -> bool:
    """Architecture is fused-kernel eligible AND inside the validated
    VMEM envelope. plan() checks shape constraints only; the envelope
    bound keeps wide configs (e.g. 1024-wide: 19 MB of A-weights plus
    f32 dW accumulators, over the ~16 MB scoped-VMEM budget) on the
    XLA path instead of dying in Mosaic allocation. The bound covers
    everything validated on hardware: all reference recipes plus the
    ShapeNet-chairs 512x8 p_in=384 spec (scripts/validate_chairs_scale.py)."""
    try:
        spec = FusedMLPSpec.plan(config)
    except ValueError:
        return False
    return spec.width <= 512 and spec.n_linear <= 10 and spec.p_in <= 512
