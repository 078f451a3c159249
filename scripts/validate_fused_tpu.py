#!/usr/bin/env python3
"""Real-TPU validation of the fused Pallas kernel (things interpret
mode cannot check): dropout seed sensitivity + drop-rate statistics,
fwd parity vs XLA on device, and grid-eval throughput vs the
reference's numbers (BASELINE.md: 18,081 pts forward in 0.033 s;
316,030 pts + 60-var jacobians in ~1.05 s on A100)."""

import time

import numpy as np

import jax
import jax.numpy as jnp

from deepsdf_tpu.mesh.grid_eval import eval_sdf_grid, grid_coords
from deepsdf_tpu.networks.decoder import DecoderConfig, decoder_forward, init_decoder_params
from deepsdf_tpu.ops.fused_mlp import fused_decoder_forward


def main():
    print("device:", jax.devices()[0])

    # --- dropout statistics on device ---
    config = DecoderConfig(latent_size=2, dims=(512,) * 8, geom_dimension=3,
                           dropout=tuple(range(8)), dropout_prob=0.2,
                           norm_layers=tuple(range(8)), latent_in=(4,),
                           weight_norm=True)
    params = init_decoder_params(jax.random.PRNGKey(0), config)
    x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (4096, 5)).astype(np.float32))
    o1 = np.asarray(fused_decoder_forward(config, params, x, training=True, seed=1))
    o1b = np.asarray(fused_decoder_forward(config, params, x, training=True, seed=1))
    o2 = np.asarray(fused_decoder_forward(config, params, x, training=True, seed=2))
    assert (o1 == o1b).all(), "same seed must reproduce bit-identically"
    assert np.abs(o1 - o2).max() > 1e-5, "different seeds must differ"
    print("dropout determinism/sensitivity: OK "
          f"(seed diff max {np.abs(o1 - o2).max():.4f})")

    oe = np.asarray(fused_decoder_forward(config, params, x, training=False))
    oref = np.asarray(decoder_forward(config, params, x))
    err = np.abs(oe - oref).max()
    print(f"eval-mode parity vs XLA: max abs err {err:.5f} (bf16 matmuls)")
    assert err < 0.05

    # --- grid eval timing (vs ref 18,081 fwd pts in 0.033 s / 316k ~1 s) ---
    config32 = DecoderConfig(latent_size=2, dims=(32,) * 4, geom_dimension=3)
    params32 = init_decoder_params(jax.random.PRNGKey(1), config32)
    latent = jnp.asarray([0.1, -0.2])
    for n_pts, label in ((18081, "18k fwd (ref 0.033s)"),
                        (316030, "316k fwd (ref ~1.05s incl jac)")):
        coords = jnp.asarray(
            np.random.default_rng(2).uniform(-1, 1, (n_pts, 3)).astype(np.float32))
        for fused in (False, True):
            out = eval_sdf_grid(config32, params32, latent, coords, fused=fused)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(5):
                out = eval_sdf_grid(config32, params32, latent, coords, fused=fused)
            float(out[0])
            dt = (time.perf_counter() - t0) / 5
            print(f"{label:28s} fused={fused}: {dt*1e3:7.2f} ms")

    # 256^3 flagship grid, fused
    coords = grid_coords(256)
    config512 = DecoderConfig(latent_size=2, dims=(512,) * 8, geom_dimension=3,
                              norm_layers=tuple(range(8)), latent_in=(4,),
                              weight_norm=True)
    params512 = init_decoder_params(jax.random.PRNGKey(3), config512)
    out = eval_sdf_grid(config512, params512, latent, coords, chunk=262144, fused=True)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = eval_sdf_grid(config512, params512, latent, coords, chunk=262144, fused=True)
    float(out[0])
    dt = time.perf_counter() - t0
    print(f"256^3 grid, 512x8 decoder, fused: {dt:.3f} s "
          f"({coords.shape[0]/dt/1e6:.1f}M pts/s)")


if __name__ == "__main__":
    main()
