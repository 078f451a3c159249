#!/usr/bin/env python3
"""Real-TPU validation of the fused Pallas kernel (things interpret
mode cannot check): dropout seed sensitivity + drop-rate statistics,
fwd parity vs XLA on device, and grid-eval throughput vs the
reference's numbers (BASELINE.md: 18,081 pts forward in 0.033 s;
316,030 pts + 60-var jacobians in ~1.05 s on A100)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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

    # --- fwd/bwd dropout-mask consistency under REAL random bits ---
    # The bwd kernels regenerate masks from (seed, tile, layer); if that
    # reconstruction ever diverged from the fwd's masks, the gradient
    # would not be the derivative of the (seed-deterministic) loss.
    # Directional finite differences over the packed weights catch it.
    import dataclasses as _dc

    from deepsdf_tpu.ops.fused_mlp import FusedMLPSpec, fused_mlp, pack_params

    spec = FusedMLPSpec.plan(config)
    A, B, bias = pack_params(config, params, spec)
    xs = x[:600]  # odd size: exercises padding rows too
    seed = jnp.asarray(7, jnp.int32)

    def loss(A, B, bias):
        return jnp.sum(jnp.abs(fused_mlp(spec, True, xs, A, B, bias, seed)))

    for impl in ("split", "stream"):
        sp = _dc.replace(spec, bwd_impl=impl,
                         bwd_tile=256 if impl == "stream" else spec.bwd_tile)

        def loss_i(A, B, bias, sp=sp):
            return jnp.sum(jnp.abs(fused_mlp(sp, True, xs, A, B, bias, seed)))

        val, grads = jax.value_and_grad(loss_i, argnums=(0, 1, 2))(A, B, bias)
        rng_fd = np.random.default_rng(3)
        for name, arr, grad in (("A", A, grads[0]), ("bias", bias, grads[2])):
            V = jnp.asarray(rng_fd.normal(0, 1, arr.shape).astype(np.float32))
            eps = 3e-3
            if arr.dtype == jnp.bfloat16:
                # step in f32 then round: FD direction must survive bf16
                Vq = ((arr.astype(jnp.float32) + eps * V).astype(arr.dtype)
                      .astype(jnp.float32) - arr.astype(jnp.float32)) / eps
                ap = (arr.astype(jnp.float32) + eps * V).astype(arr.dtype)
                am = (arr.astype(jnp.float32) - eps * V).astype(arr.dtype)
                V = Vq
            else:
                ap, am = arr + eps * V, arr - eps * V
            args_p = {"A": (ap, B, bias), "bias": (A, B, ap)}[name]
            args_m = {"A": (am, B, bias), "bias": (A, B, am)}[name]
            fd = (float(loss_i(*args_p)) - float(loss_i(*args_m))) / (2 * eps)
            an = float(jnp.vdot(grad.astype(jnp.float32), V.astype(jnp.float32)))
            rel = abs(fd - an) / (abs(fd) + 1e-6)
            print(f"dropout-grad FD [{impl}] d{name}: fd={fd:.4f} grad={an:.4f} "
                  f"rel={rel:.3f}")
            assert rel < 0.08, f"{impl} d{name} FD mismatch: {fd} vs {an}"

    # --- fused kernel under SPMD: production train_step on a sharded
    # Mesh on the REAL chip (1 device here; the partitioner still wraps
    # the Pallas call in SPMD machinery, which interpret mode cannot
    # exercise — xla spmd RET_CHECK on io_callback, see __graft_entry__) ---
    from deepsdf_tpu.data.dataset import DevicePools
    from deepsdf_tpu.parallel.mesh import (
        data_sharded, make_mesh, replicated, shard_train_state,
    )
    from deepsdf_tpu.train.step import TrainConfig, init_train_state, train_step

    mesh = make_mesh(len(jax.devices()))
    cfg = TrainConfig(decoder=config, samples_per_scene=512, scenes_per_batch=2,
                      clamp_dist=0.1, code_bound=1.0, batch_split=1, fused=True)
    rngp = np.random.default_rng(5)
    pts = rngp.uniform(-1, 1, (4, 1024, 3)).astype(np.float32)
    d = np.abs(np.linalg.norm(pts, axis=-1) - 0.6).astype(np.float32)
    rows = np.concatenate([pts, d[..., None]], axis=-1)
    pools = jax.device_put(
        DevicePools(pos=jnp.asarray(rows), neg=jnp.asarray(-rows),
                    pos_counts=jnp.full(4, 1024, jnp.int32),
                    neg_counts=jnp.full(4, 1024, jnp.int32)),
        replicated(mesh))
    st = shard_train_state(mesh, init_train_state(
        params, 0.01 * jax.random.normal(jax.random.PRNGKey(4), (4, 2))))
    idx = jax.device_put(jnp.arange(2, dtype=jnp.int32), data_sharded(mesh))
    st2, loss = train_step(st, pools, idx, jax.random.PRNGKey(9),
                           jnp.float32(5e-4), jnp.float32(1e-3),
                           jnp.float32(1.0), cfg)
    assert np.isfinite(float(loss)), f"sharded fused step loss: {loss}"
    print(f"fused train_step under sharded Mesh({len(jax.devices())} dev): "
          f"loss {float(loss):.4f} OK")

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
