#!/usr/bin/env python3
"""Multi-chip scaling evidence on a one-chip box.

The north-star claim (>=90% DP efficiency at 2 hosts) cannot be
measured here — there is exactly one TPU chip behind the axon tunnel.
This script captures every proxy that CAN be measured, writing
SCALING_PROXY.json:

  --cpu-correctness  sharded-vs-single-device loss equivalence of the
                     production train step at n = 1,2,4,8 virtual CPU
                     devices (the numerical half of weak scaling:
                     sharding must not change the math).
  --tpu-overhead     flagship-scale train_step on the real chip, (a)
                     plain jit vs (b) the same step jitted over a
                     1-device Mesh with production shardings. The delta
                     is the cost the SPMD partitioner adds before any
                     collective traffic exists — the fixed overhead
                     term of the scaling curve.
  (always)           analytic DP all-reduce model: ring all-reduce of
                     the decoder grads (the only replicated state;
                     latents are row-sharded so their update is local)
                     at nominal v5e ICI bandwidth vs the measured step
                     time -> predicted efficiency at 2..32 chips.

Reference scaling surface being replaced: torch DataParallel +
DataLoader workers (deep_sdf/workspace + train_deep_sdf.py in
/root/reference); the model here is jax.sharding DP per SURVEY.md §2.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

OUT = os.path.join(os.path.dirname(__file__), "..", "SCALING_PROXY.json")

# nominal one-way ICI bandwidth per v5e chip (4 links x ~45 GB/s is the
# 2D-torus aggregate; a conservative single-link ring figure is used so
# the prediction is a floor, not a brag)
ICI_GBPS = 45.0


def _flagship_bits():
    import __graft_entry__ as g

    return g._flagship_config()


def _train_cfg(config, n_scenes, fused, mesh=None):
    from deepsdf_tpu.train.step import TrainConfig

    return TrainConfig(
        decoder=config,
        samples_per_scene=16384,
        scenes_per_batch=n_scenes,
        clamp_dist=0.1,
        code_bound=1.0,
        grad_clip=1.0,
        batch_split=4,
        fused=fused,
        mesh=mesh,
    )


def _synth_pools(num_scenes, pool, latent_size, seed=0):
    import jax.numpy as jnp

    from deepsdf_tpu.data.dataset import DevicePools

    rng = np.random.default_rng(seed)
    pts = rng.uniform(-1, 1, (num_scenes, pool, 3)).astype(np.float32)
    d = (np.linalg.norm(pts, axis=-1) - 0.5).astype(np.float32)
    rows = np.concatenate([pts, d[..., None]], axis=-1)
    return DevicePools(
        pos=jnp.asarray(np.abs(rows)),
        neg=jnp.asarray(-np.abs(rows)),
        pos_counts=jnp.full(num_scenes, pool, jnp.int32),
        neg_counts=jnp.full(num_scenes, pool, jnp.int32),
    )


def cpu_correctness() -> dict:
    """Same batch, same seeds: the sharded production step at n devices
    must produce the single-device loss and latent update (DP math is
    a pure reshape of the batch axis)."""
    os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from deepsdf_tpu.networks.decoder import DecoderConfig, init_decoder_params
    from deepsdf_tpu.parallel.mesh import (
        data_sharded, make_mesh, replicated, shard_train_state,
    )
    from deepsdf_tpu.train.step import init_train_state, train_step

    config = DecoderConfig(
        latent_size=32, dims=(64,) * 4, geom_dimension=3,
        dropout=(), dropout_prob=0.0, norm_layers=tuple(range(4)),
        latent_in=(2,), weight_norm=True, use_tanh=False,
    )
    num_scenes = 8
    pools_np = _synth_pools(num_scenes, 256, config.latent_size)
    params = init_decoder_params(jax.random.PRNGKey(0), config)
    latents = 0.01 * jax.random.normal(jax.random.PRNGKey(1),
                                       (num_scenes, config.latent_size))

    losses, tables = {}, {}
    for n in (1, 2, 4, 8):
        mesh = make_mesh(n)
        cfg = dataclasses.replace(
            _train_cfg(config, num_scenes, fused=False), samples_per_scene=64,
            batch_split=1)
        state = shard_train_state(mesh, init_train_state(
            jax.tree.map(jnp.copy, params), jnp.copy(latents)))
        pools = jax.device_put(pools_np, replicated(mesh))
        idx = jax.device_put(jnp.arange(num_scenes, dtype=jnp.int32),
                             data_sharded(mesh))
        st2, loss = train_step(state, pools, idx, jax.random.PRNGKey(9),
                               jnp.float32(5e-4), jnp.float32(1e-3),
                               jnp.float32(1.0), cfg)
        losses[n] = float(loss)
        tables[n] = np.asarray(st2.latents)

    ref = losses[1]
    drift = {n: abs(losses[n] - ref) for n in losses}
    lat_err = {n: float(np.max(np.abs(tables[n] - tables[1]))) for n in tables}
    ok = all(v <= 1e-6 * max(1.0, abs(ref)) for v in drift.values()) and \
        all(v <= 1e-6 for v in lat_err.values())
    return {
        "devices": sorted(losses),
        "loss": {str(n): losses[n] for n in sorted(losses)},
        "max_latent_delta_vs_1dev": {str(n): lat_err[n] for n in sorted(lat_err)},
        "equivalent": bool(ok),
    }


def tpu_overhead() -> dict:
    """Flagship-scale step: plain jit vs 1-device-mesh SPMD jit."""
    import jax

    if jax.devices()[0].platform not in ("tpu", "axon"):
        return {"skipped": "no TPU backend"}
    import jax.numpy as jnp

    from deepsdf_tpu.networks.decoder import init_decoder_params
    from deepsdf_tpu.parallel.mesh import (
        data_sharded, make_mesh, replicated, shard_train_state,
    )
    from deepsdf_tpu.train.step import init_train_state, train_step

    config = _flagship_bits()
    num_scenes = 64
    pools = _synth_pools(num_scenes, 4096, config.latent_size)
    params = init_decoder_params(jax.random.PRNGKey(0), config)
    latents = 0.01 * jax.random.normal(jax.random.PRNGKey(1),
                                       (num_scenes, config.latent_size))

    def timed(mesh):
        cfg = _train_cfg(config, num_scenes, fused=True, mesh=mesh)
        if mesh is not None:
            state = shard_train_state(mesh, init_train_state(
                jax.tree.map(jnp.copy, params), jnp.copy(latents)))
            p = jax.device_put(pools, replicated(mesh))
            idx = jax.device_put(jnp.arange(num_scenes, dtype=jnp.int32),
                                 data_sharded(mesh))
        else:
            state = init_train_state(jax.tree.map(jnp.copy, params),
                                     jnp.copy(latents))
            p = pools
            idx = jnp.arange(num_scenes, dtype=jnp.int32)
        args = lambda st, k: (st, p, idx, jax.random.PRNGKey(k),
                              jnp.float32(5e-4), jnp.float32(1e-3),
                              jnp.float32(1.0), cfg)
        st, loss = train_step(*args(state, 0))
        float(loss)  # warm compile + hard sync (CLAUDE.md: value read)
        n_steps = 20
        t0 = time.perf_counter()
        for k in range(1, n_steps + 1):
            st, loss = train_step(*args(st, k))
        float(loss)
        dt = (time.perf_counter() - t0) / n_steps
        return dt

    # fused on both sides for apples-to-apples: mesh=None runs the
    # kernel as a plain pallas_call, mesh(1) runs it under shard_map
    # inside the partitioned program
    plain = timed(None)
    sharded = timed(make_mesh(1))
    return {
        "step_plain_ms": plain * 1e3,
        "step_mesh1_ms": sharded * 1e3,
        "spmd_overhead_frac": (sharded - plain) / plain,
    }


def analytic_model(step_ms: float | None) -> dict:
    """Ring all-reduce of decoder grads vs measured step time."""
    from deepsdf_tpu.networks.decoder import init_decoder_params

    import jax

    config = _flagship_bits()
    params = init_decoder_params(jax.random.PRNGKey(0), config)
    n_params = sum(int(np.prod(np.shape(x))) for x in jax.tree.leaves(params))
    grad_bytes = n_params * 4  # fp32 grads all-reduced across DP replicas
    out = {"decoder_params": n_params, "grad_bytes": grad_bytes,
           "ici_gbps_nominal": ICI_GBPS}
    if step_ms:
        preds = {}
        for n in (2, 4, 8, 16, 32):
            ar_ms = 2 * (n - 1) / n * grad_bytes / (ICI_GBPS * 1e9) * 1e3
            preds[str(n)] = {
                "allreduce_ms": ar_ms,
                # overlap-free floor: collective fully serialized
                "efficiency_floor": step_ms / (step_ms + ar_ms),
            }
        out["predicted"] = preds
        out["measured_step_ms"] = step_ms
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu-correctness", action="store_true")
    ap.add_argument("--tpu-overhead", action="store_true")
    args = ap.parse_args()

    result = {}
    if os.path.exists(OUT):
        result = json.load(open(OUT))
    if args.cpu_correctness:
        result["cpu_correctness"] = cpu_correctness()
    if args.tpu_overhead:
        result["tpu_overhead"] = tpu_overhead()
    step_ms = result.get("tpu_overhead", {}).get("step_plain_ms")
    result["analytic_dp_model"] = analytic_model(step_ms)
    with open(OUT, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
