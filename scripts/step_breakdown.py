#!/usr/bin/env python3
"""Locate the non-kernel overhead in one fused training step on TPU.

Round-1 hardware numbers (CLAUDE.md): full train step ≈19.7 ms at the
flagship recipe (160k pts) of which fwd+bwd kernel ≈16.3 ms — leaving
~3.4 ms unattributed between on-device sampling, weight-norm
canonicalization/packing, the clamped-L1 epilogue, and the two-group
Adam update. This script times each stage in isolation with hard
value-read syncs (CLAUDE.md: block_until_ready under-reports through
the axon tunnel).

Run on the real chip:  python scripts/step_breakdown.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def timeit(fn, sync, reps=10):
    """Median wall time of fn(); sync(out) must force a host value read."""
    sync(fn())  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn())
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    from deepsdf_tpu.data.dataset import DevicePools, sample_scenes_auto
    from deepsdf_tpu.networks.decoder import DecoderConfig, init_decoder_params
    from deepsdf_tpu.ops.fused_mlp import FusedMLPSpec, fused_mlp, pack_params
    from deepsdf_tpu.train.step import TrainConfig, init_train_state, train_step

    print("device:", jax.devices()[0])

    # flagship double_lattice_3D recipe (experiments/double_lattice_3D/specs.json)
    config = DecoderConfig(
        latent_size=2, dims=(512,) * 8, geom_dimension=3,
        dropout=tuple(range(8)), dropout_prob=0.2, norm_layers=tuple(range(8)),
        latent_in=(4,), weight_norm=True, use_tanh=False,
    )
    cfg = TrainConfig(decoder=config, samples_per_scene=16000, scenes_per_batch=10,
                      clamp_dist=0.1, code_bound=1.0, batch_split=1, fused=True)

    num_scenes, pool = 400, 25000
    rng = np.random.default_rng(0)
    pts = rng.uniform(-1, 1, (num_scenes, pool, 3)).astype(np.float32)
    d = np.abs(np.linalg.norm(pts, axis=-1) - 0.6).astype(np.float32)
    rows = np.concatenate([pts, d[..., None]], axis=-1)
    pools = DevicePools(pos=jnp.asarray(rows), neg=jnp.asarray(-rows),
                        pos_counts=jnp.full(num_scenes, pool, jnp.int32),
                        neg_counts=jnp.full(num_scenes, pool, jnp.int32))

    params = init_decoder_params(jax.random.PRNGKey(0), config)
    latents = 0.01 * jax.random.normal(jax.random.PRNGKey(1), (num_scenes, 2))

    scene_idx = jnp.arange(10, dtype=jnp.int32)
    key = jax.random.key(3, impl="rbg")
    lr0, lr1 = jnp.float32(5e-4), jnp.float32(1e-3)
    n_pts = cfg.scenes_per_batch * cfg.samples_per_scene

    read = lambda out: float(jnp.asarray(out).ravel()[0])

    # 1. full production step (donates state → rebuild per rep)
    def full_step():
        st = init_train_state(params, latents)
        _, loss = train_step(st, pools, scene_idx, key, lr0, lr1,
                             jnp.float32(101.0), cfg)
        return loss
    # state rebuild happens on host each rep; time only the jitted call by
    # pre-building states. Each state gets its OWN buffer copies:
    # train_step donates arg 0, and donation of a buffer shared by all
    # pre-built states invalidates every one of them (the round-3 run
    # died here with TPU InvalidArgument on the first value read).
    states = [init_train_state(jax.tree.map(jnp.copy, params),
                               jnp.copy(latents)) for _ in range(11)]
    it = iter(states)
    t_full = timeit(lambda: train_step(next(it), pools, scene_idx, key, lr0,
                                       lr1, jnp.float32(101.0), cfg)[1], read)

    # 2. on-device balanced sampling alone (pools passed as arguments —
    # closure capture bakes the 320 MB pools into the HLO as literals,
    # which the tunnel's remote-compile endpoint rejects with HTTP 413)
    samp = jax.jit(lambda pl, k: sample_scenes_auto(pl, scene_idx, k,
                                                    cfg.samples_per_scene))
    t_samp = timeit(lambda: samp(pools, key), read)

    # 3. fused kernel fwd+bwd alone (pre-packed weights, fixed inputs)
    spec = FusedMLPSpec.plan(config)
    A, B, bias = pack_params(config, params, spec)
    x = jnp.asarray(rng.uniform(-1, 1, (n_pts, 5)).astype(np.float32))

    fwd = jax.jit(lambda x: fused_mlp(spec, True, x, A, B, bias, jnp.int32(7)))
    t_fwd = timeit(lambda: fwd(x), read)

    g = jax.jit(jax.grad(lambda A, B, bias, x: jnp.abs(
        fused_mlp(spec, True, x, A, B, bias, jnp.int32(7))).sum() / n_pts,
        argnums=(0, 1, 2, 3)))
    t_fwdbwd = timeit(lambda: g(A, B, bias, x)[3], read)

    # 4. weight-norm canonicalization + packing alone (runs inside every step)
    packf = jax.jit(lambda p: pack_params(config, p, spec))
    t_pack = timeit(lambda: packf(params)[0], read)

    # 5. two-group Adam update alone (same pytree shapes)
    import optax
    adam = optax.scale_by_adam()
    opt_p = adam.init(params)
    opt_l = adam.init(latents)

    @jax.jit
    def adam_only(p, l, op, ol):
        gp = jax.tree.map(jnp.ones_like, p)
        gl = jnp.ones_like(l)
        up, op2 = adam.update(gp, op, p)
        p2 = optax.apply_updates(p, jax.tree.map(lambda u: -lr0 * u, up))
        ul, ol2 = adam.update(gl, ol, l)
        return p2, l - lr1 * ul, op2, ol2
    t_adam = timeit(lambda: adam_only(params, latents, opt_p, opt_l)[1], read)

    print(f"\nper-step timings at {n_pts} pts (median of 10):")
    print(f"  full train_step        {t_full*1e3:8.2f} ms")
    print(f"  sampling alone         {t_samp*1e3:8.2f} ms")
    print(f"  kernel fwd (train)     {t_fwd*1e3:8.2f} ms")
    print(f"  kernel fwd+bwd         {t_fwdbwd*1e3:8.2f} ms")
    print(f"  weight-norm pack       {t_pack*1e3:8.2f} ms")
    print(f"  adam update            {t_adam*1e3:8.2f} ms")
    print(f"  unattributed           {(t_full-t_samp-t_fwdbwd-t_pack-t_adam)*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
