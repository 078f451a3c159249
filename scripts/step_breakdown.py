#!/usr/bin/env python3
"""Locate the non-kernel overhead in one fused training step on TPU.

Round-1 hardware numbers (CLAUDE.md): full train step ≈19.7 ms at the
flagship recipe (160k pts) of which fwd+bwd kernel ≈16.3 ms — leaving
~3.4 ms unattributed between on-device sampling, weight-norm
canonicalization/packing, the clamped-L1 epilogue, and the two-group
Adam update.

Measurement method: every per-call timing through the axon tunnel
carries a volatile ~25-30 ms network RTT, which buries millisecond
stages (a first attempt measured every stage at ≈28 ms). Instead each
stage is wrapped in a K-iteration ``lax.scan`` whose carry serializes
the iterations and whose per-iteration inputs vary (so XLA cannot
hoist loop-invariant work), timed at two K values; the SLOPE
(t_K2 − t_K1)/(K2 − K1) is the stage's true device time with the RTT
cancelled exactly.

Run on the real chip:  python scripts/step_breakdown.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def slope_time(make_scan, k1=2, k2=10, reps=5):
    """True per-iteration device time of a scanned stage.

    ``make_scan(K)`` returns a callable running K serialized iterations
    on device whose output read forces a sync. Returns the median slope
    over ``reps`` paired timings."""
    f1, f2 = make_scan(k1), make_scan(k2)
    float(jnp.asarray(f1()).ravel()[0])  # compile + warm
    float(jnp.asarray(f2()).ravel()[0])
    slopes = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jnp.asarray(f1()).ravel()[0])
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(jnp.asarray(f2()).ravel()[0])
        t2 = time.perf_counter() - t0
        slopes.append((t2 - t1) / (k2 - k1))
    return float(np.median(slopes))


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
    lr0, lr1 = jnp.float32(5e-4), jnp.float32(1e-3)
    n_pts = cfg.scenes_per_batch * cfg.samples_per_scene

    # 1. full production step — scan of train_step with state carried
    def make_full(K):
        @jax.jit
        def run(state, pl):
            def body(st, i):
                st2, loss = train_step(
                    st, pl, scene_idx, jax.random.key(i, impl="rbg"),
                    lr0, lr1, jnp.float32(101.0) + i, cfg)
                return st2, loss
            _, losses = jax.lax.scan(body, state, jnp.arange(K))
            return losses.sum()
        st0 = init_train_state(jax.tree.map(jnp.copy, params), jnp.copy(latents))
        return lambda: run(st0, pools)

    t_full = slope_time(make_full)

    # 2. on-device balanced sampling alone (key varies per iteration;
    # checksum carried so iterations serialize)
    def make_samp(K):
        @jax.jit
        def run(pl):
            def body(acc, i):
                out = sample_scenes_auto(pl, scene_idx,
                                         jax.random.key(i, impl="rbg"),
                                         cfg.samples_per_scene)
                s = sum(jnp.sum(o.astype(jnp.float32)) for o in
                        jax.tree_util.tree_leaves(out))
                return acc + s, ()
            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(K))
            return acc
        return lambda: run(pools)

    t_samp = slope_time(make_samp)

    # 3. fused kernel fwd and fwd+bwd alone (pre-packed weights; the
    # input is perturbed by the previous output so iterations serialize)
    spec = FusedMLPSpec.plan(config)
    A, B, bias = pack_params(config, params, spec)
    x0 = jnp.asarray(rng.uniform(-1, 1, (n_pts, 5)).astype(np.float32))

    def make_fwd(K):
        @jax.jit
        def run(x):
            def body(xc, i):
                out = fused_mlp(spec, True, xc, A, B, bias, i).reshape(-1)
                return xc + 1e-12 * out[:, None], out.sum()
            _, sums = jax.lax.scan(body, x, jnp.arange(K, dtype=jnp.int32))
            return sums.sum()
        return lambda: run(x0)

    t_fwd = slope_time(make_fwd)

    def loss_fn(A, B, bias, x, i):
        return jnp.abs(fused_mlp(spec, True, x, A, B, bias, i)).sum() / n_pts

    grad_fn = jax.grad(loss_fn, argnums=(0, 1, 2, 3))

    def make_fwdbwd(K):
        @jax.jit
        def run(x):
            def body(xc, i):
                gA, gB, gb, gx = grad_fn(A, B, bias, xc, i)
                # keep EVERY cotangent live: gA[0] is the structurally
                # zero unused slot — summing only it let XLA dead-code-
                # eliminate the entire loop body (measured slope ~0)
                live = (gA.astype(jnp.float32).sum()
                        + gB.astype(jnp.float32).sum() + gb.sum()
                        + gx.sum())
                return xc + 1e-6 * gx, live
            xf, outs = jax.lax.scan(body, x, jnp.arange(K, dtype=jnp.int32))
            return outs.sum() + xf[0, 0]
        return lambda: run(x0)

    t_fwdbwd = slope_time(make_fwdbwd)

    # 4. weight-norm canonicalization + packing (params perturbed per
    # iteration so the pack isn't hoisted out of the scan)
    def make_pack(K):
        @jax.jit
        def run(p):
            def body(pc, i):
                Ap, Bp, bp = pack_params(config, pc, spec)
                pc2 = jax.tree.map(lambda a: a * (1 + 1e-12), pc)
                out = (Ap[0, 0, 0].astype(jnp.float32)
                       + Bp[0, 0, 0].astype(jnp.float32) + bp[0, 0])
                return pc2, out
            _, outs = jax.lax.scan(body, p, jnp.arange(K))
            return outs.sum()
        return lambda: run(params)

    t_pack = slope_time(make_pack)

    # 5. two-group Adam update alone (grads vary per iteration)
    import optax
    adam = optax.scale_by_adam()
    opt_p = adam.init(params)
    opt_l = adam.init(latents)

    def make_adam(K):
        @jax.jit
        def run(p, l, op, ol):
            def body(carry, i):
                p, l, op, ol = carry
                gp = jax.tree.map(lambda a: jnp.full_like(a, 1e-9) * (i + 1), p)
                gl = jnp.full_like(l, 1e-9) * (i + 1)
                up, op2 = adam.update(gp, op, p)
                p2 = optax.apply_updates(p, jax.tree.map(lambda u: -lr0 * u, up))
                ul, ol2 = adam.update(gl, ol, l)
                l2 = l - lr1 * ul
                return (p2, l2, op2, ol2), l2[0, 0]
            _, outs = jax.lax.scan(body, (p, l, op, ol),
                                   jnp.arange(K, dtype=jnp.float32))
            return outs.sum()
        return lambda: run(params, latents, opt_p, opt_l)

    t_adam = slope_time(make_adam)

    other = t_full - t_samp - t_fwdbwd - t_pack - t_adam
    print(f"\nper-step timings at {n_pts} pts (scan-slope, RTT-free):")
    print(f"  full train_step        {t_full*1e3:8.2f} ms")
    print(f"  sampling alone         {t_samp*1e3:8.2f} ms")
    print(f"  kernel fwd (train)     {t_fwd*1e3:8.2f} ms")
    print(f"  kernel fwd+bwd         {t_fwdbwd*1e3:8.2f} ms")
    print(f"  weight-norm pack       {t_pack*1e3:8.2f} ms")
    print(f"  adam update            {t_adam*1e3:8.2f} ms")
    print(f"  loss epilogue + latent gather/scatter + grad clip (residual) "
          f"{other*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
