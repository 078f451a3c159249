"""Headline benchmark: auto-decoder training throughput (SDF samples/s).

Baseline (BASELINE.md): the reference's double_lattice_3D recipe —
400 shapes × 16000 samples/scene, 512×8 decoder, 10 scenes/batch —
runs 7.07 s/epoch on an A100 ⇒ ≈0.9M point-samples/s. This bench runs
the same training configuration (synthetic pools of the same shape) on
one TPU chip and reports steady-state samples/s, plus dense/sparse
grid-eval timings against the reference's mesh-extraction numbers
(316k pts ≈1.03 s incl. jacobians; grid default 256³,
ref deep_sdf/mesh.py:27, optimization_logs.log).

Prints a provisional JSON line as soon as the first timed window
completes (so a killed run still records a number), then ONE final
JSON line:
  {"metric": "train_samples_per_sec", "value": N, "unit": "samples/s",
   "vs_baseline": N / 905_233, "grid_dense_256_s": ..., ...}
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_SAMPLES_PER_SEC = 400 * 16000 / 7.07  # ≈905k, A100 (BASELINE.md)
BASELINE_GRID_316K_S = 1.03  # 316,030-pt eval on A100 (BASELINE.md; incl. jacobians)


def _bench_training() -> float:
    """Steady-state training samples/s on the double_lattice_3D recipe."""
    import jax
    import jax.numpy as jnp

    from deepsdf_tpu.data.dataset import DevicePools
    from deepsdf_tpu.networks.decoder import DecoderConfig, init_decoder_params
    from deepsdf_tpu.train.step import TrainConfig, init_train_state, train_step

    # double_lattice_3D configuration (ref: experiments/double_lattice_3D/specs.json)
    config = DecoderConfig(
        latent_size=2, dims=(512,) * 8, geom_dimension=3,
        dropout=tuple(range(8)), dropout_prob=0.2, norm_layers=tuple(range(8)),
        latent_in=(4,), weight_norm=True, use_tanh=False,
    )
    cfg = TrainConfig(
        decoder=config, samples_per_scene=16000, scenes_per_batch=10,
        clamp_dist=0.1, code_bound=1.0, batch_split=1,
        fused=True,  # Pallas fused point-MLP kernel (ops/fused_mlp.py)
    )

    num_scenes = 400
    pool = 25000  # per-sign pool rows per scene (1e5 uniform ⇒ ~25-75k split)
    rng = np.random.default_rng(0)

    def synth(sign):
        pts = rng.uniform(-1, 1, (num_scenes, pool, 3)).astype(np.float32)
        d = sign * np.abs(np.linalg.norm(pts, axis=-1) - 0.6).astype(np.float32)
        return np.concatenate([pts, d[..., None]], axis=-1)

    pools = DevicePools(
        pos=jnp.asarray(synth(+1)), neg=jnp.asarray(synth(-1)),
        pos_counts=jnp.full(num_scenes, pool, jnp.int32),
        neg_counts=jnp.full(num_scenes, pool, jnp.int32),
    )

    params = init_decoder_params(jax.random.PRNGKey(0), config)
    latents = 0.01 * jax.random.normal(jax.random.PRNGKey(1), (num_scenes, 2))
    state = init_train_state(params, latents)

    samples_per_step = cfg.scenes_per_batch * cfg.samples_per_scene
    lr0, lr1 = jnp.float32(5e-4), jnp.float32(1e-3)

    def step(state, i):
        scene_idx = jax.random.choice(
            jax.random.fold_in(jax.random.PRNGKey(7), i),
            num_scenes, (cfg.scenes_per_batch,), replace=False).astype(jnp.int32)
        # rbg PRNG: ~1.5x faster dropout-mask generation than threefry on TPU
        return train_step(state, pools, scene_idx, jax.random.key(i, impl="rbg"),
                          lr0, lr1, jnp.float32(1 + i / 40), cfg)

    # warmup/compile
    state, loss = step(state, 0)
    float(loss)

    # first short window → provisional number, printed immediately so a
    # killed/timed-out run still records a driver-parseable line
    n_first, n_total = 8, 40  # 40 steps = 1 reference epoch
    t0 = time.perf_counter()
    for i in range(1, n_first + 1):
        state, loss = step(state, i)
    float(loss)  # value read = hard sync through the device stream
    dt_first = time.perf_counter() - t0
    provisional = samples_per_step * n_first / dt_first
    print(json.dumps({
        "metric": "train_samples_per_sec",
        "value": round(provisional),
        "unit": "samples/s",
        "vs_baseline": round(provisional / BASELINE_SAMPLES_PER_SEC, 3),
        "provisional": True,
    }), flush=True)

    # three independent steady-state windows → median + spread, so
    # box-load/tunnel noise is attributable (round-4 verdict: an
    # 8.26M-vs-6.7M drift across rounds had no variance row to pin it)
    windows = []
    i0 = n_first + 1
    per_window = (n_total - n_first) // 3
    for w in range(3):
        t1 = time.perf_counter()
        for i in range(i0, i0 + per_window):
            state, loss = step(state, i)
        float(loss)
        windows.append(samples_per_step * per_window
                       / (time.perf_counter() - t1))
        i0 += per_window
    med = float(np.median(windows))
    spread = (max(windows) - min(windows)) / med
    return med, [round(w) for w in windows], round(100 * spread, 1)


def _bench_grid_eval() -> dict:
    """Dense + sparse grid-eval timings on the trained flagship decoder.

    Reference numbers: 316,030-pt differentiable eval 1.03–1.17 s and
    N=256³ default extraction grid (BASELINE.md). Uses the committed
    double_lattice_3D fixture so the sparse surface-band path sees a
    real far-field plateau; falls back to random init without it.
    """
    import jax
    import jax.numpy as jnp

    from deepsdf_tpu.mesh.grid_eval import (
        eval_sdf_grid, eval_sdf_grid_sparse, grid_coords,
    )

    fixture_err = None
    try:
        from deepsdf_tpu.workspace import load_latent_vectors, load_trained_model
        config, params = load_trained_model("experiments/double_lattice_3D", "latest")
        latent = jnp.asarray(load_latent_vectors("experiments/double_lattice_3D",
                                                 "latest")[0][0])
        trained = True
    except Exception as e:
        fixture_err = f"{type(e).__name__}: {e}"[:120]
        from deepsdf_tpu.networks.decoder import DecoderConfig, init_decoder_params
        config = DecoderConfig(
            latent_size=2, dims=(512,) * 8, geom_dimension=3,
            norm_layers=tuple(range(8)), latent_in=(4,), weight_norm=True)
        params = init_decoder_params(jax.random.PRNGKey(0), config)
        latent = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (2,))
        trained = False

    def timeit(fn, reps=3):
        fn()  # compile/warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            np.asarray(out)  # host read = hard sync
            best = min(best, time.perf_counter() - t0)
        return best

    out = {}
    # 316k-point FORWARD-ONLY eval (honest label: the reference's
    # 1.03 s comparator additionally includes dVerts/dControl
    # jacobians — that comparison lives in grid_316k_jac_s below)
    pts316k = jnp.asarray(
        np.random.default_rng(3).uniform(-1, 1, (316030, 3)).astype(np.float32))
    out["grid_316k_fwd_s"] = round(timeit(
        lambda: eval_sdf_grid(config, params, latent, pts316k, fused=True)), 4)

    # dense 256³ (the reference's default reconstruction grid).
    # grid_dense_256_s includes the 67 MB host readback, which through
    # the axon tunnel costs ~1 s of network transfer on top of compute
    # (a host-attached chip pays PCIe instead); _device_s reduces to a
    # checksum on device and reads one value, isolating the compute.
    coords = grid_coords(256)
    out["grid_dense_256_s"] = round(timeit(
        lambda: eval_sdf_grid(config, params, latent, coords, fused=True)), 3)
    out["grid_dense_256_pts_per_s"] = round(256 ** 3 / out["grid_dense_256_s"])
    # coords as a jit ARGUMENT, never a closure: captured big arrays
    # become HLO literals and hit the tunnel's remote-compile body limit
    coords_dev = jax.device_put(coords)
    sum_eval = jax.jit(
        lambda p, l, c: eval_sdf_grid(config, p, l, c, fused=True).sum())
    out["grid_dense_256_device_s"] = round(timeit(
        lambda: sum_eval(params, latent, coords_dev)), 3)

    # sparse two-level surface-band eval, same grid. Two views:
    # end-to-end (includes the ~27 MB fine-band host readback vs the
    # dense pass's 67 MB) and device-side (checksum sync, mirrors
    # grid_dense_256_device_s) — through this box's network tunnel the
    # readback dominates both paths, so the device view is the honest
    # algorithmic comparison.
    if trained:
        sparse, info = eval_sdf_grid_sparse(config, params, latent, 256,
                                            fused=True, return_info=True)
        if not info["fallback"]:
            out["grid_sparse_256_s"] = round(timeit(
                lambda: eval_sdf_grid_sparse(config, params, latent, 256,
                                             fused=True)), 3)
            out["grid_sparse_256_speedup"] = round(
                out["grid_dense_256_s"] / out["grid_sparse_256_s"], 2)
            out["grid_sparse_256_active_frac"] = round(info["active_frac"], 3)
            out["grid_sparse_256_device_s"] = round(timeit(
                lambda: eval_sdf_grid_sparse(config, params, latent, 256,
                                             fused=True, checksum_only=True)), 3)
            out["grid_sparse_256_device_speedup"] = round(
                out["grid_dense_256_device_s"]
                / out["grid_sparse_256_device_s"], 2)
    # sparse on a PLAIN shape (external trefoil-knot recon): lattice
    # tiles are surface-dense (active_frac floor ~0.41) so the lattice
    # rows never demonstrate the FLOP-reduction claim; the knot's
    # surface band covers ~9% of blocks (round-4 verdict item).
    # (snappy3D measured 0.375 — still tile-like; corner_spheres 0.325;
    # simple_geom 0.217; external_knots 0.094.)
    if trained:
        try:
            cfg_p, par_p = load_trained_model("experiments/external_knots",
                                              "latest")
            lat_p = jnp.asarray(load_latent_vectors(
                "experiments/external_knots", "latest")[0][0])
            _, info_p = eval_sdf_grid_sparse(cfg_p, par_p, lat_p, 256,
                                             fused=True, return_info=True)
            if not info_p["fallback"]:
                sum_dense_p = jax.jit(lambda p, l, c: eval_sdf_grid(
                    cfg_p, p, l, c, fused=True).sum())
                dense_dev = timeit(lambda: sum_dense_p(par_p, lat_p,
                                                       coords_dev))
                sparse_dev = timeit(
                    lambda: eval_sdf_grid_sparse(cfg_p, par_p, lat_p, 256,
                                                 fused=True,
                                                 checksum_only=True))
                out["grid_sparse_plain_256_active_frac"] = round(
                    info_p["active_frac"], 3)
                out["grid_sparse_plain_256_device_s"] = round(sparse_dev, 3)
                out["grid_sparse_plain_dense_device_s"] = round(dense_dev, 3)
                out["grid_sparse_plain_256_device_speedup"] = round(
                    dense_dev / sparse_dev, 2)
                # N=512: compute dominates the tunnel RTT floor, so the
                # surface-band FLOP reduction shows up in wall clock
                # (measured 3.6x on the trefoil fixture, round 5)
                coords512 = jax.device_put(jnp.asarray(grid_coords(512)))
                _, info5 = eval_sdf_grid_sparse(cfg_p, par_p, lat_p, 512,
                                                fused=True, return_info=True)
                d512 = timeit(lambda: sum_dense_p(par_p, lat_p, coords512))
                s512 = timeit(
                    lambda: eval_sdf_grid_sparse(cfg_p, par_p, lat_p, 512,
                                                 fused=True,
                                                 checksum_only=True))
                out["grid_sparse_plain_512_active_frac"] = round(
                    info5["active_frac"], 3)
                out["grid_sparse_plain_dense_512_device_s"] = round(d512, 3)
                out["grid_sparse_plain_512_device_s"] = round(s512, 3)
                out["grid_sparse_plain_512_device_speedup"] = round(
                    d512 / s512, 2)
        except Exception as e:
            out["grid_sparse_plain_error"] = f"{type(e).__name__}: {e}"[:120]

    if not trained:
        # never silently degrade: a missing trained fixture means the
        # sparse metrics are absent AND the dense numbers used a
        # random-init decoder — record that loudly
        out["fixture_missing"] = fixture_err or "unknown"
    return out


def _bench_microstructure_jac() -> dict:
    """Differentiable microstructure mesh extraction — the HONEST
    comparator to the reference's per-iteration number.

    The reference's optimization log times 'Computing Solution' mesh
    generation at 1.03–1.17 s on A100: a 316,030-pt (169×22×85) grid
    eval over the opti_double_lattice_8x4 config PLUS the full
    dVerts/dControl jacobians for 60 design variables (ref
    optimization_runs/opti_double_lattice_8x4/optimization_logs.log,
    mesh.py:380-450). This times our IFT-based equivalent end-to-end:
    grid eval + marching + one batched VJP, host work included."""
    import json as _json

    import numpy as np

    from deepsdf_tpu.mesh.diff_mesh import create_mesh_microstructure_diff
    from deepsdf_tpu.ops.bspline import latent_field_spline
    from deepsdf_tpu.workspace import load_trained_model

    mesh_cfg = _json.load(
        open("optimization_runs/opti_double_lattice_8x4/config.json"))["mesh"]
    config, params = load_trained_model(mesh_cfg["experiment_directory"],
                                        mesh_cfg["checkpoint"])
    spline = latent_field_spline(config.latent_size, mesh_cfg["degrees"],
                                 mesh_cfg["refinement"])
    spline.control_points = np.zeros_like(spline.control_points)
    tiling = mesh_cfg["tiling"]
    N = [mesh_cfg["N_base_reconstruction"] * t + 1 for t in tiling]

    def run():
        verts, faces, jac = create_mesh_microstructure_diff(
            tiling, config, params, spline, N=N,
            cap_border_dict=mesh_cfg["cap_border_dict"],
            compute_derivatives=True)
        return np.asarray(jac)

    run()  # compile/warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jac = run()
        best = min(best, time.perf_counter() - t0)
    n_dv = int(np.prod(jac.shape[2:]))
    return {
        "grid_316k_jac_s": round(best, 3),
        "grid_316k_jac_n_design_vars": n_dv,
        "grid_316k_jac_vs_baseline": round(BASELINE_GRID_316K_S / best, 2),
    }


def main() -> None:
    train_sps, windows, spread_pct = _bench_training()
    result = {
        "metric": "train_samples_per_sec",
        "value": round(train_sps),
        "unit": "samples/s",
        "vs_baseline": round(train_sps / BASELINE_SAMPLES_PER_SEC, 3),
        "train_sps_windows": windows,
        "train_sps_spread_pct": spread_pct,
    }
    try:
        result.update(_bench_grid_eval())
    except Exception as e:  # grid metrics are secondary — never lose the train number
        result["grid_eval_error"] = f"{type(e).__name__}: {e}"[:200]
    try:
        result.update(_bench_microstructure_jac())
    except Exception as e:
        result["grid_jac_error"] = f"{type(e).__name__}: {e}"[:200]
    print(json.dumps(result), flush=True)


def _wait_for_backend(attempts: int = 2, probe_timeout: int = 120,
                      retry_sleep: int = 60) -> None:
    """Block until the TPU backend initializes, bounded (≤~5 min total).

    The axon tunnel has outages where the first jax call hangs
    indefinitely (observed 2026-08-19, multi-hour). Probing in a
    subprocess keeps THIS process's jax uninitialized so a later
    import gets a clean attempt. Bounded tightly so a driver-run bench
    during an outage fails fast instead of eating the round's budget
    (round 1 ended rc=124 with no number because the probe rode out
    the outage for ~64 min)."""
    import subprocess
    import sys

    for attempt in range(attempts):
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=probe_timeout, capture_output=True,
            )
            ok = r.returncode == 0
        except subprocess.TimeoutExpired:
            ok = False
        if ok:
            return
        if attempt + 1 < attempts:
            print(f"# TPU backend probe {attempt + 1}/{attempts} failed; "
                  f"retrying in {retry_sleep}s", flush=True)
            time.sleep(retry_sleep)
    raise RuntimeError("TPU backend unavailable after all probe attempts")


if __name__ == "__main__":
    _wait_for_backend()
    main()
