"""Headline benchmark: auto-decoder training throughput (SDF samples/s).

Baseline (BASELINE.md): the reference's double_lattice_3D recipe —
400 shapes × 16000 samples/scene, 512×8 decoder, 10 scenes/batch —
runs 7.07 s/epoch on an A100 ⇒ ≈0.9M point-samples/s. This bench runs
the same training configuration (synthetic pools of the same shape) on
one TPU chip and reports steady-state samples/s.

Prints ONE JSON line:
  {"metric": "train_samples_per_sec", "value": N, "unit": "samples/s",
   "vs_baseline": N / 905_233}
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_SAMPLES_PER_SEC = 400 * 16000 / 7.07  # ≈905k, A100 (BASELINE.md)


def main() -> None:
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

    n_steps = 40  # = 1 reference epoch
    t0 = time.perf_counter()
    for i in range(1, n_steps + 1):
        state, loss = step(state, i)
    float(loss)  # value read = hard sync through the device stream
    dt = time.perf_counter() - t0

    samples_per_sec = samples_per_step * n_steps / dt
    print(json.dumps({
        "metric": "train_samples_per_sec",
        "value": round(samples_per_sec),
        "unit": "samples/s",
        "vs_baseline": round(samples_per_sec / BASELINE_SAMPLES_PER_SEC, 3),
    }))


def _wait_for_backend(attempts: int = 8, probe_timeout: int = 180,
                      retry_sleep: int = 300) -> None:
    """Block until the TPU backend initializes, bounded.

    The axon tunnel has outages where the first jax call hangs
    indefinitely (observed 2026-08-19, multi-hour). Probing in a
    subprocess keeps THIS process's jax uninitialized so a later
    import gets a clean attempt; without the probe, a driver-run
    bench during an outage would hang forever instead of riding out
    a transient blip."""
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
        print(f"# TPU backend probe {attempt + 1}/{attempts} failed; "
              f"retrying in {retry_sleep}s", flush=True)
        time.sleep(retry_sleep)
    raise RuntimeError("TPU backend unavailable after all probe attempts")


if __name__ == "__main__":
    _wait_for_backend()
    main()
