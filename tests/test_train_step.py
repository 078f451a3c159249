"""Numerical parity of the jitted train step vs a torch replica.

Builds the identical tiny auto-decoder problem in torch (mirroring
ref train_deep_sdf.py:481-545 semantics: clamp both sides, L1-sum /
total count, code-reg warmup, two-group Adam, decoder-only grad clip,
max_norm embedding) and requires allclose on params/latents after
several steps on identical data.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepsdf_tpu.data.dataset import DevicePools
from deepsdf_tpu.networks.decoder import DecoderConfig, init_decoder_params
from deepsdf_tpu.train.step import (
    TrainConfig, apply_max_norm, init_train_state, train_step,
)

torch = pytest.importorskip("torch")


def small_config(**kw):
    return DecoderConfig(latent_size=2, dims=(16, 16), geom_dimension=3, **kw)


def make_torch_model(config, params):
    """Plain-linear torch decoder mirroring our pytree (no weight norm)."""
    import torch.nn as nn

    layers = {}
    mods = nn.ModuleDict()
    for layer in range(config.num_layers - 1):
        lp = params[f"lin{layer}"]
        lin = nn.Linear(*lp["w"].shape)
        with torch.no_grad():
            lin.weight.copy_(torch.from_numpy(np.asarray(lp["w"]).T))
            lin.bias.copy_(torch.from_numpy(np.asarray(lp["b"])))
        mods[f"lin{layer}"] = lin
    return mods


def torch_forward(config, mods, x):
    inputs = x
    h = x
    for layer in range(config.num_layers - 1):
        if layer in config.latent_in:
            h = torch.cat([h, inputs], dim=1)
        h = mods[f"lin{layer}"](h)
        if layer < config.num_layers - 2:
            h = torch.relu(h)
    return torch.tanh(h)


def test_step_matches_torch_reference():
    config = small_config()
    cfg = TrainConfig(
        decoder=config, samples_per_scene=8, scenes_per_batch=4,
        clamp_dist=0.1, do_code_regularization=True, code_reg_lambda=1e-4,
        code_bound=1.0, grad_clip=None, batch_split=1,
    )
    key = jax.random.PRNGKey(0)
    params = init_decoder_params(key, config)

    num_scenes = 6
    rng = np.random.default_rng(0)
    latents0 = rng.normal(0, 0.5, (num_scenes, 2)).astype(np.float32)

    # identical fixed "pools" with exactly 4 pos / 4 neg per scene so the
    # balanced sampler deterministically yields all 8 rows per scene
    pos = rng.uniform(-1, 1, (num_scenes, 4, 4)).astype(np.float32)
    pos[..., 3] = np.abs(pos[..., 3])
    neg = rng.uniform(-1, 1, (num_scenes, 4, 4)).astype(np.float32)
    neg[..., 3] = -np.abs(neg[..., 3])

    # --- torch replica ---
    mods = make_torch_model(config, params)
    t_lat = torch.nn.Embedding(num_scenes, 2, max_norm=1.0)
    with torch.no_grad():
        t_lat.weight.copy_(torch.from_numpy(latents0))
    opt = torch.optim.Adam([
        {"params": mods.parameters(), "lr": 1e-3},
        {"params": t_lat.parameters(), "lr": 2e-3},
    ])

    # --- jax state ---
    # pools with pos_counts=neg_counts=4, subsample 8 → pos_len=neg_len=4,
    # sampled with replacement; to make draws identical across frameworks we
    # bypass randomness by checking gradient math on the SAME gathered rows:
    # use counts of exactly 4 and subsample 8 → every draw is from a 4-row
    # pool with replacement. Instead we construct the batch manually below.
    state = init_train_state(params, jnp.asarray(latents0))

    epoch = 5.0
    scene_idx = np.array([0, 2, 3, 5], dtype=np.int32)

    for it in range(3):
        # deterministic batch: scene s contributes its 4 pos + 4 neg rows
        batch = np.concatenate([pos[scene_idx], neg[scene_idx]], axis=1)  # (4, 8, 4)
        flat = batch.reshape(-1, 4)
        xyz = flat[:, :3]
        gt = np.clip(flat[:, 3:4], -0.1, 0.1)
        pt_idx = np.repeat(scene_idx, 8)
        n_total = flat.shape[0]

        # torch step
        opt.zero_grad()
        vecs = t_lat(torch.from_numpy(pt_idx).long())
        inp = torch.cat([vecs, torch.from_numpy(xyz)], dim=1)
        pred = torch.clamp(torch_forward(config, mods, inp), -0.1, 0.1)
        loss = torch.nn.L1Loss(reduction="sum")(pred, torch.from_numpy(gt)) / n_total
        reg = 1e-4 * min(1, epoch / 100) * torch.sum(torch.norm(vecs, dim=1)) / n_total
        (loss + reg).backward()
        opt.step()

        # jax equivalent using internals of train_step (same math path)
        from deepsdf_tpu.train.step import _loss_on_chunk, _adam
        lat_renormed = apply_max_norm(state.latents, jnp.asarray(scene_idx), 1.0)
        lossj, (gp, gl) = jax.value_and_grad(_loss_on_chunk, argnums=(0, 1))(
            state.params, lat_renormed, cfg, jnp.asarray(xyz), jnp.asarray(gt),
            jnp.asarray(pt_idx), n_total, min(1.0, epoch / 100), jax.random.PRNGKey(1),
        )
        np.testing.assert_allclose(float(lossj), float(loss + reg), rtol=1e-5)
        upd_p, new_opt_p = _adam.update(gp, state.opt_params, state.params)
        new_params = jax.tree.map(lambda p, u: p - 1e-3 * u, state.params, upd_p)
        upd_l, new_opt_l = _adam.update(gl, state.opt_latents, lat_renormed)
        new_latents = lat_renormed - 2e-3 * upd_l
        from deepsdf_tpu.train.step import TrainState
        state = TrainState(new_params, new_latents, new_opt_p, new_opt_l)

    # compare final decoder weights + latents
    for layer in range(config.num_layers - 1):
        ref_w = mods[f"lin{layer}"].weight.detach().numpy().T
        got_w = np.asarray(state.params[f"lin{layer}"]["w"])
        np.testing.assert_allclose(got_w, ref_w, rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(state.latents), t_lat.weight.detach().numpy(), rtol=2e-4, atol=1e-6)


def test_max_norm_renorm():
    lat = jnp.asarray([[3.0, 4.0], [0.1, 0.1], [6.0, 8.0]])
    out = apply_max_norm(lat, jnp.asarray([0, 1]), 1.0)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out[0])), 1.0, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out[1]), [0.1, 0.1])  # under bound: untouched
    np.testing.assert_allclose(np.asarray(out[2]), [6.0, 8.0])  # not in batch: untouched


def test_train_step_runs_and_decreases_loss():
    config = small_config()
    # clamp band must exceed the last-layer bias init bound (1/sqrt(16)
    # = 0.25 for this tiny net), else the clamp can zero all gradients at
    # init — the same death mode the reference's torch.clamp has; real
    # 512-wide configs start inside the band (bias bound 0.044 < 0.1)
    cfg = TrainConfig(
        decoder=config, samples_per_scene=64, scenes_per_batch=4,
        clamp_dist=0.3, code_bound=1.0, grad_clip=1.0, batch_split=2,
    )
    rng = np.random.default_rng(1)
    num_scenes = 4
    sphere = lambda p, r: np.linalg.norm(p, axis=-1) - r

    def mk(r, sign):
        pts = rng.uniform(-1, 1, (512, 3)).astype(np.float32)
        d = sphere(pts, r).astype(np.float32)
        rows = np.concatenate([pts, d[:, None]], axis=1)
        return rows[d >= 0] if sign > 0 else rows[d < 0]

    pos = [mk(0.3 + 0.1 * i, +1) for i in range(num_scenes)]
    neg = [mk(0.3 + 0.1 * i, -1) for i in range(num_scenes)]
    n = min(min(len(p) for p in pos), min(len(m) for m in neg), 64)
    pools = DevicePools(
        pos=jnp.asarray(np.stack([p[:n] for p in pos])),
        neg=jnp.asarray(np.stack([m[:n] for m in neg])),
        pos_counts=jnp.full(num_scenes, n, jnp.int32),
        neg_counts=jnp.full(num_scenes, n, jnp.int32),
    )
    params = init_decoder_params(jax.random.PRNGKey(0), config)
    latents = 0.01 * jax.random.normal(jax.random.PRNGKey(1), (num_scenes, 2))
    state = init_train_state(params, latents)

    losses = []
    scene_idx = jnp.arange(num_scenes, dtype=jnp.int32)
    for i in range(150):
        state, loss = train_step(
            state, pools, scene_idx, jax.random.PRNGKey(i),
            jnp.float32(2e-3), jnp.float32(4e-3), jnp.float32(i + 1), cfg)
        losses.append(float(loss))
    assert np.mean(losses[-10:]) < 0.6 * np.mean(losses[:10]), losses[::30]


@pytest.mark.parametrize("width", [32, 64, 512])
def test_init_predictions_inside_clamp_band(width):
    """Regression: the final layer's bias is zero-initialized so initial
    predictions sit inside the +-0.1 clamp band for EVERY width and seed.
    With the torch bias bound 1/sqrt(fan_in) (0.177 at width 32), an
    unlucky draw puts all predictions past the clamp where the L1
    gradient is identically zero and training never starts (the
    reference's torch.clamp shares the dead zone; its committed runs won
    the seed lottery)."""
    config = DecoderConfig(
        latent_size=2, dims=(width,) * 4, geom_dimension=3,
        norm_layers=(0, 1, 2, 3), weight_norm=True, latent_in=(2,),
    )
    from deepsdf_tpu.networks.decoder import decoder_forward

    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.uniform(-1, 1, (512, 3)).astype(np.float32))
    lat = jnp.asarray(rng.normal(0, 0.01, (512, 2)).astype(np.float32))
    inputs = jnp.concatenate([lat, xyz], axis=1)
    for seed in range(5):
        params = init_decoder_params(jax.random.PRNGKey(seed), config)
        pred = np.asarray(decoder_forward(config, params, inputs))
        assert np.mean(np.abs(pred) < 0.1) > 0.5, (
            f"width={width} seed={seed}: init predictions escape the clamp "
            f"band (mean |pred|={np.abs(pred).mean():.3f})")
