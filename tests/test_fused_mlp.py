"""Fused Pallas MLP kernel vs the XLA decoder (interpret mode on CPU).

Real-device performance is exercised by bench.py; here we verify
numerics: forward parity (bf16 tolerance), gradient parity without
dropout, and gradient self-consistency (finite differences) WITH
in-kernel dropout — the fwd/bwd mask regeneration must be
bit-identical for FD to match.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from deepsdf_tpu.networks.decoder import DecoderConfig, decoder_forward, init_decoder_params
from deepsdf_tpu.ops.fused_mlp import (
    FusedMLPSpec, fused_decoder_forward, supports_fused,
)


@pytest.fixture(autouse=True)
def interpret_mode():
    with pltpu.force_tpu_interpret_mode():
        yield


def small_config(**kw):
    base = dict(latent_size=2, dims=(64,) * 4, geom_dimension=3,
                latent_in=(1,), weight_norm=True, norm_layers=tuple(range(8)),
                use_tanh=True)
    base.update(kw)
    return DecoderConfig(**base)


def test_spec_plan():
    config = small_config()
    spec = FusedMLPSpec.plan(config)
    assert spec.width == 128 and spec.p_in == 128
    assert spec.n_linear == 5
    assert spec.has_b == (True, True, False, False, False)
    assert supports_fused(config)
    assert not supports_fused(DecoderConfig(
        latent_size=2, dims=(64, 32), geom_dimension=3))  # non-uniform


def test_forward_matches_xla():
    config = small_config()
    params = init_decoder_params(jax.random.PRNGKey(0), config)
    x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (300, 5)).astype(np.float32))
    ref = np.asarray(decoder_forward(config, params, x))
    got = np.asarray(fused_decoder_forward(config, params, x, tile=128))
    # hi+lo input split leaves only weight-bf16 noise (~1e-4 on 512×8)
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=2e-3)
    # correlation must be essentially 1 (bf16 noise only)
    assert np.corrcoef(got.ravel(), ref.ravel())[0, 1] > 0.9999


@pytest.mark.slow
def test_gradients_match_xla_no_dropout():
    config = small_config()
    params = init_decoder_params(jax.random.PRNGKey(1), config)
    x = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, (128, 5)).astype(np.float32))

    def loss_ref(p, q):
        return jnp.sum(jnp.abs(decoder_forward(config, p, q)))

    def loss_fused(p, q):
        return jnp.sum(jnp.abs(fused_decoder_forward(config, p, q, tile=128)))

    gref_p, gref_x = jax.grad(loss_ref, argnums=(0, 1))(params, x)
    gfus_p, gfus_x = jax.grad(loss_fused, argnums=(0, 1))(params, x)

    # bf16 rounding can flip ReLU masks on near-zero pre-activations,
    # perturbing a handful of entries; require bulk agreement.
    a = np.asarray(gfus_x); b = np.asarray(gref_x)
    close = np.isclose(a, b, atol=5e-2, rtol=5e-2)
    assert close.mean() > 0.99
    assert np.corrcoef(a.ravel(), b.ravel())[0, 1] > 0.99
    for lname in ("lin0", "lin2", "lin4"):
        for key in gref_p[lname]:
            a = np.asarray(gfus_p[lname][key]).ravel()
            b = np.asarray(gref_p[lname][key]).ravel()
            denom = np.abs(b).max() + 1e-8
            frac_ok = (np.abs(a - b) / denom < 0.05).mean()
            assert frac_ok > 0.98, (lname, key, frac_ok)


@pytest.mark.slow
def test_dropout_deterministic_and_fd_consistent():
    config = small_config(dropout=(0, 1, 2, 3), dropout_prob=0.2)
    params = init_decoder_params(jax.random.PRNGKey(2), config)
    x = jnp.asarray(np.random.default_rng(2).uniform(-1, 1, (128, 5)).astype(np.float32))

    out1 = fused_decoder_forward(config, params, x, training=True, seed=7, tile=128)
    out2 = fused_decoder_forward(config, params, x, training=True, seed=7, tile=128)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    # NOTE: interpret mode yields zero PRNG bits (dropout becomes a
    # no-op), so seed-sensitivity is asserted only on real TPUs
    # (scripts/validate_fused_tpu.py); here we check determinism + FD.

    # FD check of a weight gradient THROUGH in-kernel dropout
    def loss(p):
        return jnp.sum(fused_decoder_forward(config, p, x, training=True,
                                             seed=7, tile=128) ** 2)

    g = jax.grad(loss)(params)
    v = np.asarray(params["lin2"]["v"])
    gv = np.asarray(g["lin2"]["v"])
    rng = np.random.default_rng(0)
    idx = (rng.integers(v.shape[0]), rng.integers(v.shape[1]))
    eps = 8e-2  # large step: bf16 forward quantization noise would drown a small one
    pp = jax.tree.map(lambda a: a, params)
    pm = jax.tree.map(lambda a: a, params)
    pp["lin2"] = dict(pp["lin2"]); pm["lin2"] = dict(pm["lin2"])
    pp["lin2"]["v"] = params["lin2"]["v"].at[idx].add(eps)
    pm["lin2"]["v"] = params["lin2"]["v"].at[idx].add(-eps)
    fd = (float(loss(pp)) - float(loss(pm))) / (2 * eps)
    scale = max(abs(fd), np.abs(gv).max() * 1e-2, 1e-3)
    assert abs(gv[idx] - fd) / scale < 0.25, (gv[idx], fd)


@pytest.mark.slow
def test_training_step_with_fused_decoder_converges():
    """Swap the fused kernel into a mini training loop and check loss falls."""
    import optax

    config = small_config(use_tanh=False)
    params = init_decoder_params(jax.random.PRNGKey(3), config)
    rng = np.random.default_rng(3)
    pts = rng.uniform(-1, 1, (2048, 3)).astype(np.float32)
    d = np.clip(np.linalg.norm(pts, axis=1) - 0.5, -0.1, 0.1).astype(np.float32)
    latent = jnp.zeros((2048, 2))
    x = jnp.concatenate([latent, jnp.asarray(pts)], axis=1)
    gt = jnp.asarray(d[:, None])

    adam = optax.adam(2e-3)
    opt_state = adam.init(params)

    def loss_fn(p, seed):
        pred = jnp.clip(fused_decoder_forward(config, p, x, training=True,
                                              seed=seed, tile=256), -0.1, 0.1)
        return jnp.mean(jnp.abs(pred - gt))

    losses = []
    for i in range(60):
        loss, grads = jax.value_and_grad(loss_fn)(params, i)
        updates, opt_state = adam.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        losses.append(float(loss))
    assert losses[-1] < 0.5 * losses[0], losses[::10]
