"""Default-tier fused-kernel smoke test (interpret mode, tiny width).

The full fused suites (test_fused_mlp / test_fused_split_bwd) are
@slow — minutes of interpret-mode time — so without this file a
`pytest tests/ -q` run would never execute the Pallas bwd math and a
kernel regression would only surface with --runslow or on hardware.
This is ONE tiny case (3-hidden-layer 32-wide net, 64 points, 64-pt
tiles) through the DEFAULT split-bwd path, checked against the XLA
decoder gradients: ~10 s, enough to fail on any fwd/bwd math break in
ops/fused_mlp.py.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from deepsdf_tpu.networks.decoder import (
    DecoderConfig, decoder_forward, init_decoder_params,
)
from deepsdf_tpu.ops.fused_mlp import FusedMLPSpec, fused_decoder_forward


@pytest.fixture(autouse=True)
def interpret_mode():
    with pltpu.force_tpu_interpret_mode():
        yield


def test_split_bwd_smoke_matches_xla():
    config = DecoderConfig(latent_size=2, dims=(32,) * 3, geom_dimension=3,
                           latent_in=(1,), weight_norm=True,
                           norm_layers=tuple(range(8)), use_tanh=True)
    # confirm the tiny plan really takes the default split-bwd kernels
    assert FusedMLPSpec.plan(config, tile=64, bwd_tile=64).bwd_impl == "split"
    params = init_decoder_params(jax.random.PRNGKey(0), config)
    x = jnp.asarray(np.random.default_rng(0).uniform(
        -1, 1, (64, config.latent_size + 3)).astype(np.float32))

    def loss_fused(p, q):
        return jnp.sum(jnp.abs(fused_decoder_forward(config, p, q, tile=64)))

    def loss_ref(p, q):
        return jnp.sum(jnp.abs(decoder_forward(config, p, q)))

    vf, (gfus_p, gfus_x) = jax.value_and_grad(
        loss_fused, argnums=(0, 1))(params, x)
    vr, (gref_p, gref_x) = jax.value_and_grad(
        loss_ref, argnums=(0, 1))(params, x)

    np.testing.assert_allclose(float(vf), float(vr), rtol=2e-3)

    # bf16 weight quantization + ReLU-mask flips on near-zero
    # pre-activations perturb a handful of entries; require bulk
    # agreement (same bands as the slow suite).
    a, b = np.asarray(gfus_x), np.asarray(gref_x)
    assert np.isclose(a, b, atol=5e-2, rtol=5e-2).mean() > 0.99
    assert np.corrcoef(a.ravel(), b.ravel())[0, 1] > 0.99
    for lname in gref_p:
        for key in gref_p[lname]:
            a = np.asarray(gfus_p[lname][key]).ravel()
            b = np.asarray(gref_p[lname][key]).ravel()
            denom = np.abs(b).max() + 1e-8
            frac_ok = (np.abs(a - b) / denom < 0.05).mean()
            # tensors here are tiny (27-128 entries), so one flipped
            # ReLU mask moves the fraction a lot — 0.95 still fails on
            # any systematic math break
            assert frac_ok > 0.95, (lname, key, frac_ok)
