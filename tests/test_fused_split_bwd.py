"""Split-backward kernel vs stream-backward: gradient equivalence
(interpret mode)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from deepsdf_tpu.networks.decoder import DecoderConfig, init_decoder_params
from deepsdf_tpu.ops.fused_mlp import FusedMLPSpec, fused_mlp, pack_params

# slow tier: interpret-mode Pallas split-bwd kernels: minutes on a CPU host
pytestmark = pytest.mark.slow


@pytest.fixture(autouse=True)
def interpret_mode():
    with pltpu.force_tpu_interpret_mode():
        yield


def grads_with_impl(config, params, x, impl, training=False, seed=3):
    spec = dataclasses.replace(FusedMLPSpec.plan(config, tile=128, bwd_tile=128),
                               bwd_impl=impl)
    A, B, bias = pack_params(config, params, spec)

    def loss(A, B, bias, x):
        return jnp.sum(jnp.abs(fused_mlp(spec, training, x, A, B, bias,
                                         jnp.asarray(seed, jnp.int32))))

    val, grads = jax.value_and_grad(loss, argnums=(0, 1, 2, 3))(A, B, bias, x)
    return val, grads


@pytest.mark.parametrize("cfg_kw", [
    dict(latent_size=2, dims=(64,) * 4, geom_dimension=3, latent_in=(1,),
         weight_norm=True, norm_layers=tuple(range(8)), use_tanh=True),
    dict(latent_size=2, dims=(64,) * 8, geom_dimension=3, latent_in=(4,),
         weight_norm=True, norm_layers=tuple(range(8))),
    dict(latent_size=2, dims=(64,) * 5, geom_dimension=3, xyz_in_all=True),
])
def test_split_matches_stream(cfg_kw):
    config = DecoderConfig(**cfg_kw)
    params = init_decoder_params(jax.random.PRNGKey(0), config)
    x = jnp.asarray(np.random.default_rng(0).uniform(
        -1, 1, (260, config.latent_size + 3)).astype(np.float32))

    v1, g1 = grads_with_impl(config, params, x, "stream")
    v2, g2 = grads_with_impl(config, params, x, "split")
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
    # dbias/dB get looser bands: the stream path sums bf16-quantized dz
    # while split accumulates f32, and stream's dB GEMM sees exact-f32 x
    # while split's sees the hi+lo bf16 pair — each path is close to the
    # true gradient but they differ from EACH OTHER by one bf16 ULP on
    # O(1) entries
    for a, b, name, rtol, atol in [
            (g1[0], g2[0], "dA", 1e-3, 1e-4), (g1[1], g2[1], "dB", 1e-3, 2e-3),
            (g1[2], g2[2], "dbias", 5e-3, 2e-2), (g1[3], g2[3], "dx", 1e-3, 1e-4)]:
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=rtol, atol=atol, err_msg=name)


def test_split_matches_stream_training_mode():
    # interpret mode: dropout degrades to no-op but the code path runs
    config = DecoderConfig(latent_size=2, dims=(64,) * 4, geom_dimension=3,
                           latent_in=(1,), dropout=(0, 1, 2, 3), dropout_prob=0.2,
                           weight_norm=True, norm_layers=tuple(range(8)))
    params = init_decoder_params(jax.random.PRNGKey(1), config)
    x = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, (128, 5)).astype(np.float32))
    v1, g1 = grads_with_impl(config, params, x, "stream", training=True)
    v2, g2 = grads_with_impl(config, params, x, "split", training=True)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g1[0], np.float32),
                               np.asarray(g2[0], np.float32), rtol=1e-3, atol=1e-4)
