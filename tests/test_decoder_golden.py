"""Golden parity tests: JAX decoder vs the reference TorchScript trace.

The reference repo ships one trained artifact with weights —
``experiments/corner_spheres_only_small_network/cpp_model.pt``
(ref: create_libtorch_executable.py:4-33). We load it with CPU torch,
import its weights, and require allclose on values and input-gradients.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepsdf_tpu.networks.decoder import DecoderConfig, decoder_forward, decode_sdf
from deepsdf_tpu.networks.torch_import import load_reference_model
from deepsdf_tpu import ws

REF_EXP = "/root/reference/experiments/corner_spheres_only_small_network"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_EXP), reason="reference checkout not available"
)


@pytest.fixture(scope="module")
def golden():
    import torch

    specs = ws.load_experiment_specifications(REF_EXP)
    config = DecoderConfig.from_specs(specs)
    params, _ = load_reference_model(os.path.join(REF_EXP, "cpp_model.pt"), config)
    tmod = torch.jit.load(os.path.join(REF_EXP, "cpp_model.pt"), map_location="cpu")
    tmod.eval()
    return config, params, tmod


def test_config_shapes(golden):
    config, params, _ = golden
    # corner_spheres: latent 2, geom 3, dims 64x4, latent_in=[1] ⇒ lin0 out = 64-5 = 59
    assert config.all_dims == (5, 64, 64, 64, 64, 1)
    assert params["lin0"]["v"].shape == (5, 59)
    assert params["lin1"]["v"].shape == (64, 64)  # 59 + 5 concat = 64 in
    assert config.layer_in_dim(1) == 64


def test_forward_values_match(golden):
    import torch

    config, params, tmod = golden
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, size=(257, 5)).astype(np.float32)
    with torch.no_grad():
        ref = tmod(torch.from_numpy(x)).numpy()
    got = np.asarray(decoder_forward(config, params, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_input_gradients_match(golden):
    import torch

    config, params, tmod = golden
    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, size=(64, 5)).astype(np.float32)

    xt = torch.from_numpy(x).requires_grad_(True)
    tmod(xt).sum().backward()
    ref_grad = xt.grad.numpy()

    grad_fn = jax.grad(lambda q: decoder_forward(config, params, q).sum())
    got_grad = np.asarray(grad_fn(jnp.asarray(x)))
    np.testing.assert_allclose(got_grad, ref_grad, rtol=1e-4, atol=1e-5)


def test_decode_sdf_broadcast(golden):
    config, params, _ = golden
    latent = jnp.asarray([0.1, -0.2])
    queries = jnp.asarray(np.random.default_rng(2).uniform(-1, 1, (32, 3)).astype(np.float32))
    out = decode_sdf(config, params, latent, queries)
    assert out.shape == (32, 1)
    # must equal manual concatenation path
    inputs = jnp.concatenate([jnp.tile(latent[None, :], (32, 1)), queries], axis=1)
    out2 = decode_sdf(config, params, None, inputs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), rtol=1e-6)


def test_jit_compiles(golden):
    config, params, _ = golden
    fwd = jax.jit(lambda p, x: decoder_forward(config, p, x))
    x = jnp.zeros((16, 5))
    out = fwd(params, x)
    assert out.shape == (16, 1)
    assert bool(jnp.all(jnp.abs(out) <= 1.0))
