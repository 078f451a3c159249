"""Test-time latent-code inference ("reconstruction").

Restores the upstream ``reconstruct.py`` capability the fork deleted
(SURVEY.md §0 — the `01_model_evaluation.ipynb` notebook consumes
``Reconstructions/<ckpt>/Codes/...`` it produced; README.md:139
documents the flow): optimize a fresh latent code against a frozen
decoder with the clamped-L1 + σ²-regularized objective.

TPU-first: the per-iteration loop is ``lax.fori_loop`` inside ONE
jitted program, and reconstruction is vmapped over shapes — the whole
test split runs as a single batched device program instead of the
upstream per-shape Python loop.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ..networks.decoder import DecoderConfig, decoder_forward


@dataclasses.dataclass(frozen=True)
class ReconstructConfig:
    """Defaults mirror upstream reconstruct.py's reconstruct()."""

    num_iterations: int = 800
    lr: float = 5e-3
    l2reg: bool = True
    reg_sigma: float = 1e-2        # code init stddev AND the 1/sigma^2 reg weight
    clamp_dist: float = 0.1
    decreased_by: float = 10.0     # lr staircase decay factor
    adjust_lr_every: int = 400     # iterations between decays (num_iterations//2)


_adam = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)


@partial(jax.jit, static_argnames=("config", "rcfg"))
def reconstruct_latent(config: DecoderConfig, params, sdf_data: jax.Array,
                       key: jax.Array, rcfg: ReconstructConfig = ReconstructConfig()):
    """Optimize one latent for one shape's (N, geom+1) SDF samples.

    Returns (latent (L,), final_loss).
    """
    geom = config.geom_dimension
    xyz = sdf_data[:, :geom]
    gt = jnp.clip(sdf_data[:, geom:geom + 1], -rcfg.clamp_dist, rcfg.clamp_dist)
    n = xyz.shape[0]

    latent0 = rcfg.reg_sigma * jax.random.normal(key, (config.latent_size,))

    def loss_fn(latent):
        inputs = jnp.concatenate(
            [jnp.broadcast_to(latent[None, :], (n, config.latent_size)), xyz], axis=1)
        pred = jnp.clip(decoder_forward(config, params, inputs),
                        -rcfg.clamp_dist, rcfg.clamp_dist)
        loss = jnp.sum(jnp.abs(pred - gt)) / n
        if rcfg.l2reg:
            loss = loss + rcfg.reg_sigma ** 2 * jnp.sum(latent ** 2)
        return loss

    def body(i, carry):
        latent, opt_state, _ = carry
        lr = rcfg.lr * (1.0 / rcfg.decreased_by) ** (i // rcfg.adjust_lr_every)
        loss, g = jax.value_and_grad(loss_fn)(latent)
        upd, opt_state = _adam.update(g, opt_state, latent)
        latent = latent - lr * upd
        return latent, opt_state, loss

    latent, _, loss = jax.lax.fori_loop(
        0, rcfg.num_iterations, body, (latent0, _adam.init(latent0), jnp.float32(0)))
    return latent, loss


def reconstruct_batch(config: DecoderConfig, params, sdf_batch: np.ndarray,
                      seed: int = 0, rcfg: ReconstructConfig = ReconstructConfig(),
                      shape_chunk: int = 64):
    """Reconstruct latents for a (S, N, geom+1) stack of shapes as
    vmapped device programs of at most ``shape_chunk`` shapes each.
    Chunking bounds HBM: the 400-shape double_lattice split vmapped
    whole needs ~38 GB (>16 GB v5e HBM, observed compile OOM); equal
    chunks reuse one compiled program (last chunk pads by repetition).
    Per-shape PRNG keys are split once over the FULL stack, so results
    are bit-identical for any chunk size. Returns ((S, L), (S,))."""
    S = sdf_batch.shape[0]
    all_keys = jax.random.split(jax.random.PRNGKey(seed), S)
    solve = jax.vmap(
        lambda d, k: reconstruct_latent(config, params, d, k, rcfg))
    lats, losses = [], []
    for lo in range(0, S, shape_chunk):
        hi = min(lo + shape_chunk, S)
        idx = np.arange(lo, hi)
        if hi - lo < shape_chunk and S > shape_chunk:
            # pad to the compiled chunk shape; padded lanes recompute
            # real shapes and are dropped below
            idx = np.concatenate([idx, np.arange(shape_chunk - (hi - lo))])
        lat, loss = solve(jnp.asarray(sdf_batch[idx]), all_keys[idx])
        lats.append(np.asarray(lat)[:hi - lo])
        losses.append(np.asarray(loss)[:hi - lo])
    return np.concatenate(lats), np.concatenate(losses)
