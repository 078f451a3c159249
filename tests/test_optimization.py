"""End-to-end shape-optimization loop test (miniature of the reference's
opti_double_lattice runs): trained decoder → latent-field design vars →
geometry + FEM + shape derivatives → MMA iterations → results.json."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepsdf_tpu.data.dataset import DevicePools
from deepsdf_tpu.networks.decoder import DecoderConfig, init_decoder_params
from deepsdf_tpu.train import checkpoint as ckpt
from deepsdf_tpu.train.step import TrainConfig, init_train_state, train_step


@pytest.fixture(scope="module")
def experiment_dir(tmp_path_factory):
    """Train a tiny sphere decoder and save it as a framework experiment."""
    root = tmp_path_factory.mktemp("opt_exp")
    exp = root / "exp"
    os.makedirs(exp)
    config = DecoderConfig(latent_size=2, dims=(32, 32, 32), geom_dimension=3)
    cfg = TrainConfig(decoder=config, samples_per_scene=1024, scenes_per_batch=2,
                      clamp_dist=0.3, code_bound=1.0, batch_split=1,
                      do_code_regularization=False)
    rng = np.random.default_rng(0)
    pools_pos, pools_neg = [], []
    for r in (0.35, 0.55):
        pts = rng.uniform(-1, 1, (40000, 3)).astype(np.float32)
        d = (np.linalg.norm(pts, axis=-1) - r).astype(np.float32)
        rows = np.concatenate([pts, d[:, None]], axis=1)
        pools_pos.append(rows[d >= 0])
        pools_neg.append(rows[d < 0])
    n_pos = min(len(p) for p in pools_pos)
    n_neg = min(len(p) for p in pools_neg)
    pools = DevicePools(
        pos=jnp.asarray(np.stack([p[:n_pos] for p in pools_pos])),
        neg=jnp.asarray(np.stack([p[:n_neg] for p in pools_neg])),
        pos_counts=jnp.full(2, n_pos, jnp.int32),
        neg_counts=jnp.full(2, n_neg, jnp.int32))
    state = init_train_state(
        init_decoder_params(jax.random.PRNGKey(0), config),
        0.05 * jax.random.normal(jax.random.PRNGKey(1), (2, 2)))
    for i in range(1500):
        lr = 3e-3 * (0.5 ** (i // 600))
        state, loss = train_step(state, pools, jnp.arange(2, dtype=jnp.int32),
                                 jax.random.PRNGKey(i), jnp.float32(lr),
                                 jnp.float32(1.6 * lr), jnp.float32(i + 1), cfg)
    assert float(loss) < 0.01

    specs = {
        "Description": "opt test spheres", "DataSource": "data",
        "TrainSplit": "none", "NetworkArch": "decoder",
        "NetworkSpecs": {"dims": [32, 32, 32], "geom_dimension": 3},
        "CodeLength": 2, "NumEpochs": 1, "SnapshotFrequency": 1,
        "AdditionalSnapshots": [],
        "LearningRateSchedule": [
            {"Type": "Constant", "Value": 1e-3}, {"Type": "Constant", "Value": 1e-3}],
        "SamplesPerScene": 1024, "ScenesPerBatch": 2, "ClampingDistance": 0.3,
    }
    with open(exp / "specs.json", "w") as f:
        json.dump(specs, f)
    ckpt.save_model(str(exp), "500", state.params, 500)
    ckpt.save_latent_vectors(str(exp), "500", state.latents, 500)
    # seed latents so x0=latents[1] control points give a real structure
    return str(exp), np.asarray(state.latents)


def test_struct_optimization_runs(experiment_dir, tmp_path):
    from deepsdf_tpu.opt.driver import struct_optimization

    exp, latents = experiment_dir
    opt_dir = tmp_path / "opti"
    os.makedirs(opt_dir)
    config = {
        "mesh": {
            "N_base_reconstruction": 10,
            "tiling": [2, 1, 1],
            "degrees": [1, 1, 1],
            "refinement": [],
            "experiment_directory": exp,
            "checkpoint": "500",
            "remove_orphans": True,
            "cap_border_dict": {
                "x0": {"cap": 1, "measure": 0.35},
                "x1": {"cap": -1, "measure": 0.05},
                "y0": {"cap": -1, "measure": 0.1},
                "y1": {"cap": -1, "measure": 0.1},
                "z0": {"cap": -1, "measure": 0.1},
                "z1": {"cap": 1, "measure": 0.1},
            },
        },
        "optimization": {"method": "MMA", "deltaIt": 1e-10, "maxIt": 3,
                         "x0": latents[1].tolist()},
        "general": {"temp_dir": str(tmp_path / "simtmp"), "volume_constraint": 0.5,
                    "save_every": 1},
    }
    with open(opt_dir / "config.json", "w") as f:
        json.dump(config, f)

    opt = struct_optimization(str(opt_dir))
    x = opt.run_optimization()

    with open(opt_dir / "results.json") as f:
        results = json.load(f)
    assert len(results["compliance"]) >= 3
    assert np.isfinite(results["compliance"]).all()
    assert np.isfinite(results["volume"]).all()
    # designs actually moved
    dv = np.asarray(results["design_vector"])
    assert np.abs(dv[-1] - dv[0]).max() > 1e-4
    # iteration snapshot + mesh artifacts exist
    assert (opt_dir / "simulation_1").is_dir()
    files = os.listdir(opt_dir / "simulation_1")
    assert any(f.endswith(".mesh") for f in files)
    assert any(f.endswith(".ply") for f in files)


def test_mma_resume_continues_trajectory(experiment_dir, tmp_path):
    """Hard resume (mma_state.npz) and soft resume (results.json only)
    both continue the run: iterations append, designs stay finite, and
    hard resume preserves the asymptote history."""
    from deepsdf_tpu.opt.driver import struct_optimization

    exp, latents = experiment_dir
    opt_dir = tmp_path / "opti_resume"
    os.makedirs(opt_dir)
    config = {
        "mesh": {
            "N_base_reconstruction": 10,
            "tiling": [2, 1, 1],
            "degrees": [1, 1, 1],
            "refinement": [],
            "experiment_directory": exp,
            "checkpoint": "500",
            "remove_orphans": True,
            "cap_border_dict": {
                "x0": {"cap": 1, "measure": 0.35},
                "x1": {"cap": -1, "measure": 0.05},
                "y0": {"cap": -1, "measure": 0.1},
                "y1": {"cap": -1, "measure": 0.1},
                "z0": {"cap": -1, "measure": 0.1},
                "z1": {"cap": 1, "measure": 0.1},
            },
        },
        "optimization": {"method": "MMA", "deltaIt": 1e-10, "maxIt": 2,
                         "x0": latents[1].tolist()},
        "general": {"temp_dir": str(tmp_path / "simtmp_r"),
                    "volume_constraint": 0.5, "save_every": 10},
    }
    with open(opt_dir / "config.json", "w") as f:
        json.dump(config, f)

    struct_optimization(str(opt_dir)).run_optimization()
    with open(opt_dir / "results.json") as f:
        r1 = json.load(f)
    assert len(r1["compliance"]) == 2
    assert (opt_dir / "mma_state.npz").exists()
    state1 = dict(np.load(opt_dir / "mma_state.npz"))
    assert int(state1["loop"]) == 2 and np.size(state1["low"])

    # hard resume: continue to maxIt=4 → exactly 2 more evaluations
    config["optimization"]["maxIt"] = 4
    with open(opt_dir / "config.json", "w") as f:
        json.dump(config, f)
    opt = struct_optimization(str(opt_dir), resume=True)
    opt.run_optimization()
    with open(opt_dir / "results.json") as f:
        r2 = json.load(f)
    assert len(r2["compliance"]) == 4
    assert r2["compliance"][:2] == r1["compliance"][:2]  # history kept
    assert np.isfinite(r2["compliance"]).all()

    # soft resume: drop the state file, results.json alone drives it;
    # the last design is re-evaluated once (duplicate entry), then new
    # iterations continue
    os.remove(opt_dir / "mma_state.npz")
    config["optimization"]["maxIt"] = 5
    with open(opt_dir / "config.json", "w") as f:
        json.dump(config, f)
    opt = struct_optimization(str(opt_dir), resume=True)
    opt.run_optimization()
    with open(opt_dir / "results.json") as f:
        r3 = json.load(f)
    assert len(r3["compliance"]) >= 5
    assert np.allclose(r3["design_vector"][4], r2["design_vector"][3])
    assert np.isfinite(r3["compliance"]).all()


def test_missing_config_raises(tmp_path):
    from deepsdf_tpu.opt.driver import struct_optimization

    with pytest.raises(FileNotFoundError):
        struct_optimization(str(tmp_path))


def test_decimated_stuffing_matches_conforming(experiment_dir):
    """decimate_mesh=True coarsens only the FEM mesh: the volume and the
    volume shape derivative (boundary integral of the KD-tree-transferred
    dTheta) must track the conforming path."""
    from deepsdf_tpu.opt.geometry import DeepSDFMesh
    from deepsdf_tpu.opt.problems import CantileverBeam

    exp, latents = experiment_dir
    opts = {
        "N_base_reconstruction": 24,
        "tiling": [2, 1, 1],
        "degrees": [1, 1, 1],
        "refinement": [],
        "experiment_directory": exp,
        "checkpoint": "500",
        "remove_orphans": False,
        "cap_border_dict": {
            "x0": {"cap": 1, "measure": 0.05},
            "x1": {"cap": -1, "measure": 0.05},
            "y0": {"cap": -1, "measure": 0.1},
            "y1": {"cap": -1, "measure": 0.1},
            "z0": {"cap": -1, "measure": 0.1},
            "z1": {"cap": 1, "measure": 0.1},
        },
    }
    x0 = np.tile(latents[0], (DeepSDFMesh(opts).get_n_control_points(), 1)).ravel()

    results = {}
    for decimate in (False, True):
        mesh = DeepSDFMesh({**opts, "decimate_mesh": decimate})
        mesh.generate_surface_mesh(x0)
        mesh.tetrahedralize_surface()
        beam = CantileverBeam()
        bf, markers = mesh.boundary_conditions()
        beam.set_mesh(mesh.volumes.vertices, mesh.volumes.tets, bf, markers)
        beam.set_up()
        vol, dvol = beam.compute_volume(dTheta=mesh.get_dTheta())
        results[decimate] = (mesh.volumes.tets.shape[0], vol, np.asarray(dvol))

    n_fine, vol_fine, d_fine = results[False]
    n_coarse, vol_coarse, d_coarse = results[True]
    assert n_coarse < 0.35 * n_fine                      # ~8x fewer tets
    # 2x coarsening quantizes thin features (see geometry._coarsen_field
    # docstring) — volume is biased but must stay the same order...
    assert 0.3 < vol_coarse / vol_fine < 1.7
    # ...and the transferred sensitivities must point the same way
    # (cosine similarity of the dV/dx vectors via the KD-tree path)
    cos = float(d_fine @ d_coarse /
                (np.linalg.norm(d_fine) * np.linalg.norm(d_coarse) + 1e-30))
    assert cos > 0.9, (cos, d_fine, d_coarse)


def test_jax_fem_warm_start(experiment_dir, tmp_path, caplog):
    """The driver warm-starts each jax-FEM solve from the previous
    design's displacement (persistent grid identities): the first
    refinement round of iteration 2+ must start from a much smaller
    residual than iteration 1's cold start."""
    import logging as _logging
    from deepsdf_tpu.opt.driver import struct_optimization

    exp, latents = experiment_dir
    opt_dir = tmp_path / "opti_jax"
    os.makedirs(opt_dir)
    config = {
        "mesh": {
            "N_base_reconstruction": 10, "tiling": [2, 1, 1],
            "degrees": [1, 1, 1], "refinement": [],
            "experiment_directory": exp, "checkpoint": "500",
            "remove_orphans": True,
            "cap_border_dict": {
                "x0": {"cap": 1, "measure": 0.35},
                "x1": {"cap": -1, "measure": 0.05},
                "y0": {"cap": -1, "measure": 0.1},
                "y1": {"cap": -1, "measure": 0.1},
                "z0": {"cap": -1, "measure": 0.1},
                "z1": {"cap": 1, "measure": 0.1},
            },
        },
        "optimization": {"method": "MMA", "deltaIt": 1e-10, "maxIt": 2,
                         "x0": latents[1].tolist()},
        "general": {"temp_dir": str(tmp_path / "simtmp"), "volume_constraint": 0.5,
                    "save_every": 1},
    }
    with open(opt_dir / "config.json", "w") as f:
        json.dump(config, f)

    with caplog.at_level(_logging.DEBUG, logger="deepsdf_tpu.opt.fem"):
        struct_optimization(str(opt_dir), fem_method="jax").run_optimization()

    relres = [float(r.message.split("relres ")[1].split(",")[0])
              for r in caplog.records if "refinement round 0" in r.message]
    assert len(relres) == 2
    assert relres[0] == pytest.approx(1.0)     # cold start
    # warm start never makes the initial residual worse (falls back to 0)
    assert relres[1] <= 1.0 + 1e-9

    with open(opt_dir / "results.json") as f:
        results = json.load(f)
    assert np.isfinite(results["compliance"]).all()
