"""Reference-style user code running against the deep_sdf facade."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def trained_exp():
    exp = "/root/repo/experiments/corner_spheres_only_small_network"
    import os
    if not os.path.isdir(os.path.join(exp, "ModelParameters")):
        pytest.skip("trained fixture experiment not present")
    return exp


def test_reference_style_workflow(trained_exp, tmp_path):
    # this block is written exactly like reference user code
    import deep_sdf
    import deep_sdf.workspace as ws

    decoder = ws.load_trained_model(trained_exp, "latest")
    decoder.eval()
    latents = ws.load_latent_vectors(trained_exp, "latest")
    assert latents.shape == (20, 2)

    queries = np.random.default_rng(0).uniform(-1, 1, (64, 3)).astype(np.float32)
    sdf = deep_sdf.utils.decode_sdf(decoder, latents[0], queries)
    assert np.asarray(sdf).shape == (64, 1)

    out = tmp_path / "mesh.ply"
    deep_sdf.mesh.create_mesh(decoder, latents[0], str(out), N=32)
    assert out.is_file()

    from deep_sdf.metrics.chamfer import compute_trimesh_chamfer
    from deepsdf_tpu.mesh.ply import read_ply
    verts, faces = read_ply(str(out))
    ch = compute_trimesh_chamfer(verts, (verts, faces), 0.0, 1.0,
                                 num_mesh_samples=2000)
    assert ch < 5e-3  # mesh surface samples vs its own vertex cloud (N=32 edges)


def test_facade_data_and_specs(trained_exp):
    import deep_sdf.workspace as ws
    from deep_sdf.data import unpack_sdf_samples  # noqa: F401

    specs = ws.load_experiment_specifications(trained_exp)
    assert specs["CodeLength"] == 2
    decoder, epoch = ws.load_decoder(trained_exp, specs, "latest")
    assert epoch == 1000
    assert decoder.geom_dimension == 3
