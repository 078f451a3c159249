"""Microstructure meshing tests: tiling transform, caps, forward mesh,
and finite-difference validation of dVerts/dControl (the reference's
paper/04_plot_derivatives.py validation, as a unit test)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepsdf_tpu.data.dataset import DevicePools
from deepsdf_tpu.mesh.diff_mesh import create_mesh_microstructure_diff, diff_grid
from deepsdf_tpu.mesh.marching import marching_tetrahedra
from deepsdf_tpu.mesh.microstructure import (
    cap_items_tuple, create_mesh_microstructure, domain_basis_matrix, microstructure_sdf,
)
from deepsdf_tpu.networks.decoder import DecoderConfig, init_decoder_params
from deepsdf_tpu.ops.bspline import latent_field_spline
from deepsdf_tpu.ops.tiling import DEFAULT_CAP_BORDER, tile_transform
from deepsdf_tpu.train.step import TrainConfig, init_train_state, train_step


@pytest.fixture(scope="module")
def sphere_decoder():
    """Tiny decoder trained so latent[0] ≈ sphere r=0.35, latent[1] ≈ r=0.55."""
    config = DecoderConfig(latent_size=2, dims=(32, 32, 32), geom_dimension=3)
    cfg = TrainConfig(decoder=config, samples_per_scene=1024, scenes_per_batch=2,
                      clamp_dist=0.3, code_bound=1.0, batch_split=1,
                      do_code_regularization=False)
    rng = np.random.default_rng(0)
    radii = [0.35, 0.55]
    pools_pos, pools_neg = [], []
    for r in radii:
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
        neg_counts=jnp.full(2, n_neg, jnp.int32),
    )
    state = init_train_state(
        init_decoder_params(jax.random.PRNGKey(0), config),
        0.05 * jax.random.normal(jax.random.PRNGKey(1), (2, 2)))
    for i in range(1500):
        lr = 3e-3 * (0.5 ** (i // 600))
        state, loss = train_step(state, pools, jnp.arange(2, dtype=jnp.int32),
                                 jax.random.PRNGKey(i), jnp.float32(lr),
                                 jnp.float32(1.6 * lr), jnp.float32(i + 1), cfg)
    assert float(loss) < 0.01, float(loss)
    return config, state.params, np.asarray(state.latents)


def test_tile_transform_formula():
    # t=1 is identity-ish triangle wave over [-1,1]; t=2 squeezes two periods
    x = jnp.linspace(-1, 1, 101)
    y1 = np.asarray(tile_transform(x, 1))
    assert y1.min() >= -1 - 1e-6 and y1.max() <= 1 + 1e-6
    # compare to the reference formula evaluated in numpy
    def ref_transform(x, t):
        p = 2 / t
        return (2 / p) * np.abs((x - t % 2) % (p * 2) - p) - 1
    for t in (1, 2, 3, 4, 5):
        np.testing.assert_allclose(
            np.asarray(tile_transform(x, t)), ref_transform(np.asarray(x), t), atol=1e-6)


def test_forward_microstructure_tiles(sphere_decoder):
    config, params, latents = sphere_decoder
    spline = latent_field_spline(2, [1, 1, 1], [])
    spline.control_points = np.tile(latents[1], (8, 1))  # constant field: r=0.55 sphere

    verts, faces = create_mesh_microstructure(
        [2, 1, 1], config, params, spline, N=[48, 24, 24], max_batch=32768)
    assert len(verts) > 200
    assert verts.min() >= -1e-6 and verts.max() <= 1 + 1e-6  # [0,1] scale
    # two tiles along x: sphere surfaces near x=0.25 and x=0.75 cell centers
    left = verts[verts[:, 0] < 0.5]
    right = verts[verts[:, 0] >= 0.5]
    assert len(left) > 100 and len(right) > 100
    r_left = np.linalg.norm(left - np.array([0.25, 0.5, 0.5]), axis=1)
    # sphere radius 0.55 in tile coords = 0.55 * (tile half-width 0.25 in x... )
    # just verify a coherent shell: stddev of radii small vs mean
    assert r_left.std() < 0.35 * r_left.mean()


def test_caps_remove_material(sphere_decoder):
    config, params, latents = sphere_decoder
    spline = latent_field_spline(2, [1, 1, 1], [])
    spline.control_points = np.tile(latents[1], (8, 1))
    caps_subtract = {loc: {"cap": -1, "measure": 0.4} for loc in
                     ("x0", "x1", "y0", "y1", "z0", "z1")}
    v_cap, f_cap = create_mesh_microstructure(
        [1, 1, 1], config, params, spline, N=[24, 24, 24], cap_border_dict=caps_subtract)
    v_def, f_def = create_mesh_microstructure(
        [1, 1, 1], config, params, spline, N=[24, 24, 24])
    # subtracting a 0.4-measure slab at every face strictly shrinks the shape
    # interior extent compared to the zero-measure default caps
    if len(v_cap) and len(v_def):
        assert v_cap[:, 0].max() <= v_def[:, 0].max() + 1e-9
        assert (v_cap[:, 0].max() < 0.85)


def test_diff_jacobian_matches_finite_difference(sphere_decoder):
    config, params, latents = sphere_decoder
    spline = latent_field_spline(2, [1, 1, 1], [0])  # 12 control points
    spline.control_points = np.tile(latents[0], (spline.control_points.shape[0], 1))

    tiling = (1, 1, 1)
    N = [16, 16, 16]
    verts, faces, jac = create_mesh_microstructure_diff(
        tiling, config, params, spline, N=N, compute_derivatives=True)
    V, C, L = len(verts), spline.control_points.shape[0], 2
    assert jac.shape == (V, 3, C, L)
    assert np.isfinite(jac).all()

    # finite differences with FIXED topology: recompute t on stored edges
    coords_np, dims, spacing, origin = diff_grid(tuple(N))
    basis = domain_basis_matrix(spline, coords_np)
    cap_items = cap_items_tuple(DEFAULT_CAP_BORDER)

    sdf0 = np.asarray(microstructure_sdf(
        config, params, jnp.asarray(spline.control_points, jnp.float32),
        jnp.asarray(basis), jnp.asarray(coords_np), tiling, cap_items))
    _, _, _, _, topo = marching_tetrahedra(
        sdf0.reshape(dims).astype(np.float64), 0.0, spacing, return_topology=True)
    u_lo, u_hi = topo["u_lo"], topo["u_hi"]

    def verts01_from_cpts(cpts):
        sdf = np.asarray(microstructure_sdf(
            config, params, jnp.asarray(cpts, jnp.float32),
            jnp.asarray(basis), jnp.asarray(coords_np), tiling, cap_items),
            dtype=np.float64)
        f_lo, f_hi = sdf[u_lo], sdf[u_hi]
        t = f_lo / (f_lo - f_hi)
        ny, nz = dims[1], dims[2]
        def coords_of(flat):
            return np.stack([flat // (ny * nz), (flat // nz) % ny, flat % nz],
                            1).astype(np.float64) * np.asarray(spacing)
        phys = (coords_of(u_lo) * (1 - t[:, None]) + coords_of(u_hi) * t[:, None]
                + np.asarray(origin))
        return (phys + 1) / 2

    eps = 1e-3
    rng = np.random.default_rng(0)
    checked = 0
    for k in rng.choice(C, 3, replace=False):
        for l in range(L):
            cp_p = spline.control_points.copy(); cp_p[k, l] += eps
            cp_m = spline.control_points.copy(); cp_m[k, l] -= eps
            fd = (verts01_from_cpts(cp_p) - verts01_from_cpts(cp_m)) / (2 * eps)
            an = jac[:, :, k, l]
            # compare on vertices with meaningful sensitivity
            mask = np.abs(fd).max(axis=1) > 1e-4
            if mask.sum() < 5:
                continue
            np.testing.assert_allclose(an[mask], fd[mask], rtol=0.05, atol=2e-3)
            checked += 1
    assert checked >= 3


def test_degenerate_all_void_design_returns_empty_jacobian():
    """A design with no zero crossings (all-void grid) must yield an
    empty mesh and an empty (0,3,C,L) jacobian, not crash the padding
    logic (advisor round-4 finding: broadcast_to on an empty endpoint
    set raised ValueError, killing the optimizer iterate)."""
    config = DecoderConfig(latent_size=2, dims=(16, 16), geom_dimension=3)
    params = init_decoder_params(jax.random.PRNGKey(0), config)
    # constant strongly-positive SDF everywhere -> zero crossing edges
    params["lin2"] = dict(params["lin2"])
    params["lin2"]["w"] = jnp.zeros_like(params["lin2"]["w"])
    params["lin2"]["b"] = jnp.full_like(params["lin2"]["b"], 0.5)

    spline = latent_field_spline(2, [1, 1, 1], [0])
    spline.control_points = np.zeros_like(spline.control_points)

    verts, faces, jac = create_mesh_microstructure_diff(
        (1, 1, 1), config, params, spline, N=[8, 8, 8],
        compute_derivatives=True)
    assert len(verts) == 0 and len(faces) == 0
    assert jac.shape == (0, 3, spline.control_points.shape[0], 2)
