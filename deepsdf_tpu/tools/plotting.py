"""SDF and training-data visualization (matplotlib-only).

Parity surface of ref sdf_sampler/plotting.py:10-162 (contour plots of
SDF slices) and ref deep_sdf/plotting.py:13-69 (training-sample
viewers, which used vedo/gustaf — replaced by matplotlib 3-D scatter),
plus the ref deep_sdf/utils.py:67-86 ``get_MS`` 2-D slice evaluator.
"""

from __future__ import annotations

import logging
import os

import numpy as np

logger = logging.getLogger(__name__)


def _plt():
    import matplotlib
    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt
    return plt


def scatter_contour_at_z_level(fun, z_level=0, res=100, custom_axis=None,
                               eval_area=(-1, 1), scale=(1, 1), clim=None,
                               flip_axes=False, savefig=None):
    """Filled contour of an SDF on the z=z_level plane
    (ref sdf_sampler/plotting.py:10-58)."""
    plt = _plt()
    own_fig = custom_axis is None
    if own_fig:
        fig, ax = plt.subplots(1, 1)
    else:
        ax = custom_axis
    x = np.linspace(eval_area[0], eval_area[1], num=res)
    y = np.linspace(eval_area[0], eval_area[1], num=res)
    X, Y = np.meshgrid(x, y)
    Z = np.zeros_like(X) + z_level
    sdf = np.asarray(fun(np.vstack([X.flatten(), Y.flatten(), Z.flatten()]).T))
    sdf = sdf.reshape(X.shape)
    if flip_axes:
        X, Y = Y, X
    cf = ax.contourf(X * scale[0], Y * scale[1], sdf, cmap="seismic",
                     vmin=(clim or (-1, 1))[0], vmax=(clim or (-1, 1))[1])
    ax.contour(X * scale[0], Y * scale[1], sdf, levels=[0], colors="black",
               linewidths=0.5)
    ax.set_aspect(1)
    if own_fig and savefig:
        fig.savefig(savefig, dpi=120)
        plt.close(fig)
    return ax


def generate_plane_points(origin, normal, num_points_u, num_points_v, spacing):
    """Regular point grid on an arbitrary plane
    (ref sdf_sampler/plotting.py:123-162)."""
    origin = np.asarray(origin, dtype=np.float64)
    normal = np.asarray(normal, dtype=np.float64)
    normal = normal / np.linalg.norm(normal)
    helper = np.array([1.0, 0.0, 0.0])
    if abs(normal @ helper) > 0.9:
        helper = np.array([0.0, 1.0, 0.0])
    u = np.cross(normal, helper)
    u /= np.linalg.norm(u)
    v = np.cross(normal, u)
    iu = (np.arange(num_points_u) - (num_points_u - 1) / 2) * spacing
    iv = (np.arange(num_points_v) - (num_points_v - 1) / 2) * spacing
    U, V = np.meshgrid(iu, iv, indexing="ij")
    pts = origin[None, :] + U.reshape(-1, 1) * u[None, :] + V.reshape(-1, 1) * v[None, :]
    return pts, (U, V)


def scatter_contour_at_origin(fun, origin=(0, 0, 0), normal=(0, 0, 1), res=100,
                              custom_axis=None, extent=2.0, clim=None,
                              savefig=None):
    """SDF contour on an arbitrary plane (ref sdf_sampler/plotting.py:61-120)."""
    plt = _plt()
    own_fig = custom_axis is None
    if own_fig:
        fig, ax = plt.subplots(1, 1)
    else:
        ax = custom_axis
    spacing = extent / (res - 1)
    pts, (U, V) = generate_plane_points(origin, normal, res, res, spacing)
    sdf = np.asarray(fun(pts)).reshape(U.shape)
    ax.contourf(U, V, sdf, cmap="seismic",
                vmin=(clim or (-1, 1))[0], vmax=(clim or (-1, 1))[1])
    ax.contour(U, V, sdf, levels=[0], colors="black", linewidths=0.5)
    ax.set_aspect(1)
    if own_fig and savefig:
        fig.savefig(savefig, dpi=120)
        plt.close(fig)
    return ax


def get_MS(config, params, latent_vector, res: int = 100):
    """Evaluate a 2-D (geom_dimension=2) decoder over a [-1,1]² grid
    (ref deep_sdf/utils.py:67-86). Returns (x, y, z) columns."""
    import jax.numpy as jnp

    from ..networks.decoder import decoder_forward

    latent_vector = jnp.asarray(latent_vector).reshape(-1)
    x = np.linspace(-1, 1, res)
    xv, yv = np.meshgrid(x, x, indexing="ij")
    xf = xv.reshape(-1, 1).astype(np.float32)
    yf = yv.reshape(-1, 1).astype(np.float32)
    n = xf.shape[0]
    inputs = jnp.concatenate([
        jnp.broadcast_to(latent_vector[None, :], (n, latent_vector.shape[0])),
        jnp.asarray(xf), jnp.asarray(yf),
    ], axis=1)
    z = np.asarray(decoder_forward(config, params, inputs))
    return xf, yf, z


def show_random_training_files(experiment_directory, data_source=None,
                               n_files: int = 3, seed: int = 0, savefig=None,
                               epoch=None):
    """3-D scatter of random training shapes' SDF samples with optional
    reconstruction overlay (ref deep_sdf/plotting.py:31-69, vedo→mpl)."""
    import json

    from .. import workspace as ws
    from ..data.dataset import get_instance_filenames, unpack_sdf_samples

    plt = _plt()
    specs = ws.load_experiment_specifications(experiment_directory)
    data_source = data_source or specs["DataSource"]
    with open(specs["TrainSplit"]) as f:
        split = json.load(f)
    files = get_instance_filenames(data_source, split)
    rng = np.random.default_rng(seed)
    chosen = rng.choice(len(files), size=min(n_files, len(files)), replace=False)

    fig = plt.figure(figsize=(5 * len(chosen), 5))
    geom = specs["NetworkSpecs"].get("geom_dimension", 3)
    for i, idx in enumerate(chosen):
        full = os.path.join(data_source, ws.sdf_samples_subdir, files[idx])
        samples = unpack_sdf_samples(full, geom, 4096, rng)
        ax = fig.add_subplot(1, len(chosen), i + 1, projection="3d")
        sc = ax.scatter(samples[:, 0], samples[:, 1], samples[:, 2],
                        c=np.clip(samples[:, 3], -0.1, 0.1), cmap="coolwarm", s=2)
        ax.set_title(os.path.basename(files[idx]))
        fig.colorbar(sc, ax=ax, shrink=0.6)
    if savefig:
        fig.savefig(savefig, dpi=120)
        plt.close(fig)
    return fig


def plot_convergence(results, savefig=None):
    """Compliance/volume convergence curves (ref opti.py:393-439,
    plot_optimization_convergence.py)."""
    plt = _plt()
    fig, (ax1, ax2) = plt.subplots(2, 1, sharex=True, figsize=(7, 6))
    ax1.plot(results["compliance"] if isinstance(results, dict) else results.compliance)
    ax1.set_ylabel("compliance")
    ax2.plot(results["volume"] if isinstance(results, dict) else results.volume)
    ax2.set_ylabel("volume")
    ax2.set_xlabel("iteration")
    for ax in (ax1, ax2):
        ax.grid(True, alpha=0.3)
    if savefig:
        fig.savefig(savefig, dpi=120)
        plt.close(fig)
    return fig


def raster_screenshot(verts, faces, filename, elev: float = 20,
                      azim: float = -60, res: int = 900,
                      samples_per_face: float = 4.0):
    """Offscreen shaded render via vectorized point-splat z-buffering —
    O(points) numpy, no per-triangle python loop, so it handles the
    half-million-face optimization surfaces that stall matplotlib's
    Poly3DCollection (563k faces > 5 min; this path ~2 s)."""
    from ..metrics.chamfer import sample_surface

    verts = np.asarray(verts, np.float64)
    faces = np.asarray(faces, np.int64)
    n_pts = int(min(max(len(faces) * samples_per_face, 200_000), 4_000_000))
    pts, tri = sample_surface(verts, faces, n_pts,
                              np.random.default_rng(0), return_index=True)
    tv = verts[faces]
    fn = np.cross(tv[:, 1] - tv[:, 0], tv[:, 2] - tv[:, 0])
    fn /= np.maximum(np.linalg.norm(fn, axis=1, keepdims=True), 1e-300)
    n = fn[tri]

    # view rotation (matplotlib elev/azim convention, orthographic)
    az, el = np.radians(azim), np.radians(elev)
    fwd = -np.array([np.cos(el) * np.cos(az), np.cos(el) * np.sin(az),
                     np.sin(el)])                     # camera looks along fwd
    up0 = np.array([0.0, 0.0, 1.0])
    right = np.cross(fwd, up0)
    right /= np.linalg.norm(right)
    up = np.cross(right, fwd)
    uvd = pts @ np.stack([right, up, fwd], axis=1)    # (N,3): u, v, depth

    lo, hi = uvd[:, :2].min(0), uvd[:, :2].max(0)
    c, r = (lo + hi) / 2, max((hi - lo).max() / 2 * 1.05, 1e-9)
    ix = np.clip(((uvd[:, 0] - c[0] + r) / (2 * r) * (res - 1)), 0,
                 res - 1).astype(np.int32)
    iy = np.clip(((uvd[:, 1] - c[1] + r) / (2 * r) * (res - 1)), 0,
                 res - 1).astype(np.int32)

    light = np.array([0.4, 0.3, 0.87])
    shade = 0.35 + 0.65 * np.clip(np.abs(n @ light), 0, 1)

    # painter's algorithm: draw far-to-near so near points win; splat a
    # 2x2 footprint per point so the cover has no pinholes
    order = np.argsort(-uvd[:, 2], kind="stable")
    img = np.ones((res, res, 3))
    colors = np.outer(shade[order], [0.5, 0.6, 0.8])
    oy, ox = iy[order], ix[order]
    for dy in (0, 1):
        for dx in (0, 1):
            img[np.minimum(oy + dy, res - 1),
                np.minimum(ox + dx, res - 1)] = colors

    plt = _plt()
    fig, ax = plt.subplots(figsize=(6, 6))
    ax.imshow(img, origin="lower")
    ax.set_axis_off()
    fig.savefig(filename, dpi=150, bbox_inches="tight")
    plt.close(fig)
    return filename


def screenshot_mesh(verts, faces, filename, elev: float = 20, azim: float = -60,
                    figsize=(6, 6)):
    """Offscreen mesh render to PNG (replaces the vedo screenshot tool,
    ref create_screenshots_from_plyfiles.py:17-36). Large meshes go
    through the rasterizing path (matplotlib's Poly3DCollection is
    unusable beyond ~10^5 faces)."""
    from mpl_toolkits.mplot3d.art3d import Poly3DCollection

    if len(faces) > 120_000:
        return raster_screenshot(verts, faces, filename, elev=elev, azim=azim)
    plt = _plt()
    fig = plt.figure(figsize=figsize)
    ax = fig.add_subplot(projection="3d")
    tv = np.asarray(verts)[np.asarray(faces)]
    # shade by face normal direction
    n = np.cross(tv[:, 1] - tv[:, 0], tv[:, 2] - tv[:, 0])
    n = n / np.maximum(np.linalg.norm(n, axis=1, keepdims=True), 1e-12)
    light = np.array([0.4, 0.3, 0.87])
    shade = 0.35 + 0.65 * np.clip(n @ light, 0, 1)
    coll = Poly3DCollection(tv, facecolors=np.outer(shade, [0.5, 0.6, 0.8]),
                            edgecolor="none")
    ax.add_collection3d(coll)
    lo, hi = np.asarray(verts).min(0), np.asarray(verts).max(0)
    c = (lo + hi) / 2
    r = (hi - lo).max() / 2
    ax.set_xlim(c[0] - r, c[0] + r)
    ax.set_ylim(c[1] - r, c[1] + r)
    ax.set_zlim(c[2] - r, c[2] + r)
    ax.view_init(elev=elev, azim=azim)
    ax.set_axis_off()
    fig.savefig(filename, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return filename
