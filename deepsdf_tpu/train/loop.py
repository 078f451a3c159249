"""Spec-driven auto-decoder training loop (ref: train_deep_sdf.py:255-581).

Host code orchestrates epochs/checkpoints/logging; all per-step compute
(batch assembly, forward/backward, optimizer) is one jitted XLA program
on device (see ``step.py``). Steps are dispatched asynchronously — the
host enqueues the whole epoch and only blocks when reading the loss.
"""

from __future__ import annotations

import dataclasses
import datetime
import json
import logging
import math
import os
import signal
import time
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp

from .. import workspace as ws
from ..data.dataset import load_device_pools, epoch_scene_batches
from ..networks.decoder import init_decoder_params
from . import checkpoint as ckpt
from .schedules import get_learning_rate_schedules
from .step import TrainConfig, TrainState, init_train_state, train_epoch, train_step, train_step_batch

logger = logging.getLogger(__name__)


def get_mean_latent_vector_magnitude(latents) -> float:
    return float(jnp.mean(jnp.linalg.norm(latents, axis=1)))


def _param_names(params: Any) -> list[str]:
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    return [".".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
            for path, _ in flat]


@jax.jit
def _epoch_metrics(state: TrainState, losses: jax.Array) -> jax.Array:
    """Pack [losses..., lat_mag, param_norms...] into ONE device array so
    the host needs a single transfer per epoch (ref logged these with
    many separate .item() syncs, train_deep_sdf.py:539-565)."""
    lat_mag = jnp.mean(jnp.linalg.norm(state.latents, axis=1))
    norms = jnp.stack([jnp.linalg.norm(leaf)
                       for leaf in jax.tree_util.tree_leaves(state.params)])
    return jnp.concatenate([losses.reshape(-1), lat_mag[None], norms])


def append_parameter_magnitudes(param_mag_log: dict, params: Any) -> None:
    """Per-parameter L2 norms (ref: train_deep_sdf.py:246-252); shares
    _param_names so both logging paths use identical keys."""
    leaves = jax.tree_util.tree_leaves(params)
    for name, leaf in zip(_param_names(params), leaves):
        param_mag_log.setdefault(name, []).append(float(jnp.linalg.norm(leaf)))


def main_function(experiment_directory: str, continue_from: str | None = None,
                  batch_split: int = 1, seed: int = 0,
                  num_epochs_override: int | None = None,
                  fused: bool = False,
                  use_mesh: bool | None = None) -> TrainState:
    """Spec-driven training. ``use_mesh=None`` auto-shards over ALL
    visible devices when more than one is present (DP over scenes,
    row-sharded latent table — SURVEY.md §2 parallelism inventory);
    ``False`` forces single-device, ``True`` requires >1 device."""
    specs = ws.load_experiment_specifications(experiment_directory)
    logger.info("Experiment description: \n%s", specs.get("Description", ""))

    data_source = specs["DataSource"]
    with open(specs["TrainSplit"]) as f:
        train_split = json.load(f)

    cfg = TrainConfig.from_specs(specs, batch_split=batch_split, fused=fused)
    if fused:
        from ..ops.fused_mlp import supports_fused
        if not supports_fused(cfg.decoder):
            logger.warning("architecture unsupported by the fused kernel; using XLA path")
            cfg = dataclasses.replace(cfg, fused=False)
    latent_size = specs["CodeLength"]
    num_epochs = (num_epochs_override if num_epochs_override is not None
                  else specs["NumEpochs"])
    log_frequency = specs.get("LogFrequency", 10)

    checkpoints = list(range(
        specs["SnapshotFrequency"], num_epochs + 1, specs["SnapshotFrequency"],
    ))
    checkpoints.extend(specs.get("AdditionalSnapshots", []))
    checkpoints.sort()

    lr_schedules = get_learning_rate_schedules(specs)

    # --- data: device-resident pools (default) or streaming host loader
    # for datasets beyond HBM ("DataLoaderMode": "stream" in specs) ---
    data_mode = specs.get("DataLoaderMode", "device")
    if data_mode == "stream":
        from ..data.streaming import StreamingSDFLoader
        loader = StreamingSDFLoader(
            data_source, train_split, cfg.samples_per_scene,
            cfg.decoder.geom_dimension, cfg.scenes_per_batch,
            num_workers=specs.get("DataLoaderThreads", 2), seed=seed)
        pools = None
        num_scenes = loader.num_scenes
    else:
        pools = load_device_pools(data_source, train_split, cfg.decoder.geom_dimension,
                                  window_extra=2 * (cfg.samples_per_scene // 2))
        num_scenes = pools.num_scenes
    logger.info("There are %d scenes (%s mode)", num_scenes, data_mode)

    # --- device mesh (DP): params/pools replicated, latent table row-
    # sharded, scenes of each batch split over the ``data`` axis.
    # XLA's SPMD partitioner inserts the grad all-reduce over ICI. ---
    mesh = None
    n_dev = jax.device_count()
    if use_mesh is None:
        use_mesh = n_dev > 1 and pools is not None
    if use_mesh:
        if n_dev < 2:
            raise RuntimeError("use_mesh=True requires more than one device")
        if pools is None:
            raise RuntimeError("mesh training requires device-resident pools "
                               "(DataLoaderMode 'device')")
        from ..parallel.mesh import make_mesh, put_replicated, shard_train_state
        mesh = make_mesh()
        logger.info("Training over a %d-device mesh (%d process(es))",
                    n_dev, jax.process_count())

    # --- init model + latent table (ref :385-390) ---
    root_key = jax.random.PRNGKey(seed)
    init_key, latent_key, run_key = jax.random.split(root_key, 3)
    params = init_decoder_params(init_key, cfg.decoder)
    code_init_std = specs.get("CodeInitStdDev", 1.0)
    latents = code_init_std / math.sqrt(latent_size) * jax.random.normal(
        latent_key, (num_scenes, latent_size), dtype=jnp.float32
    )
    state = init_train_state(params, latents)

    loss_log: list[float] = []
    lr_log: list[list[float]] = []
    lat_mag_log: list[float] = []
    timing_log: list[float] = []
    param_mag_log: dict[str, list[float]] = {}
    start_epoch = 1

    if continue_from is not None:
        logger.info('continuing from "%s"', continue_from)
        lat, lat_epoch = ckpt.load_latent_vectors(experiment_directory, continue_from)
        model_params, model_epoch = ckpt.load_model_parameters(
            experiment_directory, continue_from, cfg.decoder, template=state.params)
        opt_template = {"opt_params": state.opt_params, "opt_latents": state.opt_latents}
        opt, optimizer_epoch = ckpt.load_optimizer(
            experiment_directory, continue_from, opt_template)
        state = TrainState(model_params, lat, opt["opt_params"], opt["opt_latents"])
        loss_log, lr_log, timing_log, lat_mag_log, param_mag_log, log_epoch = \
            ckpt.load_logs(experiment_directory)
        if log_epoch != model_epoch:
            loss_log, lr_log, timing_log, lat_mag_log, param_mag_log = ckpt.clip_logs(
                loss_log, lr_log, timing_log, lat_mag_log, param_mag_log, model_epoch)
        if not (model_epoch == optimizer_epoch == lat_epoch):
            raise RuntimeError(
                f"epoch mismatch: {model_epoch} vs {optimizer_epoch} vs {lat_epoch} vs {log_epoch}")
        start_epoch = model_epoch + 1

    if mesh is not None:
        # params/opt replicated, latent table (+ its Adam moments) row-
        # sharded; pools replicated (the per-scene gather stays local)
        state = shard_train_state(mesh, state)
        pools = put_replicated(mesh, pools)

    logger.info("starting from epoch %d", start_epoch)
    n_params = sum(int(np.size(x)) for x in jax.tree_util.tree_leaves(state.params))
    logger.info("Number of decoder parameters: %d", n_params)
    logger.info("Number of shape code parameters: %d (# codes %d, code dim %d)",
                num_scenes * latent_size, num_scenes, latent_size)

    def _host_copy(tree):
        """Fully-addressable view for checkpoint writing. Multi-host:
        allgather the row-sharded leaves (latent table + its moments) —
        a collective, so EVERY process calls this before the process-0
        write guard."""
        def f(x):
            if hasattr(x, "sharding") and not x.sharding.is_fully_addressable:
                from jax.experimental import multihost_utils as mh
                return mh.process_allgather(x, tiled=True)
            return x
        return jax.tree.map(f, tree)

    def save_named(name: str, epoch: int) -> None:
        st = _host_copy(state) if jax.process_count() > 1 else state
        if jax.process_index() != 0:  # one writer
            return
        ckpt.save_model(experiment_directory, name, st.params, epoch)
        ckpt.save_optimizer(experiment_directory, name,
                            {"opt_params": st.opt_params, "opt_latents": st.opt_latents}, epoch)
        ckpt.save_latent_vectors(experiment_directory, name, st.latents, epoch)

    def save_latest(epoch: int) -> None:
        save_named("latest", epoch)

    def save_checkpoints(epoch: int) -> None:
        save_named(str(epoch), epoch)

    stop_requested = {"flag": False}

    def _sigint(sig, frame):  # ref :311-313 — stop cleanly at epoch boundary
        logger.info("Stopping early...")
        stop_requested["flag"] = True

    prev_handler = None
    if hasattr(signal, "SIGINT"):
        try:
            prev_handler = signal.signal(signal.SIGINT, _sigint)
        except ValueError:
            prev_handler = None  # not on main thread

    start_train = time.time()

    try:
        for epoch in range(start_epoch, num_epochs + 1):
            start = time.time()
            lr0 = lr_schedules[0].get_learning_rate(epoch)
            lr1 = lr_schedules[1].get_learning_rate(epoch)

            losses = []
            if pools is not None:
                # whole epoch = ONE device program (lax.scan over batches).
                # scene order is keyed by (seed, epoch) — a resumed run
                # sees the same batch order an uninterrupted run would
                batch_rng = np.random.default_rng((seed + 1, epoch))
                scene_batches = epoch_scene_batches(
                    num_scenes, cfg.scenes_per_batch, batch_rng)
                scene_arr = np.asarray(scene_batches, dtype=np.int32)
                if mesh is not None:
                    # split each batch's scenes over the data axis (the
                    # scan axis 0 stays unsharded); uneven splits are
                    # handled by GSPMD but waste the ragged device
                    from jax.sharding import PartitionSpec as P
                    from ..parallel.mesh import put_with_spec
                    spec = P(None, "data") if scene_arr.shape[1] % n_dev == 0 else P()
                    scene_arr = put_with_spec(mesh, scene_arr, spec)
                else:
                    scene_arr = jnp.asarray(scene_arr)
                epoch_key = jax.random.fold_in(run_key, epoch)
                state, losses_arr = train_epoch(
                    state, pools, scene_arr,
                    epoch_key, jnp.float32(lr0), jnp.float32(lr1),
                    jnp.float32(epoch), cfg,
                )
                packed = np.asarray(_epoch_metrics(state, losses_arr))
                n_l = losses_arr.shape[0]
                losses = list(packed[:n_l])
                epoch_metrics = packed[n_l:]
            else:
                for batch_idx, (batch, scene_idx) in enumerate(loader.epoch_batches(epoch)):
                    step_key = jax.random.fold_in(jax.random.fold_in(run_key, epoch), batch_idx)
                    state, batch_loss = train_step_batch(
                        state, jnp.asarray(batch), jnp.asarray(scene_idx), step_key,
                        jnp.float32(lr0), jnp.float32(lr1), jnp.float32(epoch), cfg,
                    )
                    losses.append(batch_loss)
                # pack losses + metrics into ONE device read like the
                # pools path (each float() sync costs an RTT)
                if losses:
                    packed = np.asarray(_epoch_metrics(state, jnp.stack(losses)))
                    n_l = len(losses)
                    losses = list(packed[:n_l])
                    epoch_metrics = packed[n_l:]
                else:
                    epoch_metrics = np.asarray(_epoch_metrics(state, jnp.zeros(0)))

            # Block once per epoch for the loss values (steps ran async)
            losses = [float(l) for l in losses]
            loss_log.extend(losses)

            seconds_elapsed = time.time() - start
            timing_log.append(seconds_elapsed)
            tot_time = time.time() - start_train + 1e-9
            avg = tot_time / max(epoch - start_epoch + 1, 1)
            eta = str(datetime.timedelta(seconds=round(avg * (num_epochs - epoch))))
            sps = (len(losses) * cfg.scenes_per_batch
                   * (2 * (cfg.samples_per_scene // 2)) / max(seconds_elapsed, 1e-9))
            logger.info(
                "Finished %d (%d/%d) [%.2f%%] in %s (%.2fs/epoch, %.2fM samples/s) loss %.5f",
                epoch, epoch, num_epochs, epoch / num_epochs * 100, eta, avg,
                sps / 1e6, float(np.mean(losses)) if losses else float("nan"))

            lr_log.append([s.get_learning_rate(epoch) for s in lr_schedules])
            lat_mag_log.append(float(epoch_metrics[0]))
            for name, norm in zip(_param_names(state.params), epoch_metrics[1:]):
                param_mag_log.setdefault(name, []).append(float(norm))

            if epoch in checkpoints:
                save_checkpoints(epoch)
            if epoch % log_frequency == 0:
                save_latest(epoch)
                ckpt.save_logs(experiment_directory, loss_log, lr_log, timing_log,
                               lat_mag_log, param_mag_log, epoch)
            if stop_requested["flag"]:
                save_latest(epoch)
                ckpt.save_logs(experiment_directory, loss_log, lr_log, timing_log,
                               lat_mag_log, param_mag_log, epoch)
                break
        else:
            # loop ran to completion: persist the final epoch even when
            # NumEpochs is not a multiple of log_frequency (otherwise
            # `latest` lags behind the returned state)
            if num_epochs >= start_epoch and num_epochs % log_frequency != 0:
                save_latest(num_epochs)
                ckpt.save_logs(experiment_directory, loss_log, lr_log,
                               timing_log, lat_mag_log, param_mag_log,
                               num_epochs)
    finally:
        if prev_handler is not None:
            signal.signal(signal.SIGINT, prev_handler)

    return state
