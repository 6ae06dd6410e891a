"""The training orchestrator — epochs, logging, checkpoints, validation.

Single-controller SPMD replacement for the reference's per-GPU process
spawn + DDP loop (train_distributed.py:159-264): one Python process drives
the whole mesh; rank-0-only logic becomes `jax.process_index() == 0` on
multi-host setups.

Parity behaviors:
- auto-resume from the highest-numbered checkpoint (190-195)
- loss scalars averaged over the logging window every `log_every` iters
  (238-243), checkpoints every `saving_interval * len(loader)` iters
  (248-249), validation every `valid_interval * len(loader)` (252-253)
- validation logs enhanced/noisy/target audio at `example_index` (137-141)
- optional validate-once-before-train (209-210)
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import numpy as np

from eabnet_tpu.config import ExperimentConfig
from eabnet_tpu.data import BatchLoader, make_dataset
from eabnet_tpu.dsp import stft_to_wav
from eabnet_tpu.models.eabnet import to_reference_layout
from eabnet_tpu.parallel import data_sharding, make_mesh, replicate
from eabnet_tpu.train.checkpoint import (
    latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
    save_config,
)
from eabnet_tpu.train.loggers import TrainLogger, num_params
from eabnet_tpu.train.step import (
    create_train_state,
    make_eval_step,
    make_train_step,
)


def _is_chief() -> bool:
    return jax.process_index() == 0


def _all_processes_mean(local_sum: float, local_count: float) -> float:
    """Global mean across hosts (the reference's all_reduce of the val
    loss, train_distributed.py:119-120). No-op on a single process."""
    if jax.process_count() == 1:
        return local_sum / max(local_count, 1.0)
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(
        np.array([local_sum, local_count])
    )  # (n_processes, 2)
    total = gathered.sum(axis=0)
    return float(total[0] / max(float(total[1]), 1.0))


def validate(cfg, state, eval_step, val_loader, logger, step):
    """Validation pass: per-process shard of the val set, globally
    mean-reduced loss + audio examples
    (reference: evaluate, train_distributed.py:98-156)."""
    losses = []
    for i, (noisy, target, n_samples) in enumerate(val_loader.epoch(0)):
        l, esti = eval_step(state, noisy, target, n_samples)
        losses.append(float(l["final"]))
        if _is_chief() and i in cfg.train.example_index:
            esti_wav = np.asarray(
                stft_to_wav(to_reference_layout(esti), cfg.stft)
            )[0]
            logger.audio(f"audio{i}/estimated", esti_wav, step, cfg.stft.sr)
            logger.audio(f"audio{i}/noisy", np.mean(noisy[0], axis=0), step,
                         cfg.stft.sr)
            logger.audio(f"audio{i}/target", target[0], step, cfg.stft.sr)
            mag = np.linalg.norm(np.asarray(esti[0]), axis=-1)  # (T, F)
            logger.spectrogram(f"spec{i}/estimated", mag, step)
    mean_loss = (
        _all_processes_mean(float(np.sum(losses)), float(len(losses)))
        if losses or jax.process_count() > 1
        else float("nan")
    )
    if _is_chief():
        logger.scalars("valid", {"valid_loss": mean_loss}, step)
    return mean_loss


def train(cfg: ExperimentConfig, max_steps: Optional[int] = None) -> None:
    """Full training run."""
    chief = _is_chief()
    if chief:
        save_config(cfg, cfg.train.exp_root)
    logger = TrainLogger(cfg.train.checkpoint_dir, enabled=chief)

    if cfg.train.fixed_seed:
        np.random.seed(cfg.train.seed)
    rng = jax.random.key(cfg.train.seed)

    # use the most devices that evenly divide the global batch
    devices = jax.devices()
    n_dev = max(
        k for k in range(1, len(devices) + 1)
        if cfg.train.batch_size % k == 0
    )
    mesh = make_mesh(cfg.train.mesh_axes, devices[:n_dev])
    model, state = create_train_state(cfg, rng)
    if chief:
        print(f"model parameters: {num_params(state.params):,}")
        print(f"mesh: {dict(mesh.shape)} ({mesh.size} devices)")

    # auto-resume
    resume_epoch = -1
    ckpt = latest_checkpoint(cfg.train.checkpoint_dir)
    if ckpt is not None:
        state, resume_epoch = load_checkpoint(ckpt, state, cfg)
        if chief:
            print(f"resumed from {ckpt} (iter {int(state.step)}, "
                  f"epoch {resume_epoch})")

    state = jax.device_put(state, replicate(mesh))
    sharding = data_sharding(mesh)

    train_ds, val_ds = make_dataset(
        cfg.data, mics=cfg.model.eabnet.M, seed=cfg.train.seed
    )
    pad_multiple = max(1, int(cfg.data.pad_to_seconds * cfg.stft.sr))

    # device-offloaded online synthesis: "parts" fuses the room
    # propagation into the train step; "scene" additionally keeps the
    # corpus device-resident and ships scene parameters only
    mix_mode = {True: "loader", False: None}.get(
        cfg.data.device_mix, cfg.data.device_mix)
    batch_kind = mix_mode if mix_mode in ("parts", "scene") else "wav"
    scene_dims = None
    rir_pad = 0
    step_extras = ()
    if batch_kind != "wav" and hasattr(train_ds, "opt"):
        from eabnet_tpu.data.scene_mix import scene_static_dims

        try:
            scene_dims = scene_static_dims(
                train_ds.opt, cfg.data.clip_seconds)
            # one static RIR shape for the whole run: every distinct
            # bucket would cost a full train-step recompile
            rir_pad = scene_dims["l_rir"]
        except ValueError:
            if batch_kind == "scene":
                raise
    if batch_kind == "scene":
        from eabnet_tpu.data.scene_mix import load_corpus_int16

        if jax.process_count() > 1:
            raise NotImplementedError(
                "device_mix='scene' is single-controller for now (the "
                "replicated corpus is placed with a process-local "
                "device_put); use device_mix='parts' on multi-process "
                "meshes")
        fs = int(train_ds.opt["audio"]["fs"])
        corpus = tuple(
            jax.device_put(
                load_corpus_int16(root, names, fs), replicate(mesh))
            for root, names in (
                (train_ds.speech_root, train_ds.speech_list),
                (train_ds.noise_root, train_ds.noise_list),
            )
        )
        step_extras = corpus
        if chief:
            nbytes = sum(int(np.prod(c.shape)) * 2 for c in corpus)
            print(f"scene mode: device-resident corpus "
                  f"{corpus[0].shape[0]} speech + {corpus[1].shape[0]} "
                  f"noise files ({nbytes / 1e6:.0f} MB, replicated)")

    train_loader = BatchLoader(
        train_ds, cfg.train.batch_size, num_workers=cfg.data.num_workers,
        prefetch=cfg.data.prefetch, shuffle=True, seed=cfg.train.seed,
        shard_index=jax.process_index(), shard_count=jax.process_count(),
        pad_multiple=pad_multiple, device_mix=cfg.data.device_mix,
        mix_quantize=cfg.data.transfer_int16, rir_pad=rir_pad,
    )
    val_loader = (
        BatchLoader(val_ds, 1, shuffle=False, drop_last=False,
                    pad_multiple=pad_multiple,
                    shard_index=jax.process_index(),
                    shard_count=jax.process_count())
        if val_ds is not None
        else None
    )

    train_step = make_train_step(cfg, model, batch_kind=batch_kind,
                                 scene_dims=scene_dims)
    eval_step = make_eval_step(cfg, model)

    steps_per_epoch = max(1, len(train_loader))
    save_every = max(1, int(cfg.train.saving_interval * steps_per_epoch))
    valid_every = max(1, int(cfg.train.valid_interval * steps_per_epoch))

    current_iter = int(jax.device_get(state.step))
    if cfg.train.validate_once_before_train and val_loader is not None:
        validate(cfg, state, eval_step, val_loader, logger, current_iter)

    window = {}
    t_last = time.time()
    for epoch in range(resume_epoch + 1, cfg.train.total_epoch):
        for batch in train_loader.epoch(epoch):
            if batch_kind == "wav":
                noisy, target, n_samples = batch
                noisy = jax.device_put(noisy, sharding)
                target = jax.device_put(target, sharding)
                n_samples = jax.device_put(n_samples, sharding)
                state, losses = train_step(state, noisy, target,
                                           n_samples)
            else:
                batch = jax.device_put(batch, sharding)
                state, losses = train_step(state, batch, *step_extras)
            current_iter += 1

            if chief:
                for k, v in losses.items():
                    window.setdefault(k, []).append(float(v))
                if current_iter % cfg.train.log_every == 0:
                    means = {k: float(np.mean(v)) for k, v in window.items()}
                    dt = time.time() - t_last
                    sps = cfg.train.log_every / max(dt, 1e-9)
                    print(f"iter {current_iter} epoch {epoch} "
                          f"loss {means.get('final', float('nan')):.4f} "
                          f"({sps:.2f} it/s)")
                    logger.scalars("loss", means, current_iter)
                    logger.scalars("perf", {"iters_per_sec": sps},
                                   current_iter)
                    window = {}
                    t_last = time.time()
                if current_iter % save_every == 0:
                    save_checkpoint(state, epoch, cfg.train.checkpoint_dir)
            if val_loader is not None and current_iter % valid_every == 0:
                validate(cfg, state, eval_step, val_loader, logger,
                         current_iter)
            if max_steps is not None and current_iter >= max_steps:
                if chief:
                    save_checkpoint(state, epoch, cfg.train.checkpoint_dir)
                train_loader.close()
                logger.close()
                return
    if chief:
        save_checkpoint(state, cfg.train.total_epoch - 1,
                        cfg.train.checkpoint_dir)
    train_loader.close()
    logger.close()
