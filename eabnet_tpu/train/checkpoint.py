"""Checkpointing with the reference's `<iteration>` auto-resume convention.

The reference writes `{model, optimizer, iteration, epoch}` to `<iter>.pth`
and auto-resumes from the highest-numbered file (reference:
train_distributed.py:30-65, 190-195). Here checkpoints are msgpack-encoded
flax pytrees written atomically as `<iter>.ckpt`, alongside the frozen
`config.json` (the analog of the pickled argparse namespace,
train_distributed.py:360-361). Reference `.pth` checkpoints are consumed
transparently via the torch converter.
"""

from __future__ import annotations

import glob
import json
import os
import re
import tempfile
from typing import Optional, Tuple

import jax
import numpy as np
from flax import serialization

from eabnet_tpu.config import ExperimentConfig


def save_checkpoint(state, epoch: int, directory: str) -> str:
    """Write state (+epoch) as `<iter>.ckpt` atomically; returns the path."""
    os.makedirs(directory, exist_ok=True)
    step = int(jax.device_get(state.step))
    payload = {
        "state": jax.device_get(state),
        "epoch": np.int64(epoch),
    }
    data = serialization.to_bytes(payload)
    path = os.path.join(directory, f"{step}.ckpt")
    fd, tmp = tempfile.mkstemp(dir=directory, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return path


def save_params(params, directory: str, step: int) -> str:
    """Write a params-only release artifact as `<step>.params` (atomic).

    A third of the size of a full training checkpoint (no Adam moments) —
    the format for shipping trained models. Loadable everywhere a full
    checkpoint is (inference, eval, resume-with-fresh-optimizer), mirroring
    how reference `.pth` files without optimizer state are consumed
    (reference: train_distributed.py:48-57 degrades the same way)."""
    os.makedirs(directory, exist_ok=True)
    data = serialization.to_bytes({"params": jax.device_get(params)})
    path = os.path.join(directory, f"{int(step)}.params")
    fd, tmp = tempfile.mkstemp(dir=directory, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return path


def latest_checkpoint(directory: str) -> Optional[str]:
    """Highest-iteration checkpoint in the directory (auto-resume policy of
    the reference, train_distributed.py:190-195). Also recognizes reference
    `.pth` files so training can resume *from a torch run*, and params-only
    `.params` release artifacts. A full `.ckpt` wins over a `.params` at
    the same iteration (it carries the optimizer state)."""
    best, best_iter, best_rank = None, -1, -1
    rank = {"ckpt": 2, "pth": 1, "params": 0}
    for ext in rank:
        for path in glob.glob(os.path.join(directory, f"*.{ext}")):
            m = re.match(r"(\d+)\.(ckpt|pth|params)$",
                         os.path.basename(path))
            if not m:
                continue
            it, r = int(m.group(1)), rank[m.group(2)]
            if (it, r) > (best_iter, best_rank):
                best, best_iter, best_rank = path, it, r
    if (best is not None and best.endswith(".params")
            and glob.glob(os.path.join(directory, "*.ckpt"))):
        # a params-only artifact outranks full .ckpt files by iteration:
        # resuming from it silently resets Adam moments — make it visible
        import warnings

        warnings.warn(
            f"auto-resume selected params-only {os.path.basename(best)} "
            f"over lower-iteration .ckpt files in {directory}; optimizer "
            f"state will be reinitialized",
            stacklevel=2,
        )
    return best


def load_checkpoint(path: str, state, cfg: ExperimentConfig) -> Tuple:
    """Restore (state, epoch) from `<iter>.ckpt` or a reference `.pth`.

    For `.pth`: model params come through the torch converter; the optimizer
    state is reinitialized (torch Adam moments don't map onto optax layout).
    For `.params` (release artifact from :func:`save_params`): params only,
    step from the filename, fresh optimizer state.
    """
    if path.endswith(".params"):
        with open(path, "rb") as f:
            data = f.read()
        template = {"params": jax.device_get(state.params)}
        params = serialization.from_bytes(template, data)["params"]
        m = re.match(r"(\d+)\.params$", os.path.basename(path))
        step = int(m.group(1)) if m else 0
        state = state.replace(step=np.asarray(step, np.int32),
                              params=params)
        return state, 0
    if path.endswith(".pth"):
        from eabnet_tpu.utils.convert_torch import load_torch_checkpoint

        import torch

        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        params = load_torch_checkpoint(path, cfg.model)["params"]
        step = int(ckpt.get("iteration", 0))
        epoch = int(ckpt.get("epoch", 0))
        state = state.replace(
            step=np.asarray(step, np.int32), params=params
        )
        return state, epoch

    with open(path, "rb") as f:
        data = f.read()
    template = {"state": jax.device_get(state), "epoch": np.int64(0)}
    payload = serialization.from_bytes(template, data)
    return payload["state"], int(payload["epoch"])


def save_config(cfg: ExperimentConfig, exp_root: str) -> None:
    os.makedirs(exp_root, exist_ok=True)
    cfg.save(os.path.join(exp_root, "config.json"))


def load_config(exp_root: str) -> ExperimentConfig:
    return ExperimentConfig.load(os.path.join(exp_root, "config.json"))
