"""Observability: TensorBoard scalars + audio artifacts, param/FLOPs info.

Mirrors the reference's TensorBoard usage (train_distributed.py:165,
238-243: loss/{eabnet,postnet,final} scalars every 50 iters,
valid/valid_loss, enhanced/noisy/target audio examples at fixed indices)
and its param counting (EaBNet.py:653-659), plus `jax.profiler` trace
hooks the reference lacks (SURVEY.md §5 tracing gap).
"""

from __future__ import annotations

import contextlib
import os
from typing import Dict, Optional

import jax
import numpy as np


class TrainLogger:
    """Lazy TensorBoard writer (only materializes on first use, like the
    reference's `writer or SummaryWriter(...)` pattern)."""

    def __init__(self, logdir: str, enabled: bool = True):
        self.logdir = logdir
        self.enabled = enabled
        self._writer = None

    @property
    def writer(self):
        if self._writer is None and self.enabled:
            from tensorboardX import SummaryWriter

            os.makedirs(self.logdir, exist_ok=True)
            self._writer = SummaryWriter(self.logdir)
        return self._writer

    def scalars(self, tag_prefix: str, values: Dict[str, float],
                step: int) -> None:
        if not self.enabled:
            return
        for k, v in values.items():
            self.writer.add_scalar(f"{tag_prefix}/{k}", float(v), step)

    def audio(self, tag: str, wav: np.ndarray, step: int, sr: int) -> None:
        if not self.enabled:
            return
        wav = np.asarray(wav, np.float32).reshape(1, -1)
        peak = np.abs(wav).max()
        if peak > 1.0:
            wav = wav / peak
        self.writer.add_audio(tag, wav, step, sr)

    def spectrogram(self, tag: str, spec_mag: np.ndarray, step: int) -> None:
        """Log a (T, F) magnitude spectrogram as an inferno-colormapped
        image (the reference's commented-out `coloring`,
        train_distributed.py:100-105, 143-145)."""
        if not self.enabled:
            return
        import matplotlib

        s = np.log(np.abs(spec_mag) + 1e-6)
        s = (s - s.min()) / (s.max() - s.min() + 1e-12)
        cmap = matplotlib.colormaps["inferno"]
        img = cmap(s.T[::-1])[..., :3].transpose(2, 0, 1)  # (3, F, T)
        self.writer.add_image(tag, img.astype(np.float32), step)

    def close(self) -> None:
        if self._writer is not None:
            self._writer.close()


def num_params(params) -> int:
    """Trainable parameter count (reference: numParams, EaBNet.py:653-659)."""
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


def flops_estimate(fn, *args) -> Optional[float]:
    """XLA cost-analysis FLOPs of a jitted callable, if available."""
    try:
        lowered = jax.jit(fn).lower(*args)
        analysis = lowered.compile().cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        return float(analysis.get("flops", float("nan")))
    except Exception:
        return None


@contextlib.contextmanager
def profiler_trace(logdir: Optional[str]):
    """`jax.profiler` trace context; no-op when logdir is None."""
    if logdir is None:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
