"""Offline enhancement API (the library behind the enhance CLI).

Loads a frozen experiment (config.json + newest checkpoint — or a reference
torch .pth) and exposes a jitted wav -> wav enhancer
(reference: enhance.py:14-63).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from eabnet_tpu.config import ExperimentConfig
from eabnet_tpu.dsp import prepare_data, stft_to_wav
from eabnet_tpu.models import build_model
from eabnet_tpu.models.eabnet import to_reference_layout
from eabnet_tpu.train.checkpoint import latest_checkpoint, load_checkpoint
from eabnet_tpu.train.step import create_train_state
from eabnet_tpu.utils.audio_io import read_wav, resample, write_wav


class Enhancer:
    """wav (M, N) -> enhanced wav (N,).

    Inputs are zero-padded up to a length bucket (1 s granularity by
    default) so a directory of arbitrary-length files compiles a handful of
    programs instead of one per file — compilation is expensive on TPU.
    """

    def __init__(self, cfg: ExperimentConfig, params,
                 bucket_seconds: float = 1.0, output: str = "esti",
                 compute_dtype: str = "float32"):
        """``output`` selects the enhancement stage: "esti" = composed
        EaBNet + GaGNet refinement (the reference enhance.py's
        esti_stft), "esti0" = the bare EaBNet beamformer (what the
        reference's eval battery scores — test.py:160-165 loads EaBNet
        without the postnet).

        ``compute_dtype`` "bfloat16" runs the model's convs/matmuls on
        the MXU in bf16 (same cast scheme as the mixed-precision train
        step, train/step.py): stored f32 weights are cast at apply time,
        the STFT front-end and iSTFT reconstruction stay f32. Serving
        option — quality delta vs f32 measured in ROOFLINE.md."""
        if output not in ("esti", "esti0"):
            raise ValueError(f"output must be 'esti' or 'esti0', "
                             f"got {output!r}")
        if compute_dtype not in ("float32", "bfloat16"):
            raise ValueError(f"compute_dtype must be 'float32' or "
                             f"'bfloat16', got {compute_dtype!r}")
        self.cfg = cfg
        self.model = build_model(cfg.model)
        self.params = params
        self.output = output
        self.compute_dtype = (jnp.bfloat16 if compute_dtype == "bfloat16"
                              else jnp.float32)
        self.bucket = max(1, int(bucket_seconds * cfg.stft.sr))
        self._jitted = jax.jit(self._enhance)

    def _enhance(self, params, noisy_wav: jnp.ndarray) -> jnp.ndarray:
        noisy_stft, _ = prepare_data(noisy_wav, None, self.cfg.stft)
        if self.compute_dtype != jnp.float32:
            params = jax.tree.map(
                lambda p: p.astype(self.compute_dtype), params
            )
            noisy_stft = noisy_stft.astype(self.compute_dtype)
        out = self.model.apply({"params": params}, noisy_stft)
        esti = out[self.output].astype(jnp.float32)
        return stft_to_wav(to_reference_layout(esti), self.cfg.stft)

    def __call__(self, noisy: np.ndarray,
                 mic_permutation: Optional[list] = None) -> np.ndarray:
        """``noisy`` (M, N) at the model sample rate. ``mic_permutation``
        reorders capture channels to the array-geometry order (the
        reference CLI's index_select, enhance.py:41-42)."""
        if mic_permutation is not None:
            noisy = noisy[np.asarray(mic_permutation)]
        n = noisy.shape[-1]
        padded = ((n + self.bucket - 1) // self.bucket) * self.bucket
        if padded != n:
            noisy = np.pad(noisy, ((0, 0), (0, padded - n)))
        wav = self._jitted(self.params, jnp.asarray(noisy)[None])
        return np.asarray(wav)[0][:n]

    def enhance_file(self, in_path: str, out_path: str,
                     mic_permutation: Optional[list] = None) -> None:
        sr, noisy = read_wav(in_path)
        if noisy.ndim == 1:
            noisy = noisy[None]
        if sr != self.cfg.stft.sr:
            noisy = resample(noisy, sr, self.cfg.stft.sr)
        out = self(noisy, mic_permutation)
        write_wav(out_path, self.cfg.stft.sr, out, dtype="float")


def load_enhancer(exp_root: str,
                  checkpoint: Optional[str] = None,
                  output: str = "esti",
                  compute_dtype: str = "float32") -> Enhancer:
    """Build an Enhancer from an experiment dir — either this framework's
    (config.json + *.ckpt) or a REFERENCE experiment directory
    (args.pickle + *.pth, the format frozen by train_distributed.py:360-361)
    — or from an explicit checkpoint path."""
    if os.path.exists(os.path.join(exp_root, "config.json")):
        cfg = ExperimentConfig.load(os.path.join(exp_root, "config.json"))
    elif os.path.exists(os.path.join(exp_root, "args.pickle")):
        from eabnet_tpu.utils.convert_args import load_reference_experiment

        cfg = load_reference_experiment(exp_root)
    else:
        raise FileNotFoundError(
            f"no config.json or args.pickle under {exp_root}"
        )
    _, state = create_train_state(cfg, jax.random.key(0))
    ckpt = checkpoint or latest_checkpoint(
        cfg.train.checkpoint_dir
        if os.path.isabs(cfg.train.checkpoint_dir)
        else os.path.join(exp_root, os.path.basename(
            cfg.train.checkpoint_dir))
    ) or latest_checkpoint(exp_root)
    if ckpt is None:
        raise FileNotFoundError(f"no checkpoint found under {exp_root}")
    state, _ = load_checkpoint(ckpt, state, cfg)
    return Enhancer(cfg, state.params, output=output,
                    compute_dtype=compute_dtype)
