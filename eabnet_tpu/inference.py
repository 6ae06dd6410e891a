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
                 compute_dtype: str = "float32", mesh=None,
                 shard_freq: bool = False, pad_mode: str = "tail"):
        """``output`` selects the enhancement stage: "esti" = composed
        EaBNet + GaGNet refinement (the reference enhance.py's
        esti_stft), "esti0" = the bare EaBNet beamformer (what the
        reference's eval battery scores — test.py:160-165 loads EaBNet
        without the postnet).

        ``compute_dtype`` "bfloat16" runs the model's convs/matmuls on
        the MXU in bf16 (same cast scheme as the mixed-precision train
        step, train/step.py): stored f32 weights are cast at apply time,
        the STFT front-end and iSTFT reconstruction stay f32. Serving
        option — quality delta vs f32 measured in ROOFLINE.md.

        ``mesh`` (a ``jax.sharding.Mesh`` with a 'data' axis, e.g. from
        ``eabnet_tpu.parallel.make_mesh()``) turns on multi-chip batch
        serving: params replicate, batches shard over 'data', and
        ``enhance_batch``/``enhance_files`` pad the batch dimension up
        to the mesh size. The reference has no multi-device inference at
        all (enhance.py runs one file on one GPU); here the same jitted
        pipeline scales over ICI with no code change.

        ``shard_freq`` turns on FREQUENCY-axis model parallelism for
        latency (not throughput): with a mesh carrying a 'freq' axis
        (``make_mesh(("data", "freq"))``), the STFT tensor's F dimension
        is sharding-constrained over 'freq' and XLA GSPMD parallelizes
        the network along it — the LSTM-BF head's B*F recurrence lanes
        are fully independent (zero-communication split, and the
        recurrence is the single-stream latency floor, ROOFLINE.md), and
        freq is the model's only downsampled conv axis, so the conv
        stages shard with halo exchanges over ICI. Batch-1 latency then
        scales with the freq shards instead of being fixed by one chip.
        See ARCHITECTURE.md ("Frequency-sharded serving") for the
        latency model."""
        if output not in ("esti", "esti0"):
            raise ValueError(f"output must be 'esti' or 'esti0', "
                             f"got {output!r}")
        # pad_mode "tail" (default): guarantee every item a zero tail of
        # >= n_fft//2 + 1 samples before bucketing, so per-item outputs
        # are invariant to how much further batch padding extends them
        # (see enhance_batch). "reference": add NO tail — items whose
        # length is already a bucket multiple are featurized bit-
        # identically to the reference's own eval loop (torch.stft
        # center/reflect over the unpadded signal, test.py:126-212),
        # which is what the reference-stack certification requires
        # (tools/reference_stack_eval.py); the final ~n_fft/2 samples of
        # an output differ between the two modes.
        if pad_mode not in ("tail", "reference"):
            raise ValueError(f"pad_mode must be 'tail' or 'reference', "
                             f"got {pad_mode!r}")
        self.pad_mode = pad_mode
        if compute_dtype not in ("float32", "bfloat16", "int8w"):
            raise ValueError(f"compute_dtype must be 'float32', "
                             f"'bfloat16' or 'int8w', "
                             f"got {compute_dtype!r}")
        self.cfg = cfg
        self.model = build_model(cfg.model)
        self.output = output
        # int8w: weights-only int8 (per-output-channel symmetric scales)
        # stored in HBM; dequantized to bf16 inside the jitted program —
        # 4x parameter footprint cut, quality gated in
        # tests/test_quantize.py and measured on the released artifact
        # (ROOFLINE.md)
        self.int8w = compute_dtype == "int8w"
        if self.int8w:
            from eabnet_tpu.utils.quantize import quantize_weights_int8

            params = quantize_weights_int8(params)
        self.params = params
        self.compute_dtype = (jnp.float32 if compute_dtype == "float32"
                              else jnp.bfloat16)
        self.bucket = max(1, int(bucket_seconds * cfg.stft.sr))
        self.mesh = mesh
        self._freq_sharding = None
        if shard_freq:
            if mesh is None or "freq" not in mesh.shape:
                raise ValueError(
                    "shard_freq needs a mesh with a 'freq' axis, e.g. "
                    "make_mesh(('data', 'freq'))")
            from jax.sharding import NamedSharding, PartitionSpec

            # (B, T, F, M, 2): batch over 'data', frequency over 'freq'
            self._freq_sharding = NamedSharding(
                mesh, PartitionSpec("data", None, "freq"))
        if mesh is not None:
            from eabnet_tpu.parallel import data_sharding, replicate

            self._batch_quantum = int(mesh.shape["data"])
            self._jitted = jax.jit(
                self._enhance,
                in_shardings=(replicate(mesh), data_sharding(mesh)),
                out_shardings=data_sharding(mesh),
            )
        else:
            self._batch_quantum = 1
            self._jitted = jax.jit(self._enhance)

    def _enhance(self, params, noisy_wav: jnp.ndarray) -> jnp.ndarray:
        noisy_stft, _ = prepare_data(noisy_wav, None, self.cfg.stft)
        if self._freq_sharding is not None:
            # introduce the freq split here (F first exists post-STFT);
            # GSPMD propagates it through the network — lane-parallel
            # LSTM head, halo-exchanged freq convs — and gathers F back
            # for the iSTFT
            noisy_stft = jax.lax.with_sharding_constraint(
                noisy_stft, self._freq_sharding)
        if self.int8w:
            from eabnet_tpu.utils.quantize import dequantize_weights

            params = dequantize_weights(params, self.compute_dtype)
            noisy_stft = noisy_stft.astype(self.compute_dtype)
        elif self.compute_dtype != jnp.float32:
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
        return self.enhance_batch([noisy], mic_permutation)[0]

    def enhance_batch(self, wavs,
                      mic_permutation: Optional[list] = None):
        """Enhance a list of (M, N_i) wavs in one device batch.

        Items are right-padded to a common bucketed length, stacked, and
        the batch dimension is padded up to a multiple of the mesh's
        'data' axis (1 without a mesh) so the batch shards evenly over
        the devices; outputs are trimmed back to each item's length.

        Padding exactness: every item is guaranteed a zero tail of at
        least n_fft//2 + 1 samples before bucketing (the offline STFT
        reflect-pads its ends, dsp/stft.py; without the guaranteed tail,
        an item landing exactly on a bucket boundary would reflect real
        audio in a short batch but zeros in a longer one, silently
        changing its final ~10 ms). With the tail, any further padding
        is all-zero frames past the item's own zeros, which a
        TIME-CAUSAL model (causal convs + unidirectional LSTM + cLN/BN
        norms — the shipped configs) provably cannot see. Non-causal
        configs (is_causal=False) or IN norms (whole-utterance
        statistics) make outputs depend weakly on total padded length;
        batching such a model trades exact per-item reproducibility for
        throughput.
        """
        if not wavs:
            return []
        mics = {w.shape[0] for w in wavs}
        if len(mics) != 1:
            raise ValueError(
                f"all items in a batch must share a mic count, got {mics}"
            )
        if mic_permutation is not None:
            idx = np.asarray(mic_permutation)
            (m,) = mics
            if idx.ndim != 1 or idx.size == 0 or idx.min() < 0 \
                    or idx.max() >= m:
                raise ValueError(
                    f"mic_permutation {mic_permutation} out of range for "
                    f"{m}-mic input")
            wavs = [w[idx] for w in wavs]
        lengths = [w.shape[-1] for w in wavs]
        tail = (0 if self.pad_mode == "reference"
                else self.cfg.stft.fft_num // 2 + 1)
        padded = ((max(lengths) + tail + self.bucket - 1)
                  // self.bucket) * self.bucket
        batch = np.stack([
            np.pad(w, ((0, 0), (0, padded - w.shape[-1]))) for w in wavs
        ])
        q = self._batch_quantum
        b = len(wavs)
        b_pad = ((b + q - 1) // q) * q
        if b_pad != b:
            batch = np.pad(batch, ((0, b_pad - b), (0, 0), (0, 0)))
        out = np.asarray(self._jitted(self.params, jnp.asarray(batch)))
        return [out[i][:n] for i, n in enumerate(lengths)]

    def enhance_files(self, in_paths, out_paths,
                      mic_permutation: Optional[list] = None,
                      batch_size: Optional[int] = None) -> None:
        """Enhance many files in device batches (chunks of
        ``batch_size``, default = the mesh's 'data' axis size). Each
        chunk pads to its own longest item, so sorting the inputs by
        duration keeps the padding waste low."""
        if len(in_paths) != len(out_paths):
            raise ValueError("in_paths and out_paths must align")
        bs = batch_size or max(1, self._batch_quantum)
        for lo in range(0, len(in_paths), bs):
            chunk_in = in_paths[lo:lo + bs]
            wavs = []
            for p in chunk_in:
                sr, noisy = read_wav(p)
                if noisy.ndim == 1:
                    noisy = noisy[None]
                if sr != self.cfg.stft.sr:
                    noisy = resample(noisy, sr, self.cfg.stft.sr)
                wavs.append(noisy)
            outs = self.enhance_batch(wavs, mic_permutation)
            for path, wav in zip(out_paths[lo:lo + bs], outs):
                write_wav(path, self.cfg.stft.sr, wav, dtype="float")

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
                  compute_dtype: str = "float32",
                  mesh=None, shard_freq: bool = False) -> Enhancer:
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
                    compute_dtype=compute_dtype, mesh=mesh,
                    shard_freq=shard_freq)
