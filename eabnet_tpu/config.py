"""Typed configuration for the whole framework.

The reference spreads ~60 argparse flags across five entry points
(reference: train_distributed.py:272-354, test.py:216-269, EaBNet.py:820-845,
GaGNet.py:675-698). Here everything collapses into a few frozen dataclasses
that serialize to/from JSON, while the array-geometry JSON settings files of
the reference (dataset/mcse_dataset_settings*.json) remain consumable as-is by
the data layer (see eabnet_tpu/data/scenes.py).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Tuple


def _astuple(x) -> Tuple[int, int]:
    return tuple(int(v) for v in x)  # type: ignore[return-value]


@dataclass(frozen=True)
class StftConfig:
    """Signal front-end (reference: train_distributed.py:68-95).

    16 kHz audio, 320-point FFT, 20 ms window, 10 ms hop -> 161 bins,
    sqrt power compression on the magnitude.
    """

    sr: int = 16000
    fft_num: int = 320
    win_size: float = 0.020   # seconds
    win_shift: float = 0.010  # seconds
    compression: float = 0.5  # magnitude exponent (sqrt power compression)
    # invert the power compression before waveform reconstruction. The
    # reference iSTFTs the compressed spectrum directly
    # (train_distributed.py:128-129, test.py:189-190, enhance.py:59-61),
    # which spectrally warps every enhanced wav: a PERFECT estimate
    # reconstructs at ~+5 dB SI-SDR vs the clean target, while inverting
    # the compression reconstructs at ~+114 dB (measured, round 2). True
    # emulates the reference exactly where it matters (the model still
    # predicts compressed spectra); set False only to reproduce the
    # reference's compressed-domain waveforms bit-for-bit.
    decompress_output: bool = True

    @property
    def win_samples(self) -> int:
        return int(self.win_size * self.sr)

    @property
    def hop_samples(self) -> int:
        return int(self.win_shift * self.sr)

    @property
    def freq_bins(self) -> int:
        return self.fft_num // 2 + 1

    def num_frames(self, num_samples: int) -> int:
        # center=True framing: reflect-pad fft_num//2 on both sides.
        return 1 + num_samples // self.hop_samples


@dataclass(frozen=True)
class EaBNetConfig:
    """EaBNet beamformer hyperparameters (reference: EaBNet.py:10-27)."""

    k1: Tuple[int, int] = (2, 3)
    k2: Tuple[int, int] = (1, 3)
    c: int = 64
    M: int = 9                   # number of microphones
    embed_dim: int = 64
    kd1: int = 5
    cd1: int = 64
    d_feat: int = 256
    p: int = 6                   # TCMs per group (dilations 2**0 .. 2**(p-1))
    q: int = 3                   # number of TCM groups (outputs accumulated)
    is_causal: bool = True
    is_u2: bool = True
    bf_type: str = "lstm"        # "lstm" | "cnn"
    topo_type: str = "mimo"      # "mimo" | "miso"
    intra_connect: str = "cat"   # "cat" | "add"
    norm_type: str = "IN"        # "BN" | "IN" | "cLN" | "cLN-ref"
    hid_node: int = 64           # LSTM hidden size in the beamforming head
    bf_impl: str = "scan"        # "scan" | "pallas" (fused TPU kernel)
    # squeezed-TCN stack implementation: "pallas" fuses each whole TCM
    # group (fwd + custom-VJP bwd) into one activation-resident kernel
    # (kernels/tcm_chain.py); auto-falls back to "xla" for norm != IN.
    # Measured parity with XLA's lowering on v5e (2.01 vs 2.07 ms
    # fwd+bwd, see ROOFLINE.md) — the TCN stage is at its hardware
    # floor, so the simpler XLA path stays the default
    tcn_impl: str = "xla"        # "xla" | "pallas"
    # selective rematerialization of the LSTM-BF scan body: trades ~2x
    # gate recompute in the backward for NOT storing the per-step
    # activation blocks that set the single-chip batch ceiling
    # (ROOFLINE.md: batch-24 OOM pinned on this head)
    bf_remat: bool = False
    # coarse selective remat of the whole U²/UNet encoder + decoder:
    # their INTERNAL full-resolution conv activations (the nested
    # mini-UNet enco/deco intermediates) are recomputed in the backward
    # instead of stored; the skip tensors (kept alive for the decoder
    # anyway) and the bottleneck remain stored. The next HBM binder
    # after bf_remat (ROOFLINE.md: batch-32 OOM pinned on encoder
    # activations)
    enc_remat: bool = False

    def __post_init__(self):
        object.__setattr__(self, "k1", _astuple(self.k1))
        object.__setattr__(self, "k2", _astuple(self.k2))
        assert self.bf_type in ("lstm", "cnn")
        assert self.topo_type in ("mimo", "miso")
        assert self.intra_connect in ("cat", "add")
        assert self.norm_type in ("BN", "IN", "cLN", "cLN-ref")


@dataclass(frozen=True)
class GaGNetConfig:
    """GaGNet post-filter hyperparameters (reference: GaGNet.py:6-24)."""

    cin: int = 2
    k1: Tuple[int, int] = (2, 3)
    k2: Tuple[int, int] = (1, 3)
    c: int = 64
    kd1: int = 3
    cd1: int = 64
    d_feat: int = 256
    p: int = 2                   # TCN groups per glance/gaze block
    q: int = 3                   # number of glance-gaze modules
    dilas: Tuple[int, ...] = (1, 2, 5, 9)
    fft_num: int = 320
    is_u2: bool = True
    is_causal: bool = True
    is_squeezed: bool = False
    acti_type: str = "sigmoid"   # "sigmoid" | "tanh" | "relu"
    intra_connect: str = "cat"
    # the reference GaGNet only offers BN/IN (GaGNet.py:563-590); cLN is a
    # framework extension enabling exact streaming of the post-filter
    norm_type: str = "IN"        # "BN" | "IN" | "cLN"
    # run each stage's independent glance/gaze TCN stacks as one stacked
    # (vmapped) computation — same params, same math, ~3x fewer ops
    # (models/gagnet_fused.py); auto-falls back to the unfused modules for
    # norm_type "BN" (running stats don't vmap). Measured a wash on v5e
    # (21.2 vs 21.6 ms fwd+bwd, bf16 batch 8): within one XLA program the
    # stage is HBM-bound, not op-count-bound — so the simpler unfused
    # path stays the default
    fused_stages: bool = False
    # squeezed-TCN stack implementation (see EaBNetConfig.tcn_impl)
    tcn_impl: str = "xla"        # "xla" | "pallas"
    # coarse selective remat of the encoder (see EaBNetConfig.enc_remat;
    # GaGNet's encoder carries the same full-T×F c=64 conv activations)
    enc_remat: bool = False

    def __post_init__(self):
        object.__setattr__(self, "k1", _astuple(self.k1))
        object.__setattr__(self, "k2", _astuple(self.k2))
        object.__setattr__(self, "dilas", tuple(int(d) for d in self.dilas))
        assert self.acti_type in ("sigmoid", "tanh", "relu")
        assert self.norm_type in ("BN", "IN", "cLN", "cLN-ref")

    @property
    def freq_bins(self) -> int:
        return self.fft_num // 2 + 1


@dataclass(frozen=True)
class ComposedConfig:
    """EaBNet -> GaGNet composed model (reference: EaBNet.py:127-155)."""

    eabnet: EaBNetConfig = field(default_factory=EaBNetConfig)
    gagnet: GaGNetConfig = field(default_factory=GaGNetConfig)
    ref_mic: int = 0
    freeze_eabnet: bool = False


@dataclass(frozen=True)
class DataConfig:
    """Data synthesis / loading configuration.

    `mcse_settings` points at a reference-compatible geometry JSON
    (reference: dataset/mcse_dataset_settings_v2.json).
    """

    dataset: str = "mcse"             # "mcse" | "l3das23" | "fake"
    train_set: str = "online"         # "online" | "offline"
    speech_root: str = ""
    noise_root: str = ""
    speech_list: str = ""
    noise_list: str = ""
    mcse_settings: str = ""
    val_set: str = ""                 # dir with clean/ + noisy/ pairs
    clip_seconds: float = 6.0
    num_workers: int = 8
    prefetch: int = 4
    # variable-length batches are zero-padded up to a multiple of this many
    # seconds (shape buckets bound jit recompiles); true lengths flow into
    # the losses' frame masks
    pad_to_seconds: float = 1.0
    # online synthesis device offload (reference default data mode:
    # dataset/mcse_dataset.py:52-260, host DataLoader workers do all of
    # geometry + RIR + propagation). Modes, in increasing offload order:
    #   False    — full host synthesis (the reference's layout)
    #   "loader" (or legacy True) — workers emit dry sources + dense RIRs;
    #              the loader runs a standalone jitted FFT-propagation
    #              program per batch (data/device_mix.py)
    #   "parts"  — same worker output, but the propagation is FUSED INTO
    #              the jitted train step (no extra device<->host round
    #              trip; parts ship int16-quantized when transfer_int16)
    #   "scene"  — workers emit SCENE PARAMETERS only (image-source
    #              delays/amps, late-field histogram envelopes, corpus
    #              indices, gains, tail seeds) and the step reconstructs
    #              RIRs + propagates against a device-resident corpus —
    #              ~10x fewer host->device bytes than shipping audio
    #              (data/scene_mix.py)
    device_mix: object = False
    # ship offline-training batches as the wavs' native int16 samples and
    # dequantize on-device inside the jitted step — halves host->device
    # transfer bytes (the binding cost on narrow host links); lossless
    # for int16-sourced wavs
    transfer_int16: bool = False
    rir_backend: str = "auto"         # "auto" | "native" | "numpy"
    # l3das23 backend (reference: train_distributed.py:322-327)
    training_predictors_path: str = ""
    training_target_path: str = ""
    validation_predictors_path: str = ""
    validation_target_path: str = ""
    path_images: str = ""             # audio-visual mode when set
    path_csv_images: str = ""


@dataclass(frozen=True)
class TrainConfig:
    batch_size: int = 8               # global batch (split across devices)
    total_epoch: int = 100
    lr: float = 5e-4
    grad_clip: float = 1.0
    wav_len: float = 6.0              # seconds per training utterance
    saving_interval: float = 1.0      # in epochs-worth of iterations
    valid_interval: float = 1.0
    log_every: int = 50
    checkpoint_dir: str = "checkpoints"
    exp_root: str = "exp"
    fixed_seed: bool = False
    seed: int = 1
    example_index: Tuple[int, ...] = (0, 10, 20, 30, 40, 50, 60, 70, 80, 90)
    validate_once_before_train: bool = False
    compute_dtype: str = "float32"    # "float32" | "bfloat16"
    mesh_axes: Tuple[str, ...] = ("data",)
    remat: bool = False               # legacy alias for remat_policy="full"
    # rematerialization policy for the backward pass:
    #   ""      - store all activations (XLA default; fastest in clean
    #             A/B-interleaved v5e measurements)
    #   "dots"  - save matmul/conv outputs only, recompute elementwise ops
    #             (norms/gates/PReLU) — lower HBM watermark, ~10-20% slower
    #   "full"  - save only the layer boundary (max memory savings)
    remat_policy: str = ""
                                      # (trades FLOPs for HBM headroom)


@dataclass(frozen=True)
class ExperimentConfig:
    """Top-level experiment config; the analogue of the pickled argparse
    namespace the reference freezes next to checkpoints
    (reference: train_distributed.py:360-361, enhance.py:16-18)."""

    model: ComposedConfig = field(default_factory=ComposedConfig)
    stft: StftConfig = field(default_factory=StftConfig)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)

    # ------------------------------------------------------------------ io
    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @classmethod
    def from_json(cls, text: str) -> "ExperimentConfig":
        return cls.from_dict(json.loads(text))

    @classmethod
    def from_dict(cls, d: dict) -> "ExperimentConfig":
        return cls(
            model=ComposedConfig(
                eabnet=EaBNetConfig(**d["model"]["eabnet"]),
                gagnet=GaGNetConfig(**d["model"]["gagnet"]),
                ref_mic=d["model"].get("ref_mic", 0),
                freeze_eabnet=d["model"].get("freeze_eabnet", False),
            ),
            stft=StftConfig(**d.get("stft", {})),
            data=DataConfig(**d.get("data", {})),
            train=TrainConfig(
                **{
                    k: (tuple(v) if k in ("example_index", "mesh_axes") else v)
                    for k, v in d.get("train", {}).items()
                }
            ),
        )

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            f.write(self.to_json())

    @classmethod
    def load(cls, path: str) -> "ExperimentConfig":
        with open(path) as f:
            return cls.from_json(f.read())


def replace(cfg, **kw):
    """dataclasses.replace that works on any of the frozen configs."""
    return dataclasses.replace(cfg, **kw)
