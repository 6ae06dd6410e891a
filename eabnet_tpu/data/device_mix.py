"""Device-side room propagation for online data synthesis.

The host-side hot loop of online training data is the FFT convolution of
dry sources with their RIRs (reference hot loop:
dataset/mcse_dataset.py:52-260 via pyroomacoustics' room.simulate). The C++
ISM engine makes RIR *synthesis* cheap; this module moves the remaining
cost — `sum_s source_s (*) rir_{s,m}` per mic plus the anechoic clean-target
convolution — onto the accelerator as one jitted batched program:

    noisy[b,m] = irfft( sum_s rfft(src[b,s]) * rfft(rir[b,s,m]) )
    clean[b]   = irfft( rfft(src[b,0]) * rfft(h_direct[b]) )

Shapes are static (sources padded to ``s_max``, RIRs zero-padded to a
bucket length), so the program compiles once. Host workers keep producing
*parts* (dry scaled signals + RIRs) which are cheap; the device does the
FLOPs-heavy propagation — the loader stays ahead of a batch-16 train step
without an army of workers (tools/bench_datapipe.py measures this).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Sequence, Tuple  # noqa: F401

import numpy as np

from eabnet_tpu.data.rir import direct_path_rir


def mix_parts(batch, n: int):
    """Pure-jnp room propagation of a collated parts batch — callable
    INSIDE a jitted program (the fused train step embeds it so the mixed
    batch never leaves HBM; ``device_mix_batch`` wraps it standalone).

    ``batch`` keys: sources (B,S,n) f32|int16, rirs (B,S,M,L) f32|int16,
    h_direct (B,L) f32, and per-tensor scales src_scale (B,S) /
    rir_scale (B,S,M) when the int16 transport is used
    (``collate_parts(quantize=True)``). Returns (noisy (B,M,n) f32,
    clean (B,n) f32).
    """
    import jax.numpy as jnp

    sources = batch["sources"]
    rirs = batch["rirs"]
    if sources.dtype == jnp.int16:
        sources = sources.astype(jnp.float32) * (
            batch["src_scale"][:, :, None] / 32767.0
        )
    if rirs.dtype == jnp.int16:
        rirs = rirs.astype(jnp.float32) * (
            batch["rir_scale"][:, :, :, None] / 32767.0
        )
    l_rir = rirs.shape[-1]
    nfft = 1
    while nfft < n + l_rir - 1:
        nfft *= 2
    s_f = jnp.fft.rfft(sources, nfft, axis=-1)          # (B,S,F)
    h_f = jnp.fft.rfft(rirs, nfft, axis=-1)             # (B,S,M,F)
    acc = jnp.einsum("bsf,bsmf->bmf", s_f, h_f)
    noisy = jnp.fft.irfft(acc, nfft, axis=-1)[..., :n]
    d_f = jnp.fft.rfft(batch["h_direct"], nfft, axis=-1)  # (B,F)
    clean = jnp.fft.irfft(s_f[:, 0] * d_f, nfft, axis=-1)[..., :n]
    return noisy.astype(jnp.float32), clean.astype(jnp.float32)


@functools.lru_cache(maxsize=8)
def _mixer(n: int, l_rir: int, s_max: int, m: int):
    import jax

    @jax.jit
    def mix(sources, rirs, h_direct):
        return mix_parts(
            {"sources": sources, "rirs": rirs, "h_direct": h_direct}, n
        )

    return mix


def synthesize_item_parts(
    opt: Dict,
    clip_seconds: Optional[float],
    speech_path: str,
    noise_paths: Sequence[str],
    seed: int,
    rir_backend: str = "auto",
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Host half of online synthesis: everything except the convolutions.

    Returns (sources (S, n) dry scaled signals with the speech first,
    rirs (S, M, L), h_direct (L2,)) for one scene. Mirrors
    ``synthesize_item`` (same sampling distributions and seeding) but stops
    before room propagation so the device can take over.
    """
    import os

    from eabnet_tpu.data.datasets import _read_noise_names, load_and_crop
    from eabnet_tpu.data.mixer import mix_at_snr
    from eabnet_tpu.data.scenes import sample_scene

    rng = np.random.default_rng(seed)
    fs = int(opt["audio"]["fs"])

    names = _read_noise_names(opt, noise_paths, rng)
    scene = sample_scene(opt, rng, n_noises_override=len(names))
    scene.noise_names = [os.path.basename(p) for p in names]
    scene.speech_name = os.path.basename(speech_path)

    clean = load_and_crop(speech_path, fs, clip_seconds, rng)
    noises = [
        load_and_crop(p, fs, clip_seconds if clip_seconds else
                      len(clean) / fs, rng)
        for p in names
    ]
    clean_dry, noises_dry = mix_at_snr(
        clean, noises, scene.snrs_db, scene.dbfs, fs
    )

    rir_fn = _resolve_rir_fn(rir_backend)
    p_mics = np.asarray(scene.p_mics, np.float64)
    srcs = [(scene.p_target, clean_dry)] + [
        (p, s) for p, s in zip(scene.p_noises, noises_dry)
    ]
    rirs = [
        rir_fn(scene.room_dim, p_src, p_mics, scene.e_absorption,
               scene.max_order, fs, method=scene.rir_method,
               rt60=scene.rt60, rng=rng)
        for p_src, _ in srcs
    ]
    h_direct = direct_path_rir(scene.p_target, p_mics[scene.ref_mic], fs)
    sources = np.stack([s for _, s in srcs]).astype(np.float32)
    l_max = max(h.shape[1] for h in rirs)
    rir_arr = np.zeros((len(rirs), p_mics.shape[0], l_max), np.float32)
    for i, h in enumerate(rirs):
        rir_arr[i, :, : h.shape[1]] = h
    return sources, rir_arr, h_direct.astype(np.float32)


def _resolve_rir_fn(backend: str):
    from eabnet_tpu.data.rir import shoebox_rir

    if backend in ("auto", "native"):
        try:
            from eabnet_tpu.data.rir_native import (
                native_available,
                shoebox_rir_native,
            )

            if native_available():
                return shoebox_rir_native
            if backend == "native":
                raise RuntimeError("native RIR engine not built")
        except ImportError:
            if backend == "native":
                raise
    return shoebox_rir


def collate_parts(
    parts: Sequence[Tuple[np.ndarray, np.ndarray, np.ndarray]],
    s_max: int = 6,
    rir_bucket: int = 4000,
    rir_pad: int = 0,
    quantize: bool = False,
) -> Dict[str, np.ndarray]:
    """Collate per-item parts into the static-shaped batch ``mix_parts``
    consumes.

    ``s_max`` bounds the source count (1 speech + up to ``s_max - 1``
    noises); RIR lengths are zero-padded up to a multiple of ``rir_bucket``
    samples — or to exactly ``rir_pad`` when given, which pins ONE jit
    shape for a whole training run (each distinct bucket costs a full
    train-step recompile). ``quantize`` ships sources and RIRs as int16
    with per-source / per-(source, mic) float scales: ~2x fewer
    host->device bytes at a -90 dB quantization floor (relative to each
    signal's own peak — below the int16 wav floor offline training
    already lives with).
    """
    b = len(parts)
    n = max(p[0].shape[1] for p in parts)
    m = parts[0][1].shape[1]
    l_rir = max(max(p[1].shape[2] for p in parts),
                max(p[2].shape[0] for p in parts))
    if rir_pad:
        if l_rir > rir_pad:
            raise ValueError(
                f"rir_pad={rir_pad} shorter than a rendered RIR ({l_rir} "
                "samples); raise rir_pad (it must cover 1.25*rt60_max "
                "plus the max propagation delay)")
        l_rir = rir_pad
    else:
        l_rir = ((l_rir + rir_bucket - 1) // rir_bucket) * rir_bucket

    sources = np.zeros((b, s_max, n), np.float32)
    rirs = np.zeros((b, s_max, m, l_rir), np.float32)
    h_direct = np.zeros((b, l_rir), np.float32)
    for i, (src, rr, hd) in enumerate(parts):
        s = min(src.shape[0], s_max)
        sources[i, :s, : src.shape[1]] = src[:s]
        rirs[i, :s, :, : rr.shape[2]] = rr[:s]
        h_direct[i, : hd.shape[0]] = hd
    batch = {"h_direct": h_direct,
             "lengths": np.full((b,), n, np.int32)}
    if not quantize:
        batch["sources"] = sources
        batch["rirs"] = rirs
        return batch
    src_scale = np.abs(sources).max(axis=-1)            # (B,S)
    rir_scale = np.abs(rirs).max(axis=-1)               # (B,S,M)
    with np.errstate(divide="ignore", invalid="ignore"):
        sq = np.where(src_scale[:, :, None] > 0,
                      sources / src_scale[:, :, None], 0.0)
        rq = np.where(rir_scale[:, :, :, None] > 0,
                      rirs / rir_scale[:, :, :, None], 0.0)
    batch["sources"] = np.round(sq * 32767.0).astype(np.int16)
    batch["src_scale"] = src_scale.astype(np.float32)
    batch["rirs"] = np.round(rq * 32767.0).astype(np.int16)
    batch["rir_scale"] = rir_scale.astype(np.float32)
    return batch


def device_mix_batch(
    parts: Sequence[Tuple[np.ndarray, np.ndarray, np.ndarray]],
    s_max: int = 6,
    rir_bucket: int = 4000,
) -> Tuple[np.ndarray, np.ndarray]:
    """Collate per-item parts and propagate the whole batch on-device as a
    standalone jitted program (loader-level offload; the fused train step
    calls ``mix_parts`` directly instead)."""
    batch = collate_parts(parts, s_max=s_max, rir_bucket=rir_bucket)
    n = batch["sources"].shape[-1]
    noisy, clean = _mixer(n, batch["rirs"].shape[-1], s_max,
                          batch["rirs"].shape[2])(
        batch["sources"], batch["rirs"], batch["h_direct"])
    return np.asarray(noisy), np.asarray(clean)
