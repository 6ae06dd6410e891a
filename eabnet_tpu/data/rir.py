"""Room impulse response engine.

Replaces the reference's pyroomacoustics C++ dependency
(dataset/audio_util.py:49-88) with a self-contained shoebox image-source
model (Allen & Berkley) plus an energy-matched stochastic diffuse tail for
the late reverberation:

- ``method='ism'``     : pure image sources up to ``max_order``;
- ``method='hybrid'``  : image sources to order 3 + a Sabine-matched
  exponentially-decaying noise tail. The reference's hybrid mode is
  ISM(3) + C++ ray tracing (audio_util.py:56-63); a stochastic tail with
  the same RT60 energy envelope is the established lightweight equivalent
  and keeps the data envelope (RT60 0.05-0.7 s) intact.

A vectorized numpy implementation is the reference path; a C++ engine with
identical semantics (eabnet_tpu/native) is used automatically when built —
RIR synthesis is the dominant host-side cost of online training data
(SURVEY.md §3.1 marks it the hot CPU loop).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import numpy as np

SPEED_OF_SOUND = 343.0
FDL = 81  # fractional-delay filter length (odd)


def inverse_sabine(rt60: float, room_dim: Sequence[float],
                   c: float = SPEED_OF_SOUND) -> Tuple[float, int]:
    """Sabine absorption + ISM order for a target RT60.

    Mirrors pyroomacoustics' ``inverse_sabine`` so reference-compatible
    settings JSONs produce the same (absorption, order) pairs: raises
    ValueError when the room is too large for the requested RT60
    (consumed by the sampling retry loop, dataset/mcse_dataset.py:196-204).
    """
    lx, ly, lz = [float(v) for v in room_dim]
    vol = lx * ly * lz
    surf = 2.0 * (lx * ly + lx * lz + ly * lz)
    e_abs = 24.0 * math.log(10.0) * vol / (c * surf * rt60)
    if e_abs > 1.0:
        raise ValueError("room too large for the requested rt60")
    max_order = max(0, math.ceil(c * rt60 / min(lx, ly, lz) - 1.0))
    return e_abs, max_order


def _frac_delay_filter(frac: np.ndarray) -> np.ndarray:
    """Hann-windowed sinc fractional-delay filters.

    frac: (K,) fractional parts in [0, 1) -> (K, FDL) filters centered at
    FDL//2 + frac.
    """
    n = np.arange(FDL)[None, :] - FDL // 2
    t = n - frac[:, None]
    h = np.sinc(t)
    win = 0.5 * (1.0 + np.cos(2.0 * np.pi * t / FDL))
    return h * win


def _image_sources(
    src: np.ndarray, room: np.ndarray, order: int
) -> Tuple[np.ndarray, np.ndarray]:
    """All image-source positions and reflection counts up to ``order``.

    Returns (positions (K, 3), n_reflections (K,)).
    """
    per_axis = []  # per axis: (coords, reflection counts)
    for ax in range(3):
        coords, refl = [], []
        lo = -(order + 1) // 2 - 1
        hi = order // 2 + 2
        for r in range(lo, hi + 1):
            for p in (0, 1):
                n_hits = abs(r - p) + abs(r)
                if n_hits > order:
                    continue
                coords.append((1 - 2 * p) * src[ax] + 2 * r * room[ax])
                refl.append(n_hits)
        per_axis.append((np.asarray(coords), np.asarray(refl)))

    cx, rx = per_axis[0]
    cy, ry = per_axis[1]
    cz, rz = per_axis[2]
    # outer product of the three axes, pruned by total order
    total = (
        rx[:, None, None] + ry[None, :, None] + rz[None, None, :]
    )
    keep = total <= order
    ix, iy, iz = np.nonzero(keep)
    pos = np.stack([cx[ix], cy[iy], cz[iz]], axis=1)
    return pos, total[keep]


def shoebox_rir(
    room_dim: Sequence[float],
    src: Sequence[float],
    mics: np.ndarray,
    e_absorption: float,
    max_order: int,
    fs: int,
    method: str = "ism",
    rt60: Optional[float] = None,
    rng: Optional[np.random.Generator] = None,
    c: float = SPEED_OF_SOUND,
) -> np.ndarray:
    """RIRs from one source to ``mics (M, 3)`` -> (M, L) float32.

    method='hybrid' caps the ISM at order 3 and appends a diffuse tail whose
    exponential envelope continues the image-source decay at the measured
    level (requires ``rt60`` and ``rng``).
    """
    room = np.asarray(room_dim, np.float64)
    src = np.asarray(src, np.float64)
    mics = np.atleast_2d(np.asarray(mics, np.float64))
    if mics.shape[0] == 3 and mics.shape[1] != 3:
        mics = mics.T  # accept (3, M)

    ism_order = min(max_order, 3) if method == "hybrid" else max_order
    beta = math.sqrt(max(0.0, 1.0 - e_absorption))
    pos, n_refl = _image_sources(src, room, ism_order)
    damp = beta ** n_refl  # (K,)

    m = mics.shape[0]
    rirs = []
    max_dist = 0.0
    for mi in range(m):
        d = np.linalg.norm(pos - mics[mi][None, :], axis=1)
        d = np.maximum(d, 1e-3)
        max_dist = max(max_dist, float(d.max()))
        amp = damp / (4.0 * np.pi * d)
        delay = d * fs / c  # in samples
        base = np.floor(delay).astype(np.int64)
        frac = delay - base
        filt = _frac_delay_filter(frac) * amp[:, None]
        length = int(base.max()) + FDL
        # scatter-add all filters at once via bincount on a left-padded
        # buffer (offset FDL//2 keeps all indices non-negative)
        idx = (base[:, None] + np.arange(FDL)[None, :]).ravel()
        h_pad = np.bincount(
            idx, weights=filt.ravel(), minlength=length + FDL // 2
        )
        rirs.append(h_pad[FDL // 2 :])

    length = max(len(h) for h in rirs)
    out = np.zeros((m, length), np.float32)
    for mi, h in enumerate(rirs):
        out[mi, : len(h)] = h

    if method == "hybrid" and rt60 is not None and max_order > 3:
        out = apply_diffuse_tail(out, max_dist, rt60, fs, rng, c,
                                 volume=float(np.prod(room)))
    return out


def apply_diffuse_tail(
    out: np.ndarray,
    max_dist: float,
    rt60: float,
    fs: int,
    rng: Optional[np.random.Generator],
    c: float = SPEED_OF_SOUND,
    volume: Optional[float] = None,
) -> np.ndarray:
    """Append a Sabine-decay stochastic late tail after the truncated ISM.

    The tail is white noise under the *absolute* Polack diffuse-field
    envelope: expected reverberant energy density E(t) = c/(4*pi*V) *
    10^(-6 t / rt60) (t from source emission), i.e. per-sample RMS
    sigma(t) = sqrt(c / (4 pi V fs)) * 10^(-3 t / rt60). Leveling the tail
    from first principles — rather than from the trailing RMS of the
    truncated order-3 image response, which undershoots the true late
    field — keeps the measured RT60 of hybrid RIRs on the requested value
    (validated quantitatively in tests/test_rir_golden.py). ``volume``
    (m^3) is required for the absolute level; legacy calls without it fall
    back to trailing-RMS matching.
    """
    if rng is None:
        rng = np.random.default_rng(0)
    m, ism_len = out.shape
    t_switch = min(int(max_dist * fs / c), ism_len - 1)
    tail_len = int(rt60 * fs)
    length = max(ism_len, t_switch + tail_len)
    decay = np.log(10.0 ** (-3.0)) / (rt60 * fs)  # -60 dB over rt60
    full = np.zeros((m, length), np.float32)
    full[:, :ism_len] = out
    t = np.arange(length - t_switch)
    env = np.exp(decay * (t + t_switch))
    for mi in range(m):
        if volume is not None:
            level = math.sqrt(c / (4.0 * math.pi * volume * fs))
        else:
            seg = full[mi, max(0, t_switch - fs // 100) : t_switch + 1]
            level = float(np.sqrt(np.mean(seg**2))) if len(seg) else 0.0
            level /= math.exp(decay * t_switch) or 1.0
        if level <= 0.0:
            continue
        full[mi, t_switch:] += (
            rng.standard_normal(len(t)) * env * level
        ).astype(np.float32)
    return full


def direct_path_rir(
    src: Sequence[float], mic: Sequence[float], fs: int,
    c: float = SPEED_OF_SOUND,
) -> np.ndarray:
    """Anechoic propagation (delay + 1/4πd) — the reference's
    `AnechoicRoom` clean target (dataset/audio_util.py:67, 82-83)."""
    d = float(np.linalg.norm(np.asarray(src, float) - np.asarray(mic, float)))
    d = max(d, 1e-3)
    delay = d * fs / c
    base = int(np.floor(delay))
    frac = np.array([delay - base])
    filt = _frac_delay_filter(frac)[0] / (4.0 * np.pi * d)
    h = np.zeros(base + FDL, np.float64)
    s = base - FDL // 2
    lo = max(0, -s)
    h[s + lo : s + FDL] = filt[lo:]
    return h.astype(np.float32)


def _convolve(sig: np.ndarray, h: np.ndarray, n_out: int) -> np.ndarray:
    from scipy.signal import fftconvolve

    y = fftconvolve(sig, h)
    if len(y) < n_out:
        y = np.pad(y, (0, n_out - len(y)))
    return y[:n_out]


def _mix_through_rirs(sources, rirs, m: int, n: int) -> np.ndarray:
    """Frequency-domain batched room propagation.

    Instead of one fftconvolve per (source, mic) pair (n_src*M separate
    FFTs — the dominant cost of online synthesis), accumulate
    sum_s S_s(f) * H_{s,m}(f) per mic and invert once: n_src forward FFTs
    + n_src batched RIR FFTs + one batched inverse FFT.
    """
    from scipy.fft import irfft, next_fast_len, rfft

    max_l = max(h.shape[1] for h in rirs)
    nfft = next_fast_len(n + max_l - 1)
    acc = np.zeros((m, nfft // 2 + 1), np.complex128)
    for sig, h in zip(sources, rirs):
        s_f = rfft(sig, nfft)
        h_f = rfft(h, nfft, axis=-1)  # (M, F) batched
        acc += s_f[None, :] * h_f
    out = irfft(acc, nfft, axis=-1)[:, :n]
    return out.astype(np.float32)


def simulate_scene(
    room_dim,
    e_absorption: float,
    max_order: int,
    rir_method: str,
    fs: int,
    ref_mic: int,
    p_mics: np.ndarray,
    p_target,
    p_noise_list,
    clean: np.ndarray,
    noises: Sequence[np.ndarray],
    rt60: Optional[float] = None,
    rng: Optional[np.random.Generator] = None,
    backend: str = "auto",
) -> Tuple[np.ndarray, np.ndarray]:
    """Propagate pre-scaled dry signals through the room.

    Returns (noisy (M, N), clean_anechoic_ref (N,)) — the reference's
    `make_audio` contract (dataset/audio_util.py:49-88): the training target
    is the *anechoic* clean at the reference mic.
    """
    p_mics = np.asarray(p_mics, np.float64)
    if p_mics.shape[0] == 3 and p_mics.shape[1] != 3:
        p_mics = p_mics.T  # (M, 3)
    m = p_mics.shape[0]
    n = len(clean)

    rir_fn = shoebox_rir
    if backend in ("auto", "native"):
        try:
            from eabnet_tpu.data.rir_native import native_available, \
                shoebox_rir_native

            if native_available():
                rir_fn = shoebox_rir_native
            elif backend == "native":
                raise RuntimeError("native RIR engine not built")
        except ImportError:
            if backend == "native":
                raise

    sources = [(p_target, clean)] + [
        (p, s) for p, s in zip(p_noise_list, noises)
    ]
    rirs = [
        rir_fn(
            room_dim, p_src, p_mics, e_absorption, max_order, fs,
            method=rir_method, rt60=rt60, rng=rng,
        )
        for p_src, _ in sources
    ]
    noisy = _mix_through_rirs([s for _, s in sources], rirs, m, n)

    h_direct = direct_path_rir(p_target, p_mics[ref_mic], fs)
    clean_ref = _convolve(clean, h_direct, n).astype(np.float32)
    return noisy, clean_ref
