"""Golden parity tests for the STFT/iSTFT front-end against torch.stft.

The whole downstream stack depends on bit-level front-end agreement
(SURVEY.md §7 build order step 1).
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from eabnet_tpu.config import StftConfig
from eabnet_tpu.dsp import (
    hann_window,
    istft,
    power_compress,
    prepare_data,
    stft,
    stft_to_wav,
)

FFT, HOP, WIN = 320, 160, 320


def torch_stft(x: np.ndarray) -> np.ndarray:
    t = torch.stft(
        torch.from_numpy(x).float(),
        FFT,
        HOP,
        WIN,
        torch.hann_window(WIN),
        return_complex=False,
    )
    return t.numpy()  # (..., F, T, 2)


def test_hann_window_matches_torch():
    ours = np.asarray(hann_window(WIN))
    ref = torch.hann_window(WIN).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


@pytest.mark.parametrize("n", [96000, 76672, 16000])
def test_stft_matches_torch(rng, n):
    x = rng.standard_normal((3, n)).astype(np.float32)
    ref = torch_stft(x)  # (B, F, T, 2)
    ours = np.asarray(stft(jnp.asarray(x), FFT, HOP, WIN))  # (B, T, F, 2)
    ours_ft = np.transpose(ours, (0, 2, 1, 3))
    assert ours_ft.shape == ref.shape
    np.testing.assert_allclose(ours_ft, ref, atol=2e-3, rtol=1e-4)
    # relative error should be tiny w.r.t. spectrum scale
    scale = np.abs(ref).max()
    assert np.abs(ours_ft - ref).max() / scale < 1e-5


def test_istft_matches_torch(rng):
    n = 48000
    x = rng.standard_normal((2, n)).astype(np.float32)
    spec_ft = torch_stft(x)  # (B, F, T, 2)
    ref_wav = torch.istft(
        torch.view_as_complex(torch.from_numpy(spec_ft).contiguous()),
        FFT,
        HOP,
        WIN,
        torch.hann_window(WIN),
    ).numpy()
    spec_tf = jnp.asarray(np.transpose(spec_ft, (0, 2, 1, 3)))
    ours = np.asarray(istft(spec_tf, FFT, HOP, WIN))
    assert ours.shape == ref_wav.shape
    np.testing.assert_allclose(ours, ref_wav, atol=1e-4)


def test_stft_istft_roundtrip(rng):
    x = rng.standard_normal((1, 32000)).astype(np.float32)
    spec = stft(jnp.asarray(x), FFT, HOP, WIN)
    y = np.asarray(istft(spec, FFT, HOP, WIN, length=32000))
    np.testing.assert_allclose(y, x, atol=1e-4)


def test_power_compress_matches_reference_formula(rng):
    # reference: mag**0.5 keeping phase via atan2/cos/sin
    # (train_distributed.py:89-92)
    spec = rng.standard_normal((4, 10, 161, 2)).astype(np.float32)
    mag = np.linalg.norm(spec, axis=-1) ** 0.5
    phase = np.arctan2(spec[..., 1], spec[..., 0])
    ref = np.stack([mag * np.cos(phase), mag * np.sin(phase)], axis=-1)
    ours = np.asarray(power_compress(jnp.asarray(spec), 0.5, axis=-1))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_prepare_data_shapes_and_values(rng):
    cfg = StftConfig()
    b, m, n = 2, 9, 96000
    noisy = rng.standard_normal((b, m, n)).astype(np.float32)
    target = rng.standard_normal((b, 1, n)).astype(np.float32)
    noisy_stft, target_stft = prepare_data(
        jnp.asarray(noisy), jnp.asarray(target), cfg
    )
    t = cfg.num_frames(n)
    assert noisy_stft.shape == (b, t, cfg.freq_bins, m, 2)
    assert target_stft.shape == (b, 2, t, cfg.freq_bins)

    # reference computation in torch (train_distributed.py:68-95)
    nw = torch.from_numpy(noisy).reshape(b * m, n).float()
    tw = torch.from_numpy(target).squeeze(1).float()
    win = torch.hann_window(WIN)
    nst = torch.stft(nw, FFT, HOP, WIN, win, return_complex=False)
    tst = torch.stft(tw, FFT, HOP, WIN, win, return_complex=False)
    freq, seq = nst.shape[1], nst.shape[2]
    nst = nst.view(b, m, freq, seq, 2).permute(0, 3, 2, 1, 4)
    tst = tst.permute(0, 3, 2, 1)
    nmag = torch.norm(nst, dim=-1) ** 0.5
    nph = torch.atan2(nst[..., -1], nst[..., 0])
    tmag = torch.norm(tst, dim=1) ** 0.5
    tph = torch.atan2(tst[:, -1], tst[:, 0])
    ref_noisy = torch.stack(
        [nmag * torch.cos(nph), nmag * torch.sin(nph)], dim=-1
    ).numpy()
    ref_target = torch.stack(
        [tmag * torch.cos(tph), tmag * torch.sin(tph)], dim=1
    ).numpy()
    np.testing.assert_allclose(np.asarray(noisy_stft), ref_noisy, atol=5e-4)
    np.testing.assert_allclose(np.asarray(target_stft), ref_target, atol=5e-4)


def test_stft_to_wav_matches_reference_istft(rng):
    # raw-transform parity: disable the (default) compression inverse
    cfg = StftConfig(decompress_output=False)
    spec = rng.standard_normal((1, 2, 601, 161)).astype(np.float32)
    ref = torch.istft(
        torch.view_as_complex(
            torch.from_numpy(spec).permute(0, 3, 2, 1).contiguous()
        ),
        FFT,
        HOP,
        WIN,
        torch.hann_window(WIN),
    ).numpy()
    ours = np.asarray(stft_to_wav(jnp.asarray(spec), cfg))
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_stft_to_wav_inverts_power_compression(rng):
    """Default path: prepare_data compression -> stft_to_wav must round-trip
    back to the original waveform (the reference skips the inverse and caps
    a perfect estimate at ~+5 dB SI-SDR; see StftConfig.decompress_output).
    """
    cfg = StftConfig()
    n = 16000
    wav = (rng.standard_normal((1, n)) * 0.1).astype(np.float32)
    _, target_stft = prepare_data(
        jnp.asarray(wav)[:, None].repeat(2, 1), jnp.asarray(wav), cfg
    )
    rec = np.asarray(stft_to_wav(target_stft, cfg, n))[0]
    ref = wav[0]
    a = float(np.dot(rec, ref) / np.dot(ref, ref))
    t = a * ref
    si_sdr = 10 * np.log10(
        np.dot(t, t) / max(float(np.dot(rec - t, rec - t)), 1e-20)
    )
    assert si_sdr > 40.0, si_sdr
