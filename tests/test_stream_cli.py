"""Streaming enhancement CLI == offline Enhancer (causal config).

Drives `python -m eabnet_tpu.cli.stream` end-to-end on a saved tiny
experiment and checks the wav it writes against the offline Enhancer on
the same input. Both paths must apply the same inverse power compression
(StftConfig.decompress_output) — this test pins that consistency at the
CLI level; the library-level streaming==offline equivalence lives in
test_streaming_dsp.py.
"""

import os

import numpy as np
import pytest

from eabnet_tpu.config import (
    ComposedConfig,
    DataConfig,
    EaBNetConfig,
    ExperimentConfig,
    GaGNetConfig,
    TrainConfig,
)


@pytest.mark.slow
def test_stream_cli_matches_offline_enhancer(tmp_path, capsys):
    import jax

    from eabnet_tpu.cli import stream as stream_cli
    from eabnet_tpu.inference import Enhancer
    from eabnet_tpu.train.checkpoint import save_checkpoint
    from eabnet_tpu.train.step import create_train_state
    from eabnet_tpu.utils.audio_io import read_wav, write_wav

    cfg = ExperimentConfig(
        model=ComposedConfig(
            eabnet=EaBNetConfig(c=8, M=3, embed_dim=8, cd1=8, p=2, q=1,
                                norm_type="cLN"),
            gagnet=GaGNetConfig(c=8, cd1=8, p=1, q=1, dilas=(1, 2),
                                norm_type="cLN"),
        ),
        data=DataConfig(dataset="fake", clip_seconds=0.4, num_workers=0),
        train=TrainConfig(batch_size=2, wav_len=0.4,
                          checkpoint_dir=str(tmp_path / "ckpt"),
                          exp_root=str(tmp_path)),
    )
    _, state = create_train_state(cfg, jax.random.key(0))
    save_checkpoint(state, epoch=0, directory=cfg.train.checkpoint_dir)
    cfg.save(os.path.join(str(tmp_path), "config.json"))

    rng = np.random.default_rng(0)
    hop = cfg.stft.hop_samples
    n = hop * 80
    noisy = (rng.standard_normal((3, n)) * 0.1).astype(np.float32)
    wav_in = tmp_path / "in.wav"
    write_wav(str(wav_in), cfg.stft.sr, noisy)

    wav_out = tmp_path / "out_stream.wav"
    stream_cli.main([str(wav_in), str(wav_out),
                     "--exp-root", str(tmp_path)])
    capsys.readouterr()
    sr, streamed = read_wav(str(wav_out))
    assert sr == cfg.stft.sr
    assert np.isfinite(streamed).all()

    offline = Enhancer(cfg, state.params)(noisy)

    # streaming sample k corresponds to offline sample k - n_fft/2 (the
    # offline transform trims its centering pad); compare the interior
    # past the cLN warm-up of the lead-in frames
    lead = cfg.stft.fft_num // 2
    # cLN cumulative statistics converge like 1/t; compare the back half
    warm = n // 2
    m = min(len(offline), len(streamed) - lead) - warm
    a = streamed[lead + warm : lead + warm + m]
    b = offline[warm : warm + m]
    # causal cLN keeps a memory of the differing lead-in, so exact
    # equality never happens — require strong agreement instead
    corr = float(np.corrcoef(a, b)[0, 1])
    assert corr > 0.99, corr
    ratio = float(np.sqrt(np.mean(a**2) / max(np.mean(b**2), 1e-12)))
    assert 0.8 < ratio < 1.25, ratio


@pytest.mark.slow
def test_stream_cli_directory_multi_stream(tmp_path, capsys):
    """Directory mode: N concurrent ragged streams served in lockstep
    from one batched state must each equal their own single-stream run
    (stream independence at the CLI surface)."""
    import jax

    from eabnet_tpu.cli import stream as stream_cli
    from eabnet_tpu.train.checkpoint import save_checkpoint
    from eabnet_tpu.train.step import create_train_state
    from eabnet_tpu.utils.audio_io import read_wav, write_wav

    cfg = ExperimentConfig(
        model=ComposedConfig(
            eabnet=EaBNetConfig(c=8, M=3, embed_dim=8, cd1=8, p=2, q=1,
                                norm_type="cLN"),
            gagnet=GaGNetConfig(c=8, cd1=8, p=1, q=1, dilas=(1, 2),
                                norm_type="cLN"),
        ),
        data=DataConfig(dataset="fake", clip_seconds=0.4, num_workers=0),
        train=TrainConfig(batch_size=2, wav_len=0.4,
                          checkpoint_dir=str(tmp_path / "ckpt"),
                          exp_root=str(tmp_path)),
    )
    _, state = create_train_state(cfg, jax.random.key(0))
    save_checkpoint(state, epoch=0, directory=cfg.train.checkpoint_dir)
    cfg.save(os.path.join(str(tmp_path), "config.json"))

    rng = np.random.default_rng(4)
    hop = cfg.stft.hop_samples
    in_dir = tmp_path / "in"
    out_dir = tmp_path / "out"
    in_dir.mkdir()
    wavs = {}
    for name, frames in (("a.wav", 30), ("b.wav", 18)):  # ragged
        w = (rng.standard_normal((3, hop * frames)) * 0.1).astype(
            np.float32)
        write_wav(str(in_dir / name), cfg.stft.sr, w)
        wavs[name] = w

    stream_cli.main([str(in_dir), str(out_dir),
                     "--exp-root", str(tmp_path)])
    out = capsys.readouterr().out
    assert "2 stream(s)" in out

    # each output equals its own single-stream run
    for name, w in wavs.items():
        solo_out = tmp_path / f"solo_{name}"
        wav_in = tmp_path / f"solo_in_{name}"
        write_wav(str(wav_in), cfg.stft.sr, w)
        stream_cli.main([str(wav_in), str(solo_out),
                         "--exp-root", str(tmp_path)])
        capsys.readouterr()
        _, multi = read_wav(str(out_dir / name))
        _, solo = read_wav(str(solo_out))
        assert multi.shape == solo.shape
        np.testing.assert_allclose(multi, solo, atol=2e-5)
