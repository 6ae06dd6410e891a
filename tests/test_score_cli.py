"""Dir-of-wavs scorer CLI (reference: test.py:50-123 cal_metrics):
basename matching, resampling, zero-pad alignment, optional noisy dir."""

import os

import numpy as np
import pytest

from eabnet_tpu.cli.score import main as score_main
from eabnet_tpu.data.synth_speech import synth_utterance
from eabnet_tpu.utils.audio_io import resample, write_wav


@pytest.fixture(scope="module")
def dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("score")
    clean_d = os.path.join(root, "clean")
    enh_d = os.path.join(root, "enhanced")
    noisy_d = os.path.join(root, "noisy")
    for d in (clean_d, enh_d, noisy_d):
        os.makedirs(d)
    rng = np.random.default_rng(3)
    for i, sr in enumerate((16000, 48000)):  # second file tests resampling
        x16 = synth_utterance(2.0, 16000, seed=400 + i)
        x = resample(x16, 16000, sr) if sr != 16000 else x16
        write_wav(os.path.join(clean_d, f"u{i}.wav"), sr, x)
        noise = rng.standard_normal(len(x16))
        noise *= np.sqrt(np.mean(x16**2) / 10 ** (0 / 10)) / (
            np.sqrt(np.mean(noise**2)) + 1e-12)
        write_wav(os.path.join(noisy_d, f"u{i}.wav"), 16000, x16 + noise)
        # enhanced = mild residual noise, shorter file (alignment path)
        enh = x16 + 0.05 * noise
        write_wav(os.path.join(enh_d, f"u{i}.wav"), 16000, enh[:-500])
    # an enhanced file with no clean counterpart must be skipped, not fatal
    write_wav(os.path.join(enh_d, "orphan.wav"), 16000, np.zeros(16000))
    return clean_d, enh_d, noisy_d


def _parse_report(path):
    out = {}
    for line in open(path):
        if line.startswith("#") or ":" not in line:
            continue
        k, v = line.split(":", 1)
        out[k.strip()] = float(v.split("±")[0])
    return out


def test_score_with_noisy_dir(dirs, tmp_path):
    clean_d, enh_d, noisy_d = dirs
    prefix = os.path.join(tmp_path, "scores_full")
    score_main(["--clean", clean_d, "--enhanced", enh_d,
                "--noisy", noisy_d, "--out-prefix", prefix])
    rep = _parse_report(prefix + ".txt")
    for key in ("pesq", "nb_pesq", "stoi", "estoi", "si_sdr", "si_sir",
                "si_sar", "seg_snr", "lsd"):
        assert key in rep, key
    # lightly-degraded enhanced audio must score well
    assert rep["si_sdr"] > 15
    assert rep["stoi"] > 0.9
    # CSV has one row per matched pair (orphan skipped)
    rows = open(prefix + ".csv").read().strip().splitlines()
    assert len(rows) == 3  # header + 2 files
    # provenance comments recorded
    txt = open(prefix + ".txt").read()
    assert "# enhanced:" in txt and "# clean:" in txt


def test_score_without_noisy_dir(dirs, tmp_path):
    clean_d, enh_d, _ = dirs
    prefix = os.path.join(tmp_path, "scores_nonoisy")
    score_main(["--clean", clean_d, "--enhanced", enh_d,
                "--out-prefix", prefix])
    rep = _parse_report(prefix + ".txt")
    assert "si_sdr" in rep and rep["si_sdr"] > 15
    assert "si_sir" not in rep and "si_sar" not in rep


def test_score_no_matches_errors(tmp_path):
    empty1, empty2 = tmp_path / "a", tmp_path / "b"
    empty1.mkdir()
    empty2.mkdir()
    write_wav(str(empty2 / "x.wav"), 16000, np.zeros(16000))
    with pytest.raises(SystemExit):
        score_main(["--clean", str(empty1), "--enhanced", str(empty2)])
