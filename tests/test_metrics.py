"""Metric tests: SI-SDR parity with the reference formulas, STOI/ESTOI
sanity and monotonicity, evaluation harness end-to-end."""

import numpy as np
import pytest

from eabnet_tpu.eval import (
    MetricAccumulator,
    cal_single_metrics,
    energy_ratios,
    evaluate_dataset,
    mean_std,
    si_sdr,
    snr_db,
    stoi,
    write_report,
)


def _speechlike(n, sr, rng):
    """Envelope-modulated pink noise — broadband spectro-temporal
    structure in every third-octave band, like speech."""
    spec = np.fft.rfft(rng.standard_normal(n))
    f = np.fft.rfftfreq(n, 1 / sr)
    spec = spec / np.sqrt(np.maximum(f, 50.0))  # ~1/sqrt(f) pink slope
    x = np.fft.irfft(spec, n)
    t = np.arange(n) / sr
    env = 0.55 + 0.45 * np.sin(2 * np.pi * 4 * t + rng.random() * 6)
    x = x * env
    return (x / np.std(x)).astype(np.float64)


def test_si_sdr_identity_and_scale_invariance(rng):
    s = rng.standard_normal(16000)
    assert si_sdr(s, s * 0.3) > 100  # scale-invariant, near-perfect
    noisy = s + 0.1 * rng.standard_normal(16000)
    v = si_sdr(s, noisy)
    assert 15 < v < 25


def test_energy_ratios_decomposition(rng):
    s = rng.standard_normal(16000)
    n = rng.standard_normal(16000)
    s_hat = s + 0.3 * n
    sdr, sir, sar = energy_ratios(s_hat, s, n)
    # estimate contains noise but no artifacts: sar >> sir (finite-sample
    # s/n correlation leaves a tiny artifact residue)
    assert sar > 40
    np.testing.assert_allclose(
        sir, 10 * np.log10(np.sum(s**2) / np.sum((0.3 * n) ** 2)), atol=0.5
    )
    assert sdr == pytest.approx(sir, abs=0.5)


def test_snr_db(rng):
    s = rng.standard_normal(8000)
    assert snr_db(s, s * 0.1) == pytest.approx(20.0, abs=0.01)


@pytest.mark.parametrize("extended", [False, True])
def test_stoi_clean_is_one_and_monotonic(rng, extended):
    sr = 16000
    x = _speechlike(sr * 3, sr, rng)
    assert stoi(x, x, sr, extended) == pytest.approx(1.0, abs=0.01)
    scores = []
    for noise_lvl in (0.05, 0.5, 5.0):
        y = x + noise_lvl * np.std(x) * rng.standard_normal(len(x))
        scores.append(stoi(x, y, sr, extended))
    assert scores[0] > scores[1] > scores[2], scores
    assert scores[0] > 0.85
    assert scores[2] < 0.55


# Pinned STOI/ESTOI regression vectors for this implementation on
# deterministic signals (VERDICT r1 item 4: make a failing STOI regression
# detectable). Not pystoi conformance values — the cross-check test below
# asserts closeness to pystoi automatically wherever that is importable.
STOI_GOLDEN = {
    # noise level (x std units) -> (stoi, estoi)
    0.1: (0.9984921277443658, 0.9816758254227955),
    0.4: (0.9733394011493166, 0.8003064144072194),
    1.6: (0.6547036819014083, 0.32117727059119755),
}


def _stoi_golden_signals():
    sr = 16000
    g = np.random.default_rng(2024)
    x = _speechlike(sr * 3, sr, g)
    noise = g.standard_normal(len(x))
    return sr, x, noise


def test_stoi_golden_regression():
    sr, x, noise = _stoi_golden_signals()
    for lvl, (want_stoi, want_estoi) in STOI_GOLDEN.items():
        y = x + lvl * np.std(x) * noise
        assert stoi(x, y, sr) == pytest.approx(want_stoi, abs=1e-9)
        assert stoi(x, y, sr, extended=True) == pytest.approx(
            want_estoi, abs=1e-9)


def test_stoi_gain_invariance():
    """The per-segment alpha normalization (STOI) and row/col
    normalization (ESTOI) make a pure gain transparent."""
    sr, x, _ = _stoi_golden_signals()
    assert stoi(x, x * 3.7, sr) == pytest.approx(1.0, abs=1e-9)
    assert stoi(x, x * 3.7, sr, extended=True) == pytest.approx(
        1.0, abs=1e-6)
    # envelope-domain metric: polarity inversion is also transparent
    assert stoi(x, -x, sr) == pytest.approx(1.0, abs=1e-9)


def _pystoi_available():
    try:
        import pystoi  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(not _pystoi_available(),
                    reason="pystoi not installed")
def test_stoi_cross_check_against_pystoi():
    """Wherever pystoi is importable, our scores must track it closely
    across an SNR ladder (reference battery: test.py:83-84)."""
    from pystoi import stoi as ref_stoi

    sr, x, noise = _stoi_golden_signals()
    for lvl in (0.1, 0.4, 1.6):
        y = x + lvl * np.std(x) * noise
        for extended in (False, True):
            ours = stoi(x, y, sr, extended)
            theirs = float(ref_stoi(x, y, sr, extended=extended))
            assert ours == pytest.approx(theirs, abs=1e-3), (lvl, extended)


def test_stoi_10k_native(rng):
    x = _speechlike(30000, 10000, rng)
    assert stoi(x, x, 10000) == pytest.approx(1.0, abs=0.01)


def test_cal_single_metrics_and_harness(tmp_path, rng):
    sr = 16000
    clean = _speechlike(sr * 2, sr, rng)
    noise = 0.3 * np.std(clean) * rng.standard_normal(len(clean))
    noisy = clean + noise

    scores = cal_single_metrics(clean, noisy, noisy * 0.9, sr)
    assert scores["si_sdr"] > 5
    assert 0 < scores["estoi"] <= 1

    def fake_enhance(noisy_mc):
        return noisy_mc[0] * 0.5  # identity-ish "enhancer"

    items = [
        (np.stack([noisy, noisy]), clean),
        (np.stack([noisy, noisy]), clean),
    ]
    acc, rows = evaluate_dataset(fake_enhance, items, sr)
    assert len(rows) == 2
    path = write_report(acc, rows, str(tmp_path / "report"))
    text = open(path).read()
    assert "si_sdr" in text and "±" in text
    assert (tmp_path / "report.csv").exists()


def test_seg_snr_and_lsd(rng):
    from eabnet_tpu.eval.metrics import log_spectral_distance, seg_snr

    sr = 16000
    x = _speechlike(sr * 2, sr, rng)
    # identical signals: segSNR at the ceiling, LSD ~ 0
    assert seg_snr(x, x, sr) == pytest.approx(35.0)
    assert log_spectral_distance(x, x) == pytest.approx(0.0, abs=1e-6)
    y1 = x + 0.01 * rng.standard_normal(len(x))
    y2 = x + 0.3 * rng.standard_normal(len(x))
    assert seg_snr(x, y1, sr) > seg_snr(x, y2, sr)
    assert log_spectral_distance(x, y1) < log_spectral_distance(x, y2)


def test_metric_accumulator():
    acc = MetricAccumulator(["a"])
    acc.append("a", 1.0)
    acc.append("a", 3.0)
    m, s = acc.mean_std("a")
    assert m == 2.0 and s == 1.0
    assert mean_std(np.array([1.0, np.nan, 3.0])) == (2.0, 1.0)
