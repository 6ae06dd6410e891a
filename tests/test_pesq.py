"""First-party PESQ (ITU-T P.862 pipeline) tests.

Properties (ceiling, monotonicity, invariances), pinned golden regression
vectors for this implementation, and an automatic cross-check against the
ITU-wrapped `pesq` package whenever that is importable
(reference battery: test.py:140-141, metrics.py:101-108).
"""

import numpy as np
import pytest
from scipy.signal import lfilter, resample_poly

from eabnet_tpu.eval.p862 import mos_lqo_nb, mos_lqo_wb, pesq_p862
from eabnet_tpu.eval.pesq import itu_pesq_available, pesq, pesq_backend

FS = 16000


def synth_speech(seconds=3.0, f0=120.0, fs=FS):
    """Deterministic speech-like signal: jittered glottal pulse train
    through formant resonators with a syllabic envelope."""
    n = int(fs * seconds)
    t = np.arange(n) / fs
    phase = np.cumsum(
        np.full(n, f0) / fs + 0.003 * np.sin(2 * np.pi * 2.3 * t) / fs * f0
    )
    x = (np.diff(np.floor(phase), prepend=0) > 0).astype(float)
    for fc, bw in [(700, 80), (1220, 120), (2600, 160), (3500, 250)]:
        r = np.exp(-np.pi * bw / fs)
        th = 2 * np.pi * fc / fs
        x = lfilter([1 - r], [1, -2 * r * np.cos(th), r * r], x)
    env = np.clip(np.sin(2 * np.pi * 2.5 * t) + 0.3, 0, None)
    env[: int(0.2 * fs)] = 0
    env[-int(0.2 * fs):] = 0
    x = x * env
    return x / np.max(np.abs(x)) * 0.3


@pytest.fixture(scope="module")
def clean():
    return synth_speech()


def _add_noise(clean, snr_db, seed=99):
    rng = np.random.default_rng(seed)
    noise = rng.standard_normal(len(clean))
    npow = np.mean(clean**2) / 10 ** (snr_db / 10)
    return clean + noise * np.sqrt(npow)


# ------------------------------------------------------------- properties

def test_identical_signals_score_ceiling(clean):
    # raw PESQ of a perfect match is 4.5; the maps pin the MOS-LQO ceiling
    assert pesq_p862(FS, clean, clean, "wb") == pytest.approx(
        mos_lqo_wb(4.5), abs=1e-3)
    assert pesq_p862(FS, clean, clean, "nb") == pytest.approx(
        mos_lqo_nb(4.5), abs=1e-3)


def test_monotone_in_snr(clean):
    for mode in ("wb", "nb"):
        scores = [pesq_p862(FS, clean, _add_noise(clean, snr), mode)
                  for snr in (40, 30, 20, 10, 0)]
        assert all(a > b for a, b in zip(scores, scores[1:])), scores
        assert scores[0] > 3.5          # light noise scores high
        assert scores[-1] < 2.8         # heavy noise scores low


def test_level_invariance(clean):
    """fix_power_level makes absolute input scale irrelevant."""
    deg = _add_noise(clean, 15)
    a = pesq_p862(FS, clean, deg, "wb")
    b = pesq_p862(FS, clean * 8.0, deg * 0.125, "wb")
    assert a == pytest.approx(b, abs=0.1)


def test_delay_robustness(clean):
    """Time alignment absorbs a constant lag (here 40 ms)."""
    deg = _add_noise(clean, 25)
    lag = int(0.040 * FS)
    delayed = np.concatenate([np.zeros(lag), deg])[: len(deg) + lag]
    a = pesq_p862(FS, clean, deg, "wb")
    b = pesq_p862(FS, clean, delayed, "wb")
    assert b == pytest.approx(a, abs=0.35)
    # without alignment this lag would be catastrophic: a misaligned score
    # computed by zero-delay comparison must be far lower
    misaligned = pesq_p862(FS, clean, np.roll(clean, lag) * 0 + delayed
                           [: len(clean)], "wb")
    assert misaligned > 1.0  # still sane, alignment found the lag


def test_distortion_types_all_penalized(clean):
    base = pesq_p862(FS, clean, clean, "wb")
    clipped = np.clip(clean, -0.05, 0.05)
    muted = clean.copy()
    muted[len(muted) // 3: len(muted) // 2] = 0.0
    for deg in (clipped, muted):
        assert pesq_p862(FS, clean, deg, "wb") < base - 0.5
    # P.862 deliberately discounts linear filtering via its partial
    # frequency-response compensation, so a lowpass is only mildly penalized
    lowpassed = lfilter(*_butter_lp(), clean)
    lp_score = pesq_p862(FS, clean, lowpassed, "wb")
    assert lp_score < base - 0.05
    assert lp_score > 3.5


def _butter_lp():
    from scipy.signal import butter

    return butter(4, 1000 / (FS / 2))


def test_input_validation(clean):
    with pytest.raises(ValueError):
        pesq_p862(8000, clean[:8000], clean[:8000], "wb")  # wb needs 16k
    with pytest.raises(ValueError):
        pesq_p862(FS, clean, clean, "superwide")
    with pytest.raises(ValueError):
        pesq_p862(44100, clean, clean, "nb")
    with pytest.raises(ValueError):
        pesq_p862(FS, clean[:100], clean[:100], "wb")  # too short


def test_variable_delay_recovered_by_split_align(clean):
    """A delay that CHANGES mid-signal (packet loss / clock drift) is
    recovered piecewise by the recursive split aligner + per-utterance
    crude alignment: the score stays close to the constant-delay score
    instead of collapsing (the residual gap is the genuine distortion of
    the inserted gap, not misalignment)."""
    deg = _add_noise(clean, 25)
    lag = int(0.040 * FS)
    n = len(deg)
    var = np.concatenate([deg[: n // 2], np.zeros(lag),
                          deg[n // 2:]])[: n + lag]
    const_score = pesq_p862(FS, clean, deg, "wb")
    var_score = pesq_p862(FS, clean, var, "wb")
    assert var_score > const_score - 0.35, (const_score, var_score)


# ------------------------------------------------------- published anchors
# The P.862.1 (nb) and P.862.2 (wb) raw->MOS-LQO logistic maps with their
# published constants, pinned at exact fixed points: an in-image external
# anchor (these values are properties of the ITU-published formulas, not
# of this implementation).

def _map_nb(raw):
    return 0.999 + 4.0 / (1.0 + np.exp(-1.4945 * raw + 4.6607))


def _map_wb(raw):
    return 0.999 + 4.0 / (1.0 + np.exp(-1.3669 * raw + 3.8224))


@pytest.mark.parametrize("raw", [-0.5, 0.0, 1.0, 2.5, 4.0, 4.5])
def test_mos_lqo_maps_match_published_formulas(raw):
    assert mos_lqo_nb(raw) == pytest.approx(_map_nb(raw), abs=1e-12)
    assert mos_lqo_wb(raw) == pytest.approx(_map_wb(raw), abs=1e-12)


def test_mos_lqo_map_ranges():
    """Published map endpoints: raw in [-0.5, 4.5] spans ~[1.02, 4.55] nb
    and ~[1.04, 4.64] wb."""
    assert mos_lqo_nb(-0.5) == pytest.approx(1.0165, abs=2e-3)
    assert mos_lqo_nb(4.5) == pytest.approx(4.5486, abs=2e-3)
    assert mos_lqo_wb(-0.5) == pytest.approx(1.0427, abs=2e-3)
    assert mos_lqo_wb(4.5) == pytest.approx(4.6439, abs=2e-3)


def test_silence_returns_floor():
    z = np.zeros(FS)
    assert pesq_p862(FS, z, z, "wb") == pytest.approx(mos_lqo_wb(-0.5),
                                                      abs=1e-6)


# ---------------------------------------------------------------- goldens
# Pinned regression vectors for THIS implementation (deterministic synth +
# seeded noise). These detect unintended numeric drift; they are not ITU
# conformance vectors (see p862.py conformance note).
GOLDEN = {
    ("snr30", "wb"): 3.429870700184612,
    ("snr30", "nb"): 3.3637724125947948,
    ("snr10", "wb"): 2.2586116521897677,
    ("snr10", "nb"): 2.5238606139962783,
}


def test_golden_regression(clean):
    for (case, mode), expect in GOLDEN.items():
        snr = int(case[3:])
        got = pesq_p862(FS, clean, _add_noise(clean, snr), mode)
        assert got == pytest.approx(expect, abs=1e-6), (case, mode, got)


def test_golden_8k_narrowband(clean):
    clean8 = resample_poly(clean, 1, 2)
    rng = np.random.default_rng(99)
    rng.standard_normal(len(clean))  # keep the noise stream position
    deg8 = clean8 + rng.standard_normal(len(clean8)) * np.sqrt(
        np.mean(clean8**2) / 10 ** (20 / 10))
    got = pesq_p862(8000, clean8, deg8, "nb")
    assert got == pytest.approx(2.993109671104263, abs=1e-6)


# ---------------------------------------------------------------- gateway

def test_gateway_never_nan(clean):
    deg = _add_noise(clean, 20)
    for mode in ("wb", "nb"):
        v = pesq(FS, clean, deg, mode)
        assert np.isfinite(v)
    assert pesq_backend() in ("itu", "first_party")


def test_forced_first_party_backend(clean, monkeypatch):
    monkeypatch.setenv("EABNET_PESQ_BACKEND", "first_party")
    v = pesq(FS, clean, _add_noise(clean, 20), "wb")
    assert v == pytest.approx(
        pesq_p862(FS, clean, _add_noise(clean, 20), "wb"), abs=1e-9)


@pytest.mark.skipif(not itu_pesq_available(),
                    reason="ITU `pesq` package not installed")
def test_cross_check_against_itu(clean):
    """When the conformant ITU wrapper is importable, the first-party
    scores must track it closely across an SNR ladder — the quantified
    deviation bound documented in eval/p862.py: |ours - ITU| <= 0.35
    absolute per condition, and <= 0.20 on condition DIFFERENCES (the
    systematic band-table offset cancels in comparisons)."""
    from pesq import pesq as itu

    for mode in ("wb", "nb"):
        pairs = []
        for snr in (30, 20, 10):
            deg = _add_noise(clean, snr)
            ours = pesq_p862(FS, clean, deg, mode)
            theirs = float(itu(FS, clean.astype(np.float32),
                               deg.astype(np.float32), mode))
            assert ours == pytest.approx(theirs, abs=0.35), (mode, snr)
            pairs.append((snr, ours, theirs))
        for i in range(len(pairs)):
            for j in range(i + 1, len(pairs)):
                d_ours = pairs[i][1] - pairs[j][1]
                d_itu = pairs[i][2] - pairs[j][2]
                assert d_ours == pytest.approx(d_itu, abs=0.20), \
                    (mode, pairs[i][0], pairs[j][0])
