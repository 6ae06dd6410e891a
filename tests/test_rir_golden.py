"""Quantitative RIR validation against the analytic image-source model.

VERDICT r1 item 6: the whole training-data distribution flows through the
RIR engine, so it is validated here against an *independent* brute-force
Allen & Berkley enumeration written in this test (triple loop over image
indices — a different construction than the engine's pruned per-axis outer
product), plus analytic direct-path/DRR statistics and pinned
Schroeder-EDC golden numbers for fixed scenes. Both the numpy and the C++
engines must pass (reference dependency being replaced:
pyroomacoustics, dataset/audio_util.py:49-88).
"""

import math

import numpy as np
import pytest

from eabnet_tpu.data.rir import (
    FDL,
    SPEED_OF_SOUND,
    direct_path_rir,
    inverse_sabine,
    shoebox_rir,
)

FS = 16000


def _brute_force_images(src, room, order):
    """Independent Allen & Berkley enumeration: image positions and wall-hit
    counts via the textbook formula
    x_img = (1-2u) x_s + 2 l Lx  with hits |l-u| + |l| per axis."""
    out = []
    rng_l = range(-(order + 2), order + 3)
    for u in (0, 1):
        for v in (0, 1):
            for w in (0, 1):
                for l in rng_l:
                    for m_ in rng_l:
                        for n_ in rng_l:
                            hits = (abs(l - u) + abs(l)
                                    + abs(m_ - v) + abs(m_)
                                    + abs(n_ - w) + abs(n_))
                            if hits > order:
                                continue
                            pos = np.array([
                                (1 - 2 * u) * src[0] + 2 * l * room[0],
                                (1 - 2 * v) * src[1] + 2 * m_ * room[1],
                                (1 - 2 * w) * src[2] + 2 * n_ * room[2],
                            ])
                            out.append((pos, hits))
    return out


def _analytic_rir(images, mic, beta, fs, length):
    """Place every image with the same Hann-windowed-sinc fractional delay
    the engine documents (re-derived here, not imported)."""
    h = np.zeros(length)
    n = np.arange(FDL) - FDL // 2
    for pos, hits in images:
        d = max(float(np.linalg.norm(pos - mic)), 1e-3)
        amp = beta**hits / (4.0 * math.pi * d)
        delay = d * fs / SPEED_OF_SOUND
        base = int(math.floor(delay))
        frac = delay - base
        t = n - frac
        k = np.sinc(t) * 0.5 * (1.0 + np.cos(2.0 * np.pi * t / FDL))
        s = base - FDL // 2
        for j in range(FDL):
            if 0 <= s + j < length:
                h[s + j] += amp * k[j]
    return h


SCENE = dict(room=[6.0, 4.5, 3.0], src=[2.0, 1.5, 1.2],
             mic=[4.2, 3.1, 1.6], e_abs=0.3, order=2)


def _engines():
    yield "numpy", shoebox_rir
    try:
        from eabnet_tpu.data.rir_native import (
            native_available,
            shoebox_rir_native,
        )

        if native_available():
            yield "native", shoebox_rir_native
    except ImportError:
        pass


@pytest.mark.parametrize("name,rir_fn", list(_engines()))
def test_ism_matches_independent_enumeration(name, rir_fn):
    s = SCENE
    h = rir_fn(s["room"], s["src"], np.array([s["mic"]]), s["e_abs"],
               s["order"], FS)[0]
    images = _brute_force_images(np.asarray(s["src"]),
                                 np.asarray(s["room"]), s["order"])
    # order 2 in a shoebox: 1 direct + 6 first + 18 second = 25 images
    assert len(images) == 25
    beta = math.sqrt(1.0 - s["e_abs"])
    want = _analytic_rir(images, np.asarray(s["mic"]), beta, FS, len(h))
    np.testing.assert_allclose(h, want, atol=5e-6)


@pytest.mark.parametrize("name,rir_fn", list(_engines()))
def test_ism_direct_path_and_drr(name, rir_fn):
    """Direct-path delay is d/c and the direct-to-reverberant energy ratio
    matches the analytic image sum."""
    s = SCENE
    h = rir_fn(s["room"], s["src"], np.array([s["mic"]]), s["e_abs"],
               s["order"], FS)[0].astype(np.float64)
    d_direct = float(np.linalg.norm(np.subtract(s["src"], s["mic"])))
    delay = d_direct * FS / SPEED_OF_SOUND

    # onset: first sample above 1% of peak sits within the sinc kernel's
    # half-width of the true arrival
    onset = int(np.argmax(np.abs(h) > 0.01 * np.abs(h).max()))
    assert abs(onset - delay) <= FDL // 2 + 1

    # analytic energies (windowed-sinc kernels of distinct images overlap
    # negligibly at order 2 in this geometry)
    beta = math.sqrt(1.0 - s["e_abs"])
    images = _brute_force_images(np.asarray(s["src"]),
                                 np.asarray(s["room"]), s["order"])
    kernel_energy = _kernel_energy()
    e_direct = (1.0 / (4 * math.pi * d_direct)) ** 2 * kernel_energy
    e_total = sum(
        (beta**hits / (4 * math.pi
                       * np.linalg.norm(pos - np.asarray(s["mic"])))) ** 2
        for pos, hits in images
    ) * kernel_energy
    drr_analytic = 10 * math.log10(e_direct / (e_total - e_direct))

    # measured: split at the first reflection's arrival
    d_refl = sorted(
        np.linalg.norm(pos - np.asarray(s["mic"]))
        for pos, _ in images
    )[1]
    split = int(((d_direct + d_refl) / 2) * FS / SPEED_OF_SOUND)
    e_d = float(np.sum(h[:split] ** 2))
    e_r = float(np.sum(h[split:] ** 2))
    drr = 10 * math.log10(e_d / e_r)
    assert drr == pytest.approx(drr_analytic, abs=0.6), (name, drr)


def _kernel_energy():
    n = np.arange(FDL) - FDL // 2
    k = np.sinc(n - 0.5) * 0.5 * (1.0 + np.cos(2 * np.pi * (n - 0.5) / FDL))
    return float(np.sum(k**2))


def _schroeder_rt60(h, fs):
    energy = np.cumsum(h[::-1] ** 2)[::-1]
    db = 10 * np.log10(energy / energy[0] + 1e-15)
    t5 = int(np.argmax(db < -5))
    t25 = int(np.argmax(db < -25))
    return (t25 - t5) / fs * 3.0


# Pinned golden statistics for fixed hybrid scenes (seeded tail). These are
# regression anchors for THIS engine: they were generated from it once and
# detect any unintended change to the data distribution.
GOLDEN_HYBRID = {
    # exact-histogram late field (geometric; with air absorption —
    # the reference's hybrid semantics):
    # (room, rt60): (rt60_est, log10_total_energy, onset_sample)
    "hybrid": {
        (5.0, 4.0, 3.0, 0.3): (0.268125, -2.062273580910229, 88),
        (8.0, 6.0, 3.0, 0.5): (0.5563125, -2.2697965443718213, 246),
        (4.0, 3.5, 2.6, 0.15): (0.1145625, -2.005977560412408, 44),
        (9.5, 9.0, 3.0, 0.65): (0.833625, -2.4037227493857687, 401),
    },
    # Polack-envelope noise tail (isotropic Sabine decay, no air)
    "hybrid-sabine": {
        (5.0, 4.0, 3.0, 0.3): (0.3313125, -2.08628077331896, 88),
        (8.0, 6.0, 3.0, 0.5): (0.580125, -2.3655367327664996, 246),
        (4.0, 3.5, 2.6, 0.15): (0.172875, -2.003878171517175, 44),
        (9.5, 9.0, 3.0, 0.65): (0.7595625, -2.541371399681438, 401),
    },
}


@pytest.mark.parametrize("method", ["hybrid", "hybrid-sabine"])
def test_hybrid_golden_statistics(method):
    for key, want in GOLDEN_HYBRID[method].items():
        room = list(key[:3])
        rt60 = key[3]
        e_abs, order = inverse_sabine(rt60, room)
        rng = np.random.default_rng(42)
        h = shoebox_rir(room, [1.5, 1.2, 1.4],
                        np.array([[room[0] - 2.0, room[1] - 1.5, 1.6]]),
                        e_abs, order, FS, method=method, rt60=rt60,
                        rng=rng)[0].astype(np.float64)
        got = (
            _schroeder_rt60(h, FS),
            float(np.log10(np.sum(h**2))),
            int(np.argmax(np.abs(h) > 0.01 * np.abs(h).max())),
        )
        assert got[0] == pytest.approx(want[0], rel=1e-5), (key, got)
        assert got[1] == pytest.approx(want[1], rel=1e-5), (key, got)
        assert got[2] == want[2], (key, got)
        # the physics: measured RT60 tracks the requested Sabine value.
        # The Sabine tail tracks within the classic ~1.2x image-model
        # gap; the exact geometric tail legitimately deviates further
        # (Eyring absorption in small dead rooms -> faster decay, slow
        # grazing modes in flat rooms -> slower late slope — pra's ray
        # tracer exhibits the same behavior).
        lo = 0.7 if method == "hybrid" else 0.9
        assert lo * rt60 < got[0] < 1.3 * rt60


def test_direct_path_rir_matches_analytic_kernel():
    """The anechoic clean-target path equals the analytic formula exactly."""
    src, mic = [2.0, 2.0, 1.5], [3.3, 2.4, 1.1]
    h = direct_path_rir(src, mic, FS).astype(np.float64)
    d = float(np.linalg.norm(np.subtract(src, mic)))
    delay = d * FS / SPEED_OF_SOUND
    base = int(math.floor(delay))
    frac = delay - base
    n = np.arange(FDL) - FDL // 2
    t = n - frac
    k = np.sinc(t) * 0.5 * (1 + np.cos(2 * np.pi * t / FDL))
    want = np.zeros(base + FDL)
    s = base - FDL // 2
    want[s: s + FDL] = k / (4 * math.pi * d)
    np.testing.assert_allclose(h, want[: len(h)], atol=1e-7)
