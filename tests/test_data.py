"""Data-pipeline tests: mixer, scenes, RIR engine (numpy + native), datasets."""

import json
import os
import subprocess

import numpy as np
import pytest

from eabnet_tpu.config import DataConfig
from eabnet_tpu.data import (
    BatchLoader,
    FakeDataset,
    active_noise_rms,
    inverse_sabine,
    mix_at_snr,
    sample_scene,
    shoebox_rir,
    simulate_scene,
)
from eabnet_tpu.data.datasets import synthesize_item
from eabnet_tpu.data.rir import direct_path_rir
from eabnet_tpu.data.scenes import load_settings

SETTINGS_V2 = {
    "audio": {"fs": 16000, "rir_method": "hybrid"},
    "room": {"min_dim": [3, 3, 2.5], "max_dim": [10, 10, 3],
             "rt60": [0.05, 0.7]},
    "mic_array": {
        "mics": [{"x": 0.0, "y": 0.16 - 0.04 * i} for i in range(9)],
        "ref_mic": 0,
        "direction": {"x": 0, "y": 1},
        "h": [1, 1.5],
        "min_dist_to_wall": 0.5,
    },
    "target": {"dist_to_mic_array": [1, 5], "h": [1, 1.5],
               "min_dist_to_wall": 0.5, "fixed_doa": True},
    "noise": {"min_doa_diff_wrt_target": 5, "min_dist_to_mic_array": 0.5,
              "n": [3, 5], "h": [1, 1.5], "SNR": [1, 1]},
    "noisy_dBFS": [-35, -15],
}


@pytest.fixture
def settings(tmp_path):
    p = tmp_path / "settings.json"
    p.write_text(json.dumps(SETTINGS_V2))
    return str(p)


# ------------------------------------------------------------------ mixer

def test_active_noise_rms_ignores_silence():
    fs = 16000
    rng = np.random.default_rng(0)
    burst = rng.standard_normal(fs) * 0.5
    silent = np.zeros(fs * 3)
    noise = np.concatenate([burst, silent])
    rms = active_noise_rms(noise, fs)
    # close to the burst's own RMS, not diluted by 3 s of silence
    np.testing.assert_allclose(rms, np.sqrt(np.mean(burst**2)), rtol=0.05)


def test_mix_at_snr_hits_target_snr_and_dbfs():
    fs = 16000
    rng = np.random.default_rng(1)
    clean = rng.standard_normal(fs * 2) * 0.3
    noise = rng.standard_normal(fs * 2) * 0.1
    snr = 5.0
    dbfs = -20.0
    c, ns = mix_at_snr(clean, [noise], [snr], dbfs, fs)
    measured_snr = 10 * np.log10(np.sum(c**2) / np.sum(ns[0] ** 2))
    np.testing.assert_allclose(measured_snr, snr, atol=0.3)
    mix = c + ns[0]
    measured_dbfs = 20 * np.log10(np.sqrt(np.mean(mix**2)))
    np.testing.assert_allclose(measured_dbfs, dbfs, atol=0.1)


# ------------------------------------------------------------------ scenes

def test_sample_scene_respects_constraints(settings):
    opt = load_settings(settings)
    rng = np.random.default_rng(0)
    for _ in range(20):
        s = sample_scene(opt, rng)
        assert (s.room_dim >= [3, 3, 2.5]).all()
        assert (s.room_dim <= [10, 10, 3]).all()
        mic_cen = s.p_mics.mean(axis=0)
        d = np.linalg.norm(s.p_target - mic_cen)
        assert 1.0 - 0.2 <= d <= 5.0 + 0.2
        assert 3 <= len(s.p_noises) <= 5
        assert 0.05 <= s.rt60 <= 0.7
        # array faces the target: mic line is perpendicular to the
        # direction, first mic offset along rotated +y'
        for p in s.p_noises:
            v1 = (s.p_target - mic_cen)[:2]
            v2 = (p - mic_cen)[:2]
            ang = np.degrees(
                np.arccos(
                    np.clip(
                        v1 @ v2 / (np.linalg.norm(v1) * np.linalg.norm(v2)),
                        -1,
                        1,
                    )
                )
            )
            # 2-D angle can differ slightly from the 3-D constraint angle
            assert ang > 1.0


def test_sample_scene_specific_overrides(settings):
    opt = load_settings(settings)
    rng = np.random.default_rng(0)
    spec = {
        "room_dim": [5, 4, 3],
        "target_xyz": [2.5, 3.0, 1.2],
        "mics_xyz": [2.5, 1.0, 1.3],
        "noise_xyz_list": [[1.0, 1.0, 1.0]],
        "noise_snr_list": [3.0],
        "rt60": 0.3,
        "noisy_dBFS": -25.0,
    }
    s = sample_scene(opt, rng, specific=spec)
    np.testing.assert_allclose(s.room_dim, [5, 4, 3])
    np.testing.assert_allclose(s.p_target, [2.5, 3.0, 1.2])
    assert s.rt60 == 0.3
    assert s.dbfs == -25.0
    assert s.snrs_db == [3.0]
    assert len(s.p_noises) == 1


def test_builtin_settings_load_and_sample():
    """The three framework-shipped geometry JSONs load and produce scenes
    (reference ships dataset/mcse_dataset_settings{,_v2,_v3}.json)."""
    import os

    from eabnet_tpu.data.scenes import BUILTIN_SETTINGS, builtin_settings_path

    expected_mics = {"v1": 8, "v2": 9, "v3": 8}
    for name, n_mics in expected_mics.items():
        assert name in BUILTIN_SETTINGS
        path = builtin_settings_path(name)
        assert os.path.exists(path), path
        for key in (name, path, BUILTIN_SETTINGS[name]):
            opt = load_settings(key)
            assert len(opt["mic_array"]["mics"]) == n_mics
        rng = np.random.default_rng(7)
        s = sample_scene(opt, rng)
        assert s.p_mics.shape == (n_mics, 3)
        assert s.fs == 16000
    # v2 is the 9-mic 4 cm-pitch linear array
    v2 = load_settings("v2")
    ys = [m["y"] for m in v2["mic_array"]["mics"]]
    np.testing.assert_allclose(np.diff(ys), -0.04, atol=1e-12)


def test_inverse_sabine_matches_formula():
    e, order = inverse_sabine(0.3, [5, 4, 3])
    v, s = 60.0, 2 * (20 + 15 + 12)
    expect = 24 * np.log(10) * v / (343.0 * s * 0.3)
    np.testing.assert_allclose(e, expect, rtol=1e-9)
    assert order == int(np.ceil(343.0 * 0.3 / 3 - 1))
    with pytest.raises(ValueError):
        inverse_sabine(0.05, [10, 10, 3])  # too large for tiny rt60


# ------------------------------------------------------------------ RIR

def test_rir_direct_path_delay_and_attenuation():
    fs = 16000
    src, mic = [2.0, 2.0, 1.5], [4.0, 2.0, 1.5]  # 2 m apart
    h = direct_path_rir(src, mic, fs)
    peak = np.argmax(np.abs(h))
    expect_delay = 2.0 / 343.0 * fs
    assert abs(peak - expect_delay) <= 1.0
    # DC gain of the fractional-delay filter equals the 1/(4*pi*d)
    # attenuation (the peak itself is split across taps)
    np.testing.assert_allclose(np.sum(h), 1 / (4 * np.pi * 2.0), rtol=0.05)


def test_rir_rt60_of_ism():
    """Full-order ISM should decay with roughly the requested RT60."""
    fs = 16000
    room = [6.0, 5.0, 3.0]
    rt60 = 0.25
    e_abs, order = inverse_sabine(rt60, room)
    h = shoebox_rir(room, [2, 2, 1.5], np.array([[4.0, 3.0, 1.5]]),
                    e_abs, order, fs)[0]
    # Schroeder integration
    energy = np.cumsum(h[::-1] ** 2)[::-1]
    energy = energy / energy[0]
    db = 10 * np.log10(energy + 1e-12)
    # time to fall from -5 to -25 dB, extrapolated to 60 dB
    t5 = np.argmax(db < -5)
    t25 = np.argmax(db < -25)
    rt60_est = (t25 - t5) / fs * 3.0
    assert 0.5 * rt60 < rt60_est < 2.0 * rt60, rt60_est


def test_rir_hybrid_tail_extends_decay():
    fs = 16000
    room = [6.0, 5.0, 3.0]
    rt60 = 0.5
    e_abs, order = inverse_sabine(rt60, room)
    rng = np.random.default_rng(0)
    h = shoebox_rir(room, [2, 2, 1.5], np.array([[4.0, 3.0, 1.5]]),
                    e_abs, order, fs, method="hybrid", rt60=rt60, rng=rng)[0]
    assert len(h) >= int(0.9 * rt60 * fs)
    # energy must keep decaying, not explode
    a = np.sqrt(np.mean(h[: len(h) // 3] ** 2))
    b = np.sqrt(np.mean(h[-len(h) // 3 :] ** 2))
    assert b < a


def test_native_rir_matches_numpy():
    from eabnet_tpu.data.rir_native import native_available, \
        shoebox_rir_native

    if not native_available():
        pytest.skip("native RIR library not built")
    fs = 16000
    room = [6.0, 5.0, 3.0]
    mics = np.array([[4.0, 3.0, 1.5], [4.1, 3.0, 1.5]])
    e_abs, order = inverse_sabine(0.3, room)
    h_np = shoebox_rir(room, [2, 2, 1.5], mics, e_abs, order, fs)
    h_cc = shoebox_rir_native(room, [2, 2, 1.5], mics, e_abs, order, fs)
    n = min(h_np.shape[1], h_cc.shape[1])
    assert abs(h_np.shape[1] - h_cc.shape[1]) <= 81
    np.testing.assert_allclose(h_np[:, :n], h_cc[:, :n], atol=1e-5)
    # anything beyond the common length must be ~zero
    for h in (h_np, h_cc):
        if h.shape[1] > n:
            assert np.abs(h[:, n:]).max() < 1e-5


# ------------------------------------------------------------- end-to-end

def _write_fake_corpus(tmp_path, fs=16000):
    from eabnet_tpu.utils.audio_io import write_wav

    rng = np.random.default_rng(5)
    sp_dir = tmp_path / "speech"
    no_dir = tmp_path / "noise"
    sp_dir.mkdir()
    no_dir.mkdir()
    speech_names, noise_names = [], []
    for i in range(3):
        name = f"sp{i}.wav"
        write_wav(str(sp_dir / name), fs,
                  np.sin(2 * np.pi * 220 * np.arange(fs * 3) / fs) * 0.5
                  + rng.standard_normal(fs * 3) * 0.01)
        speech_names.append(name)
    for i in range(4):
        name = f"no{i}.wav"
        write_wav(str(no_dir / name), fs,
                  rng.standard_normal(fs * 3) * 0.3)
        noise_names.append(name)
    (tmp_path / "speech_list.txt").write_text("\n".join(speech_names))
    (tmp_path / "noise_list.txt").write_text("\n".join(noise_names))
    return sp_dir, no_dir


def test_synthesize_item_and_determinism(tmp_path, settings):
    sp_dir, no_dir = _write_fake_corpus(tmp_path)
    opt = load_settings(settings)
    paths = sorted(str(p) for p in no_dir.iterdir())
    a_noisy, a_clean = synthesize_item(
        opt, 2.0, str(sp_dir / "sp0.wav"), paths, seed=123
    )
    b_noisy, b_clean = synthesize_item(
        opt, 2.0, str(sp_dir / "sp0.wav"), paths, seed=123
    )
    assert a_noisy.shape == (9, 32000)
    assert a_clean.shape == (32000,)
    np.testing.assert_array_equal(a_noisy, b_noisy)  # same seed -> identical
    c_noisy, _ = synthesize_item(
        opt, 2.0, str(sp_dir / "sp0.wav"), paths, seed=124
    )
    assert np.abs(a_noisy - c_noisy).max() > 1e-4  # different seed
    assert np.isfinite(a_noisy).all()
    assert np.abs(a_noisy).max() < 1.0


def test_online_dataset_and_loader(tmp_path, settings):
    sp_dir, no_dir = _write_fake_corpus(tmp_path)
    cfg = DataConfig(
        dataset="mcse",
        speech_root=str(sp_dir),
        noise_root=str(no_dir),
        speech_list=str(tmp_path / "speech_list.txt"),
        noise_list=str(tmp_path / "noise_list.txt"),
        mcse_settings=settings,
        clip_seconds=1.0,
    )
    from eabnet_tpu.data import OnlineMcseDataset

    ds = OnlineMcseDataset(cfg, seed=1)
    assert len(ds) == 3
    noisy, clean = ds[0]
    assert noisy.shape[0] == 9

    loader = BatchLoader(ds, batch_size=2, num_workers=2, shuffle=True,
                         seed=3)
    batches = list(loader.epoch(0))
    assert len(batches) == 1
    bn, bc, bl = batches[0]
    assert bn.shape[0] == 2 and bn.shape[1] == 9
    assert bc.shape[0] == 2
    assert bl.shape == (2,) and (bl == bn.shape[-1]).all()
    # reproducibility across loader instances
    loader2 = BatchLoader(ds, batch_size=2, num_workers=0, shuffle=True,
                          seed=3)
    bn2, bc2, _ = next(iter(loader2.epoch(0)))
    np.testing.assert_array_equal(bn, bn2)
    loader.close()


def test_collate_pads_ragged_items_and_buckets():
    from eabnet_tpu.data.datasets import _collate

    rng = np.random.default_rng(0)
    items = [
        (rng.standard_normal((3, 1000)).astype(np.float32),
         rng.standard_normal(1000).astype(np.float32)),
        (rng.standard_normal((3, 1500)).astype(np.float32),
         rng.standard_normal(1500).astype(np.float32)),
    ]
    noisy, clean, lengths = _collate(items, pad_multiple=400)
    assert noisy.shape == (2, 3, 1600)     # 1500 rounded up to 400-multiple
    assert clean.shape == (2, 1600)
    np.testing.assert_array_equal(lengths, [1000, 1500])
    # originals preserved, padding zero
    np.testing.assert_array_equal(noisy[0, :, :1000], items[0][0])
    assert np.all(noisy[0, :, 1000:] == 0)
    np.testing.assert_array_equal(clean[1, :1500], items[1][1])
    assert np.all(clean[1, 1500:] == 0)


def test_fake_dataset_loader_sharded():
    ds = FakeDataset(16, mics=3, seconds=0.2)
    l0 = BatchLoader(ds, 4, shuffle=False, shard_index=0, shard_count=2)
    l1 = BatchLoader(ds, 4, shuffle=False, shard_index=1, shard_count=2)
    b0 = list(l0.epoch(0))
    b1 = list(l1.epoch(0))
    assert len(b0) == len(b1) == 2
    assert np.abs(b0[0][0] - b1[0][0]).max() > 0  # different shards


def test_device_mix_matches_host_synthesis(tmp_path, settings):
    """Device-side batched FFT propagation reproduces the host pipeline
    bit-near-exactly for the same per-item seeds (VERDICT r1 item 7)."""
    from eabnet_tpu.data.device_mix import (
        device_mix_batch,
        synthesize_item_parts,
    )

    sp_dir, no_dir = _write_fake_corpus(tmp_path)
    opt = load_settings(settings)
    paths = sorted(str(p) for p in no_dir.iterdir())

    seeds = [123, 124]
    host = [
        synthesize_item(opt, 1.0, str(sp_dir / "sp0.wav"), paths, seed=s)
        for s in seeds
    ]
    parts = [
        synthesize_item_parts(opt, 1.0, str(sp_dir / "sp0.wav"), paths,
                              seed=s)
        for s in seeds
    ]
    noisy, clean = device_mix_batch(parts)
    assert noisy.shape == (2, 9, 16000)
    assert clean.shape == (2, 16000)
    for i, (h_noisy, h_clean) in enumerate(host):
        scale = np.abs(h_noisy).max()
        np.testing.assert_allclose(noisy[i], h_noisy,
                                   atol=2e-5 * scale, rtol=1e-4)
        np.testing.assert_allclose(clean[i], h_clean,
                                   atol=2e-5 * np.abs(h_clean).max(),
                                   rtol=1e-4)


def test_loader_device_mix_matches_host_path(tmp_path, settings):
    """BatchLoader(device_mix=True) yields the same batches as the host
    synthesis path (same per-item seeds drive both)."""
    sp_dir, no_dir = _write_fake_corpus(tmp_path)
    cfg = DataConfig(
        dataset="mcse",
        speech_root=str(sp_dir),
        noise_root=str(no_dir),
        speech_list=str(tmp_path / "speech_list.txt"),
        noise_list=str(tmp_path / "noise_list.txt"),
        mcse_settings=settings,
        clip_seconds=1.0,
    )
    from eabnet_tpu.data import OnlineMcseDataset

    ds = OnlineMcseDataset(cfg, seed=5)
    host = BatchLoader(ds, batch_size=2, shuffle=False)
    dev = BatchLoader(ds, batch_size=2, shuffle=False, device_mix=True)
    (hn, hc, hl), = list(host.epoch(0))
    (dn, dc, dl), = list(dev.epoch(0))
    assert dn.shape == hn.shape and dc.shape == hc.shape
    np.testing.assert_array_equal(hl, dl)
    scale = np.abs(hn).max()
    np.testing.assert_allclose(dn, hn, atol=2e-5 * scale, rtol=1e-4)
    np.testing.assert_allclose(dc, hc, atol=2e-5 * np.abs(hc).max(),
                               rtol=1e-4)
