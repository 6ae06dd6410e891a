"""Scene-parameter online synthesis (data/scene_mix.py): the device-side
reconstruction must reproduce the host pipeline — scenes, crops and gains
exactly; the early RIR to float tolerance; the late-field per-bin energy
exactly (its carrier noise is the one legitimately device-drawn piece).

Reference behavior being preserved: dataset/mcse_dataset.py:52-260 (online
synthesis), dataset/audio_util.py:49-88 (make_audio: hybrid rooms + the
anechoic clean target at the reference mic).
"""

import json

import numpy as np
import pytest

from eabnet_tpu.data.datasets import OnlineMcseDataset, synthesize_item
from eabnet_tpu.data.scenes import load_settings
from eabnet_tpu.data import BatchLoader
from eabnet_tpu.config import DataConfig

from test_data import SETTINGS_V2, _write_fake_corpus  # noqa: F401


@pytest.fixture
def settings(tmp_path):
    p = tmp_path / "settings.json"
    p.write_text(json.dumps(SETTINGS_V2))
    return str(p)


def _scene_args(tmp_path, settings, seed=123, clip=1.0):
    sp_dir, no_dir = _write_fake_corpus(tmp_path)
    opt = load_settings(settings)
    paths = sorted(str(p) for p in no_dir.iterdir())
    return opt, str(sp_dir / "sp0.wav"), paths, seed, clip


def test_snr_gains_match_mix_at_snr():
    from eabnet_tpu.data.mixer import mix_at_snr, snr_gains

    rng = np.random.default_rng(7)
    fs = 16000
    clean = rng.standard_normal(fs).astype(np.float32) * 0.3
    noises = [rng.standard_normal(fs).astype(np.float32) * s
              for s in (0.5, 0.05)]
    snrs = [3.0, -2.0]
    c_ref, n_ref = mix_at_snr(clean, noises, snrs, -20.0, fs)
    g_c, g_n = snr_gains(clean, noises, snrs, -20.0, fs)
    np.testing.assert_allclose(clean * g_c, c_ref, rtol=1e-6, atol=1e-9)
    for noise, g, ref in zip(noises, g_n, n_ref):
        np.testing.assert_allclose(noise * g, ref, rtol=1e-6, atol=1e-9)


def test_scene_early_rirs_match_host():
    """Device windowed-sinc scatter == host ism_early_rir (same math,
    f32 vs f64)."""
    from eabnet_tpu.data.rir import ism_early_rir, ism_image_params
    from eabnet_tpu.data.scene_mix import scene_early_rirs

    room, src = [6.0, 4.5, 2.8], [4.0, 3.0, 1.4]
    mics = np.stack([[2.0, 1.5 + 0.04 * i, 1.2] for i in range(4)])
    host, _ = ism_early_rir(room, src, mics, 0.35, 3, 16000,
                            air_absorption=1.5e-3)
    delays, amps = ism_image_params(room, src, mics, 0.35, 3, 16000,
                                    air_absorption=1.5e-3)
    pad = 64 * ((host.shape[1] + 63) // 64 + 2)
    dev = np.asarray(scene_early_rirs(
        delays.astype(np.float32)[None], amps.astype(np.float32)[None],
        pad,
    ))[0]
    scale = np.abs(host).max()
    np.testing.assert_allclose(dev[:, : host.shape[1]], host,
                               atol=3e-5 * scale, rtol=1e-3)
    assert np.abs(dev[:, host.shape[1]:]).max() <= 1e-7 * scale


def test_scene_tail_per_bin_energy_exact():
    """Device tail carries EXACTLY the histogram's per-bin energy (the
    host synthesis normalizes each bin's carrier, rir.py:290-296 — so
    energy is deterministic even though the carrier is random)."""
    from eabnet_tpu.data.scene_mix import scene_tails

    rng = np.random.default_rng(3)
    b, s, m, nb, spb = 2, 3, 4, 11, 64
    hist = rng.random((b, s, m, nb)).astype(np.float32) * 1e-4
    hist[0, 1] = 0.0  # padded source -> silent tail
    amp = np.sqrt(hist)
    seeds = rng.integers(0, 2**31, size=(b, s)).astype(np.uint32)
    tail = np.asarray(scene_tails(amp, seeds, spb))
    assert tail.shape == (b, s, m, nb * spb)
    energy = (tail.reshape(b, s, m, nb, spb) ** 2).sum(-1)
    np.testing.assert_allclose(energy, hist, rtol=1e-4, atol=1e-12)
    assert np.abs(tail[0, 1]).max() == 0.0
    # different seeds -> different carriers, same energy
    tail2 = np.asarray(scene_tails(amp, seeds + 1, spb))
    assert np.abs(tail2 - tail).max() > 0


def test_scene_clean_target_matches_host(tmp_path, settings):
    """End-to-end: the scene-mode clean target (device crop x gain,
    direct-path convolution) equals the host pipeline's — pinning scene
    sampling, RNG-stream order, crops, gains and the direct path in one
    shot. (The noisy mixture differs only in the late-tail carrier
    sample, by design.)"""
    from eabnet_tpu.data.scene_mix import (
        collate_scenes,
        load_corpus_int16,
        mix_scene,
        scene_static_dims,
        synthesize_item_scene,
    )

    opt, sp_path, paths, seed, clip = _scene_args(tmp_path, settings)
    h_noisy, h_clean = synthesize_item(opt, clip, sp_path, paths,
                                       seed=seed)
    item = synthesize_item_scene(opt, clip, sp_path, paths, seed=seed,
                                 speech_index=0)
    dims = scene_static_dims(opt, clip)
    batch = collate_scenes([item], dims)
    sp_names = ["sp0.wav", "sp1.wav", "sp2.wav"]
    no_names = [f"no{i}.wav" for i in range(4)]
    corpus_sp = load_corpus_int16(str(tmp_path / "speech"), sp_names,
                                  16000)
    corpus_no = load_corpus_int16(str(tmp_path / "noise"), no_names,
                                  16000)
    noisy, clean = mix_scene(batch, corpus_sp, corpus_no, dims)
    noisy, clean = np.asarray(noisy), np.asarray(clean)
    assert noisy.shape == (1, 9, 16000) and clean.shape == (1, 16000)
    np.testing.assert_allclose(
        clean[0], h_clean, atol=3e-5 * np.abs(h_clean).max(), rtol=1e-3)
    # the mixtures share everything but the tail carrier sample; at this
    # settings' rt60 range the late tail carries 30-50 % of the RIR
    # energy, and the near-tonal fixture "speech" samples each RIR's
    # transfer function at essentially one frequency — so correlation is
    # strong (not perfect) and energies agree loosely per realization
    # (the deterministic energy pin is test_scene_full_rir_energy).
    hn = h_noisy[0]
    dn = noisy[0, 0]
    corr = float(np.dot(hn, dn)
                 / (np.linalg.norm(hn) * np.linalg.norm(dn) + 1e-12))
    assert corr > 0.5, corr
    assert 0.5 < np.linalg.norm(dn) / np.linalg.norm(hn) < 2.0


def test_scene_full_rir_energy(tmp_path, settings):
    """Reconstructed full RIR energy per (source, mic) matches the host
    render's — only random early-x-tail cross terms remain (the per-bin
    tail energies and the early part are exact)."""
    from eabnet_tpu.data.rir import shoebox_rir
    from eabnet_tpu.data.scene_mix import (
        collate_scenes, scene_early_rirs, scene_static_dims, scene_tails,
        synthesize_item_scene,
    )
    from eabnet_tpu.data.scenes import sample_scene

    opt, sp_path, paths, seed, clip = _scene_args(tmp_path, settings)
    item = synthesize_item_scene(opt, clip, sp_path, paths, seed=seed,
                                 speech_index=0)
    dims = scene_static_dims(opt, clip)
    batch = collate_scenes([item], dims)
    early = np.asarray(scene_early_rirs(batch["delays"], batch["amps"],
                                        dims["early_pad"]))
    tail = np.asarray(scene_tails(batch["hist_amp"], batch["tail_seeds"],
                                  dims["spb"]))
    s = item["delays"].shape[0]
    e_dev = (early[0, :s] ** 2).sum(-1) + (tail[0, :s] ** 2).sum(-1)

    # replay the host path's scene draw (same RNG prefix) and render the
    # host RIRs
    rng = np.random.default_rng(seed)
    lo, hi = opt["noise"]["n"]
    k = int(rng.integers(lo, hi + 1))
    rng.integers(0, len(paths), size=k)
    scene = sample_scene(opt, rng, n_noises_override=k)
    srcs = [scene.p_target] + list(scene.p_noises)
    for si, p_src in enumerate(srcs):
        h = shoebox_rir(scene.room_dim, p_src, np.asarray(scene.p_mics),
                        scene.e_absorption, scene.max_order, 16000,
                        method=scene.rir_method, rt60=scene.rt60,
                        rng=np.random.default_rng(1000 + si))
        e_host = (h.astype(np.float64) ** 2).sum(-1)
        np.testing.assert_allclose(e_dev[si], e_host, rtol=0.08)


def test_scene_loader_shapes_and_determinism(tmp_path, settings):
    sp_dir, no_dir = _write_fake_corpus(tmp_path)
    cfg = DataConfig(
        dataset="mcse", speech_root=str(sp_dir), noise_root=str(no_dir),
        speech_list=str(tmp_path / "speech_list.txt"),
        noise_list=str(tmp_path / "noise_list.txt"),
        mcse_settings=settings, clip_seconds=1.0,
    )
    ds = OnlineMcseDataset(cfg, seed=5)
    loader = BatchLoader(ds, batch_size=2, shuffle=False,
                         device_mix="scene")
    (b1,) = list(loader.epoch(0))
    (b2,) = list(loader.epoch(0))
    assert set(b1) >= {"sp_idx", "no_idx", "gains", "delays", "amps",
                       "hist_amp", "d_delay", "d_amp", "tail_seeds",
                       "lengths"}
    s_max = 1 + SETTINGS_V2["noise"]["n"][1]
    assert b1["gains"].shape == (2, s_max)
    assert b1["delays"].shape[:2] == (2, s_max)
    for k in b1:
        np.testing.assert_array_equal(b1[k], b2[k])  # reproducible


def _tiny_cfg(settings, sp_dir, no_dir, tmp_path, device_mix,
              transfer_int16=False):
    from eabnet_tpu.config import (
        ComposedConfig, EaBNetConfig, ExperimentConfig, GaGNetConfig,
        TrainConfig,
    )

    return ExperimentConfig(
        model=ComposedConfig(
            eabnet=EaBNetConfig(M=9, c=16, embed_dim=16, cd1=16, p=2, q=1),
            gagnet=GaGNetConfig(c=12, cd1=12, p=1, q=1, dilas=(1, 2)),
        ),
        data=DataConfig(
            dataset="mcse", train_set="online",
            speech_root=str(sp_dir), noise_root=str(no_dir),
            speech_list=str(tmp_path / "speech_list.txt"),
            noise_list=str(tmp_path / "noise_list.txt"),
            mcse_settings=settings, clip_seconds=1.0,
            device_mix=device_mix, transfer_int16=transfer_int16,
            num_workers=0,
        ),
        train=TrainConfig(
            batch_size=2, wav_len=1.0, total_epoch=10**9, log_every=10,
            valid_interval=1e18, saving_interval=1e18,
            checkpoint_dir=str(tmp_path / f"ckpt_{device_mix}"),
            exp_root=str(tmp_path), fixed_seed=True,
        ),
    )


def test_fused_steps_track_host_step(tmp_path, settings):
    """One train step through each data mode from identical seeds: the
    'parts' fused step sees the SAME audio as the host path (same RNG
    renders the RIR tails host-side), so its loss must match closely;
    the 'scene' step differs only in the tail carrier sample, so its
    loss must be near."""
    import jax

    from eabnet_tpu.train.step import create_train_state, make_train_step
    from eabnet_tpu.data.scene_mix import (
        load_corpus_int16, scene_static_dims,
    )

    sp_dir, no_dir = _write_fake_corpus(tmp_path)
    losses = {}
    for mode in (False, "parts", "scene"):
        cfg = _tiny_cfg(settings, sp_dir, no_dir, tmp_path, mode)
        ds = OnlineMcseDataset(cfg.data, seed=5)
        dims = scene_static_dims(ds.opt, 1.0)
        loader = BatchLoader(ds, batch_size=2, shuffle=False,
                             device_mix=mode,
                             rir_pad=dims["l_rir"] if mode else 0)
        (batch,) = list(loader.epoch(0))
        model, state = create_train_state(cfg, jax.random.key(0))
        if mode == "scene":
            step = make_train_step(cfg, model, donate=False,
                                   batch_kind="scene", scene_dims=dims)
            corpus_sp = load_corpus_int16(
                str(sp_dir), ["sp0.wav", "sp1.wav", "sp2.wav"], 16000)
            corpus_no = load_corpus_int16(
                str(no_dir), [f"no{i}.wav" for i in range(4)], 16000)
            _, out = step(state, batch, corpus_sp, corpus_no)
        elif mode == "parts":
            step = make_train_step(cfg, model, donate=False,
                                   batch_kind="parts")
            _, out = step(state, batch)
        else:
            step = make_train_step(cfg, model, donate=False)
            _, out = step(state, *batch)
        losses[mode] = float(out["final"])
        assert np.isfinite(losses[mode])
    assert losses["parts"] == pytest.approx(losses[False], rel=1e-3)
    assert losses["scene"] == pytest.approx(losses[False], rel=0.15)


def test_parts_quantized_transport_close(tmp_path, settings):
    from eabnet_tpu.data.device_mix import (
        collate_parts, mix_parts, synthesize_item_parts,
    )

    opt, sp_path, paths, seed, clip = _scene_args(tmp_path, settings)
    parts = [synthesize_item_parts(opt, clip, sp_path, paths, seed=s)
             for s in (11, 12)]
    b_f32 = collate_parts(parts, s_max=6)
    b_q = collate_parts(parts, s_max=6, quantize=True)
    assert b_q["sources"].dtype == np.int16
    assert b_q["rirs"].dtype == np.int16
    n = b_f32["sources"].shape[-1]
    noisy_f, clean_f = (np.asarray(x) for x in mix_parts(b_f32, n))
    noisy_q, clean_q = (np.asarray(x) for x in mix_parts(b_q, n))
    # each source and each RIR quantizes at ~3e-5 of its own peak; with
    # up to 6 sources x 9 RIRs the mixture error lands ~3e-4 of the
    # mixture scale — well under the int16 wav floor the offline path
    # already accepts (mixtures are leveled at -35..-15 dBFS, so the wav
    # floor is 1e-3..1e-2 of mixture scale)
    scale = np.abs(noisy_f).max()
    np.testing.assert_allclose(noisy_q, noisy_f, atol=1e-3 * scale)
    np.testing.assert_allclose(
        clean_q, clean_f, atol=1e-3 * np.abs(clean_f).max())


def test_trainer_e2e_scene_mode(tmp_path, settings):
    """Two real trainer steps through device_mix='scene' (loader ->
    collate -> device corpus -> fused step -> checkpoint)."""
    from eabnet_tpu.train.trainer import train
    from eabnet_tpu.train.checkpoint import latest_checkpoint

    sp_dir, no_dir = _write_fake_corpus(tmp_path)
    cfg = _tiny_cfg(settings, sp_dir, no_dir, tmp_path, "scene")
    train(cfg, max_steps=2)
    assert latest_checkpoint(cfg.train.checkpoint_dir) is not None
