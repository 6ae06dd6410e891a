"""Asserted end-to-end quality gate (VERDICT r1 item 9; widened per
VERDICT r2 item 3 to intelligibility metrics).

Trains a reduced model on a deterministic synthetic corpus with full online
room-acoustics synthesis, then asserts the enhanced output beats the noisy
baseline on SI-SDR *and* PESQ *and* STOI/ESTOI by margins — so a quality
regression in either energy terms or intelligibility terms (not just a
plumbing regression) fails the suite. Slow-marked; run with --run-slow.

Gate design: small rooms with mild reverb (rt60 0.1-0.2 s, target
0.5-1.5 m) so the anechoic-target task is learnable in 120 CPU steps, and
negative SNR (-10..-5 dB) so the noisy baseline leaves real headroom.
The corpus is the FORMANT speech synthesizer (data/synth_speech.py) —
round 3 replaced the old pink-noise corpus that pinned ESTOI at ~0.05
even clean-vs-noisy, so PESQ/STOI/ESTOI are now discriminative here. The
gate scores the bare EaBNet stage — exactly what the reference's own eval
battery scores (test.py:160-165 loads EaBNet without the postnet); the
GaGNet refinement needs far more training than a CI budget before it
helps.

Round-3 calibration on the speech corpus (120 CPU steps, 2 val items):
noisy -12.51 dB SI-SDR / 1.41 PESQ / 0.497 STOI / 0.202 ESTOI ->
model  -3.59 dB        / 1.84      / 0.556      / 0.276. The margins
below sit at roughly half the measured improvements, leaving
seed/platform headroom. This gate caught two real bugs in round 2
(masked-gradient NaN; compressed-domain reconstruction — NOTES_r2.md).
"""

import copy
import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.e2e_demo import SETTINGS, make_corpus  # noqa: E402

GATE_SETTINGS = copy.deepcopy(SETTINGS)
GATE_SETTINGS["room"]["min_dim"] = [3, 3, 2.5]
GATE_SETTINGS["room"]["max_dim"] = [5, 5, 3]
GATE_SETTINGS["room"]["rt60"] = [0.1, 0.2]
GATE_SETTINGS["target"]["dist_to_mic_array"] = [0.5, 1.5]
GATE_SETTINGS["noise"]["SNR"] = [-10, -5]


@pytest.mark.slow
def test_training_improves_si_sdr_over_noisy(tmp_path):
    import jax

    from eabnet_tpu.config import (
        ComposedConfig,
        DataConfig,
        EaBNetConfig,
        ExperimentConfig,
        GaGNetConfig,
        TrainConfig,
    )
    from eabnet_tpu.data import OfflineMcseDataset
    from eabnet_tpu.eval import evaluate_dataset
    from eabnet_tpu.inference import Enhancer
    from eabnet_tpu.train.checkpoint import (
        latest_checkpoint,
        load_checkpoint,
    )
    from eabnet_tpu.train.step import create_train_state
    from eabnet_tpu.train.trainer import train

    root = str(tmp_path)
    sp_dir, no_dir = make_corpus(root, n_speech=24, n_noise=8, seconds=2.0)
    settings_path = os.path.join(root, "settings.json")
    with open(settings_path, "w") as f:
        json.dump(GATE_SETTINGS, f)

    from eabnet_tpu.cli.datagen import main as datagen_main
    from eabnet_tpu.cli.split import main as split_main

    split_main(["--speech-root", sp_dir, "--noise-root", no_dir,
                "--out-dir", os.path.join(root, "lists")])
    datagen_main([
        "--output-dir", os.path.join(root, "val"),
        "--speech-root", sp_dir, "--noise-root", no_dir,
        "--speech-list", os.path.join(root, "lists", "speechs_val"),
        "--noise-list", os.path.join(root, "lists", "noises_val"),
        "--mcse-settings", settings_path, "--clip-seconds", "2",
        "--workers", "2", "--limit", "2",
    ])

    cfg = ExperimentConfig(
        model=ComposedConfig(
            eabnet=EaBNetConfig(M=9, c=24, embed_dim=24, cd1=24, p=3, q=2),
            gagnet=GaGNetConfig(c=16, cd1=16, p=1, q=1, dilas=(1, 2, 5)),
        ),
        data=DataConfig(
            dataset="mcse", train_set="online",
            speech_root=sp_dir, noise_root=no_dir,
            speech_list=os.path.join(root, "lists", "speechs_train"),
            noise_list=os.path.join(root, "lists", "noises_train"),
            mcse_settings=settings_path,
            val_set=os.path.join(root, "val"),
            clip_seconds=2.0, num_workers=2,
        ),
        train=TrainConfig(
            batch_size=4, wav_len=2.0, total_epoch=10000, log_every=50,
            valid_interval=1e9, saving_interval=1e9,
            checkpoint_dir=os.path.join(root, "ckpt"),
            exp_root=root, fixed_seed=True,
        ),
    )
    train(cfg, max_steps=120)

    ckpt = latest_checkpoint(cfg.train.checkpoint_dir)
    assert ckpt is not None
    _, state = create_train_state(cfg, jax.random.key(0))
    state, _ = load_checkpoint(ckpt, state, cfg)
    enhancer = Enhancer(cfg, state.params, output="esti0")
    val = OfflineMcseDataset(os.path.join(root, "val"))

    def items():
        for i in range(len(val)):
            noisy, clean = val[i]
            yield np.atleast_2d(noisy), np.asarray(clean).reshape(-1)

    acc_model, _ = evaluate_dataset(enhancer, items(), sr=16000)
    acc_noisy, _ = evaluate_dataset(lambda n: n[0], items(), sr=16000)

    def m(acc, key):
        return acc.mean_std(key)[0]

    # quality gate: the trained beamformer must beat the raw noisy
    # reference mic by real margins on energy AND intelligibility AND
    # perceptual quality (round-3 calibration in the module docstring)
    assert m(acc_model, "si_sdr") > m(acc_noisy, "si_sdr") + 4.5, (
        m(acc_model, "si_sdr"), m(acc_noisy, "si_sdr"))
    assert m(acc_model, "pesq") > m(acc_noisy, "pesq") + 0.20, (
        m(acc_model, "pesq"), m(acc_noisy, "pesq"))
    assert m(acc_model, "stoi") > m(acc_noisy, "stoi") + 0.02, (
        m(acc_model, "stoi"), m(acc_noisy, "stoi"))
    assert m(acc_model, "estoi") > m(acc_noisy, "estoi") + 0.03, (
        m(acc_model, "estoi"), m(acc_noisy, "estoi"))

    # the composed (postnet) output is exercised for plumbing: finite
    # audio, even though 120 steps is far too few for the refinement
    # stage to help (the reference's eval also scores the bare EaBNet)
    composed = Enhancer(cfg, state.params, output="esti")
    noisy0, _ = val[0]
    out = composed(np.atleast_2d(noisy0))
    assert np.isfinite(out).all()
