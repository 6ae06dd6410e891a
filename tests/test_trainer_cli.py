"""End-to-end trainer + CLI tests on the fake dataset (tiny model, CPU)."""

import json
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


def tiny_cfg(tmp_path, **train_kw):
    return ExperimentConfig(
        model=ComposedConfig(
            eabnet=EaBNetConfig(c=8, M=3, embed_dim=8, cd1=8, p=2, q=1),
            gagnet=GaGNetConfig(c=8, cd1=8, p=1, q=1, dilas=(1, 2)),
        ),
        data=DataConfig(dataset="fake", clip_seconds=0.2, num_workers=0),
        train=TrainConfig(
            **{
                "batch_size": 4,
                "wav_len": 0.2,
                "total_epoch": 1,
                "log_every": 2,
                "checkpoint_dir": str(tmp_path / "ckpt"),
                "exp_root": str(tmp_path),
                **train_kw,
            }
        ),
    )


@pytest.mark.slow
def test_trainer_end_to_end_with_resume(tmp_path, capsys):
    from eabnet_tpu.train.trainer import train

    cfg = tiny_cfg(tmp_path, total_epoch=3)
    train(cfg, max_steps=3)
    out = capsys.readouterr().out
    assert "model parameters" in out

    ckpts = [f for f in os.listdir(cfg.train.checkpoint_dir)
             if f.endswith(".ckpt")]
    assert "3.ckpt" in ckpts
    assert os.path.exists(tmp_path / "config.json")
    # TensorBoard event file written
    tb = [f for f in os.listdir(cfg.train.checkpoint_dir)
          if "tfevents" in f]
    assert tb

    # resume continues from iter 3
    train(cfg, max_steps=5)
    out = capsys.readouterr().out
    assert "resumed" in out
    ckpts = [f for f in os.listdir(cfg.train.checkpoint_dir)
             if f.endswith(".ckpt")]
    assert "5.ckpt" in ckpts


@pytest.mark.slow
def test_enhance_and_test_cli(tmp_path, capsys):
    from eabnet_tpu.cli import enhance as enhance_cli
    from eabnet_tpu.cli import test as test_cli
    from eabnet_tpu.train.trainer import train
    from eabnet_tpu.utils.audio_io import read_wav, write_wav

    cfg = tiny_cfg(tmp_path)
    train(cfg, max_steps=1)
    capsys.readouterr()

    # --- enhance CLI on a wav file
    rng = np.random.default_rng(0)
    wav_in = tmp_path / "in.wav"
    write_wav(str(wav_in), 16000,
              rng.standard_normal((3, 3200)).astype(np.float32) * 0.1)
    wav_out = tmp_path / "out.wav"
    enhance_cli.main([
        str(wav_in), str(wav_out), "--exp-root", str(tmp_path),
        "--mic-permutation", "2,0,1",
    ])
    sr, enhanced = read_wav(str(wav_out))
    assert sr == 16000
    assert enhanced.ndim == 1 and len(enhanced) > 2000
    assert np.isfinite(enhanced).all()

    # --- offline val set + test CLI
    val_dir = tmp_path / "val"
    (val_dir / "clean").mkdir(parents=True)
    (val_dir / "noisy").mkdir(parents=True)
    for i in range(2):
        clean = rng.standard_normal(3200).astype(np.float32) * 0.1
        noisy = np.stack([clean] * 3) + rng.standard_normal(
            (3, 3200)
        ).astype(np.float32) * 0.02
        write_wav(str(val_dir / "clean" / f"{i}.wav"), 16000, clean)
        write_wav(str(val_dir / "noisy" / f"{i}.wav"), 16000, noisy)

    cfg_path = tmp_path / "cfg_eval.json"
    cfg_path.write_text(cfg.to_json())
    test_cli.main([
        "--config", str(cfg_path),
        "--set", f'data.dataset="mcse"',
        "--set", f'data.val_set="{val_dir}"',
        "--out-prefix", str(tmp_path / "scores"),
    ])
    out = capsys.readouterr().out
    assert "si_sdr" in out
    assert (tmp_path / "scores.csv").exists()


def test_config_override_roundtrip(tmp_path):
    from eabnet_tpu.cli.common import _apply_overrides

    cfg = tiny_cfg(tmp_path)
    import dataclasses

    d = dataclasses.asdict(cfg)
    d = _apply_overrides(
        d, ["train.lr=0.001", 'model.eabnet.norm_type="BN"']
    )
    cfg2 = ExperimentConfig.from_dict(d)
    assert cfg2.train.lr == 0.001
    assert cfg2.model.eabnet.norm_type == "BN"
    # json roundtrip preserves everything
    cfg3 = ExperimentConfig.from_json(cfg2.to_json())
    assert cfg3 == cfg2
