"""Params-only release artifacts (`<iter>.params`).

The shipping format for trained models: a third the size of a training
checkpoint (no Adam moments), loadable by every surface, optimizer
reinitialized on resume — the same degradation the reference applies to
optimizer-less `.pth` files (reference: train_distributed.py:48-57).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from eabnet_tpu.config import (
    ComposedConfig,
    DataConfig,
    EaBNetConfig,
    ExperimentConfig,
    GaGNetConfig,
    TrainConfig,
)


def tiny_cfg(tmp_path):
    return ExperimentConfig(
        model=ComposedConfig(
            eabnet=EaBNetConfig(c=8, M=3, embed_dim=8, cd1=8, p=2, q=1),
            gagnet=GaGNetConfig(c=8, cd1=8, p=1, q=1, dilas=(1, 2)),
        ),
        data=DataConfig(dataset="fake", clip_seconds=0.2, num_workers=0),
        train=TrainConfig(
            batch_size=2, wav_len=0.2, total_epoch=1,
            checkpoint_dir=str(tmp_path / "ckpt"),
            exp_root=str(tmp_path),
        ),
    )


def test_params_roundtrip_and_fresh_optimizer(tmp_path):
    from eabnet_tpu.train.checkpoint import load_checkpoint, save_params
    from eabnet_tpu.train.step import create_train_state

    cfg = tiny_cfg(tmp_path)
    _, state = create_train_state(cfg, jax.random.key(1))
    path = save_params(state.params, str(tmp_path / "rel"), step=42)
    assert os.path.basename(path) == "42.params"

    _, fresh = create_train_state(cfg, jax.random.key(2))
    restored, epoch = load_checkpoint(path, fresh, cfg)
    assert epoch == 0
    assert int(restored.step) == 42
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        restored.params, state.params,
    )
    # optimizer state is the fresh one (not carried by the artifact)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        restored.opt_state, fresh.opt_state,
    )


def test_latest_checkpoint_ranking(tmp_path):
    from eabnet_tpu.train.checkpoint import latest_checkpoint

    d = tmp_path / "ckpts"
    d.mkdir()
    for name in ("5.params", "4.pth", "3.ckpt"):
        (d / name).touch()
    # highest iteration wins regardless of format
    assert latest_checkpoint(str(d)).endswith("5.params")
    # at equal iteration the full checkpoint (optimizer state) wins
    (d / "5.ckpt").touch()
    assert latest_checkpoint(str(d)).endswith("5.ckpt")


def test_export_tool_feeds_enhancer(tmp_path):
    from eabnet_tpu.inference import load_enhancer
    from eabnet_tpu.train.checkpoint import save_checkpoint, save_config
    from eabnet_tpu.train.step import create_train_state
    from tools.export_params import main as export_main

    cfg = tiny_cfg(tmp_path)
    _, state = create_train_state(cfg, jax.random.key(0))
    state = state.replace(step=np.asarray(7, np.int32))
    save_config(cfg, str(tmp_path))
    save_checkpoint(state, epoch=0, directory=cfg.train.checkpoint_dir)

    out = tmp_path / "release"
    export_main(["--exp-root", str(tmp_path), "--out", str(out)])
    assert (out / "7.params").exists()
    assert (out / "config.json").exists()
    # a third the size of the full checkpoint (params only, no moments)
    full = os.path.getsize(tmp_path / "ckpt" / "7.ckpt")
    rel = os.path.getsize(out / "7.params")
    assert rel < 0.45 * full

    enhancer = load_enhancer(str(out))
    wav = np.random.default_rng(0).standard_normal(
        (3, 3200)).astype(np.float32) * 0.1
    enhanced = enhancer(wav)
    assert np.isfinite(np.asarray(enhanced)).all()
