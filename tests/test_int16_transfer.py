"""int16 batch transport (DataConfig.transfer_int16): the loader ships
the wavs' native int16 samples, the jitted step dequantizes on-device —
bit-identical losses to the float32 path for int16-sourced wavs, at half
the host->device bytes."""

import os

import jax
import numpy as np
import pytest

from eabnet_tpu.config import (
    ComposedConfig,
    EaBNetConfig,
    ExperimentConfig,
    GaGNetConfig,
    TrainConfig,
)
from eabnet_tpu.data.datasets import OfflineMcseDataset, _collate
from eabnet_tpu.data.synth_speech import synth_utterance
from eabnet_tpu.train.step import create_train_state, make_eval_step
from eabnet_tpu.utils.audio_io import write_wav


@pytest.fixture(scope="module")
def pair_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("i16")
    os.makedirs(root / "clean")
    os.makedirs(root / "noisy")
    rng = np.random.default_rng(8)
    for i in range(2):
        x = synth_utterance(0.4, seed=70 + i)
        write_wav(str(root / "clean" / f"{i}.wav"), 16000, x)
        noisy = np.stack([x + 0.1 * rng.standard_normal(len(x))
                          for _ in range(3)])
        write_wav(str(root / "noisy" / f"{i}.wav"), 16000, noisy)
    return str(root)


def test_float_source_uses_fixed_pcm_scale(tmp_path):
    """Non-int16 sources quantize with the fixed [-1,1] scale, NOT
    per-file peak normalization (which would rescale clean and noisy
    independently and distort their SNR relationship)."""
    os.makedirs(tmp_path / "clean")
    os.makedirs(tmp_path / "noisy")
    x = np.full(64, 0.25, np.float32)  # peak well below full scale
    write_wav(str(tmp_path / "clean" / "0.wav"), 16000, x, dtype="float32")
    write_wav(str(tmp_path / "noisy" / "0.wav"), 16000,
              np.stack([x, x]), dtype="float32")
    ds = OfflineMcseDataset(str(tmp_path), transfer_int16=True)
    noisy, clean = ds[0]
    assert clean.dtype == np.int16
    np.testing.assert_allclose(clean, int(0.25 * 32767), atol=1)


def test_int16_batches_halve_bytes_and_match_float_loss(pair_root):
    ds16 = OfflineMcseDataset(pair_root, transfer_int16=True)
    ds32 = OfflineMcseDataset(pair_root)
    n16, c16, len16 = _collate([ds16[0], ds16[1]])
    n32, c32, len32 = _collate([ds32[0], ds32[1]])
    assert n16.dtype == np.int16 and c16.dtype == np.int16
    assert n32.dtype == np.float32
    assert n16.nbytes * 2 == n32.nbytes
    np.testing.assert_array_equal(len16, len32)
    # dequantization identity: disk int16 / 32768 IS the float path
    np.testing.assert_array_equal(n16.astype(np.float32) / 32768.0, n32)

    cfg = ExperimentConfig(
        model=ComposedConfig(
            eabnet=EaBNetConfig(c=8, M=3, embed_dim=8, cd1=8, p=1, q=1),
            gagnet=GaGNetConfig(c=8, cd1=8, p=1, q=1, dilas=(1,)),
        ),
        train=TrainConfig(batch_size=2, wav_len=0.4),
    )
    model, state = create_train_state(cfg, jax.random.key(0))
    eval_step = make_eval_step(cfg, model)
    l16, _ = eval_step(state, n16, c16, len16)
    l32, _ = eval_step(state, n32, c32, len32)
    assert float(l16["final"]) == float(l32["final"])
