"""Mesh-parallel batch serving (Enhancer(mesh=...) + enhance_batch).

The multi-chip inference path: params replicate over the mesh, the
batch shards over the 'data' axis, and ragged file lists are padded to
a common bucketed length + a batch multiple of the mesh size. Runs on
the virtual 8-device CPU mesh (conftest). Equality with the per-item
single-device path is exact up to float reassociation because the model
is causal in time and zero-frame padding contributes nothing before an
item's own end. Reference analog: none — enhance.py:14-63 serves one
file on one GPU.
"""

import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_setup():
    import jax

    from eabnet_tpu.config import (ComposedConfig, EaBNetConfig,
                                   ExperimentConfig, GaGNetConfig)
    from eabnet_tpu.train.step import create_train_state

    cfg = ExperimentConfig(
        model=ComposedConfig(
            eabnet=EaBNetConfig(M=3, c=16, embed_dim=16, cd1=16, p=2, q=1),
            gagnet=GaGNetConfig(c=12, cd1=12, p=1, q=1, dilas=(1, 2)),
        ),
    )
    _, state = create_train_state(cfg, jax.random.key(0))
    return cfg, state.params


def test_mesh_batch_matches_per_item(tiny_setup):
    import jax

    from eabnet_tpu.inference import Enhancer
    from eabnet_tpu.parallel import make_mesh

    cfg, params = tiny_setup
    assert len(jax.devices()) == 8

    rng = np.random.default_rng(3)
    # ragged lengths, fewer items than devices (exercises batch padding)
    wavs = [
        (rng.standard_normal((3, n)) * 0.05).astype(np.float32)
        for n in (4800, 8000, 6500)
    ]

    solo = Enhancer(cfg, params, bucket_seconds=0.5)
    meshed = Enhancer(cfg, params, bucket_seconds=0.5,
                      mesh=make_mesh())
    assert meshed._batch_quantum == 8

    ref = [solo(w) for w in wavs]
    got = meshed.enhance_batch(wavs)

    assert len(got) == len(wavs)
    for r, g, w in zip(ref, got, wavs):
        assert g.shape == (w.shape[-1],)
        np.testing.assert_allclose(g, r, atol=2e-5, rtol=0)


def test_mesh_batch_rejects_mixed_mic_counts(tiny_setup):
    from eabnet_tpu.inference import Enhancer
    from eabnet_tpu.parallel import make_mesh

    cfg, params = tiny_setup
    meshed = Enhancer(cfg, params, mesh=make_mesh())
    wavs = [np.zeros((3, 4000), np.float32),
            np.zeros((4, 4000), np.float32)]
    with pytest.raises(ValueError, match="mic count"):
        meshed.enhance_batch(wavs)


def test_enhance_files_batched(tiny_setup, tmp_path):
    from eabnet_tpu.inference import Enhancer
    from eabnet_tpu.parallel import make_mesh
    from eabnet_tpu.utils.audio_io import read_wav, write_wav

    cfg, params = tiny_setup
    rng = np.random.default_rng(11)
    in_paths, out_paths, wavs = [], [], []
    for i, n in enumerate((4000, 7200)):
        w = (rng.standard_normal((3, n)) * 0.05).astype(np.float32)
        p = str(tmp_path / f"in{i}.wav")
        write_wav(p, cfg.stft.sr, w, dtype="float")
        sr_back, w_back = read_wav(p)
        in_paths.append(p)
        out_paths.append(str(tmp_path / f"out{i}.wav"))
        wavs.append(w_back if w_back.ndim == 2 else w_back[None])

    meshed = Enhancer(cfg, params, bucket_seconds=0.5, mesh=make_mesh())
    meshed.enhance_files(in_paths, out_paths)

    solo = Enhancer(cfg, params, bucket_seconds=0.5)
    for p, w in zip(out_paths, wavs):
        assert os.path.exists(p)
        sr, got = read_wav(p)
        assert sr == cfg.stft.sr
        np.testing.assert_allclose(got, solo(w), atol=2e-5, rtol=0)
