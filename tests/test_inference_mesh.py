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

    # cLN: the TIME-CAUSAL norm of the shipped artifacts. The per-item ==
    # batched equality contract holds only for fully causal configs
    # (causal convs + unidirectional LSTM + cLN); IN computes
    # whole-utterance statistics, so its outputs depend weakly on the
    # total padded length by construction (see Enhancer.enhance_batch).
    cfg = ExperimentConfig(
        model=ComposedConfig(
            eabnet=EaBNetConfig(M=3, c=16, embed_dim=16, cd1=16, p=2, q=1,
                                norm_type="cLN"),
            gagnet=GaGNetConfig(c=12, cd1=12, p=1, q=1, dilas=(1, 2),
                                norm_type="cLN"),
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
    # ragged lengths, fewer items than devices (exercises batch padding).
    # 4800/6500/8000 share a 0.5 s bucket; 12000 forces the batch bucket
    # PAST the short items' solo buckets (the padding-extension path) and
    # 8000 sits exactly on a bucket boundary (zero natural tail — the
    # reflect-pad divergence case the guaranteed zero tail fixes)
    wavs = [
        (rng.standard_normal((3, n)) * 0.05).astype(np.float32)
        for n in (4800, 8000, 6500, 12000)
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


def test_freq_sharded_serving_matches_single_device(tiny_setup):
    """Frequency-axis MODEL parallelism (Enhancer(shard_freq=True)): a
    1x8 ('data','freq') mesh splits the STFT tensor's F axis over all
    devices — lane-parallel LSTM-BF recurrence, halo-exchanged freq
    convs — for batch-1 LATENCY scaling. GSPMD preserves semantics, so
    the output must equal the single-device path.

    Reference analog: none (enhance.py is single-GPU); SURVEY §5 names
    freq as the natural model-parallel axis."""
    import jax

    from eabnet_tpu.inference import Enhancer
    from eabnet_tpu.parallel import make_mesh

    cfg, params = tiny_setup
    mesh = make_mesh(("data", "freq"), sizes=(1, -1))
    assert mesh.shape["freq"] == 8

    rng = np.random.default_rng(7)
    wav = (rng.standard_normal((3, 9600)) * 0.05).astype(np.float32)

    solo = Enhancer(cfg, params)
    sharded = Enhancer(cfg, params, mesh=mesh, shard_freq=True)
    np.testing.assert_allclose(sharded(wav), solo(wav), atol=2e-5,
                               rtol=0)

    with pytest.raises(ValueError, match="freq"):
        Enhancer(cfg, params, shard_freq=True)  # no mesh
    del jax


def test_mesh_batch_rejects_mixed_mic_counts(tiny_setup):
    from eabnet_tpu.inference import Enhancer
    from eabnet_tpu.parallel import make_mesh

    cfg, params = tiny_setup
    meshed = Enhancer(cfg, params, mesh=make_mesh())
    wavs = [np.zeros((3, 4000), np.float32),
            np.zeros((4, 4000), np.float32)]
    with pytest.raises(ValueError, match="mic count"):
        meshed.enhance_batch(wavs)


def test_mesh_batch_rejects_bad_permutation(tiny_setup):
    """Mixed-mic batches and out-of-range permutations raise the intended
    ValueError (mic-count uniformity is validated BEFORE the permutation
    is applied, so it can't surface as an opaque IndexError)."""
    from eabnet_tpu.inference import Enhancer

    cfg, params = tiny_setup
    solo = Enhancer(cfg, params)
    wavs = [np.zeros((3, 4000), np.float32),
            np.zeros((4, 4000), np.float32)]
    with pytest.raises(ValueError, match="mic count"):
        solo.enhance_batch(wavs, mic_permutation=[0, 1, 2])
    with pytest.raises(ValueError, match="out of range"):
        solo.enhance_batch([wavs[0]], mic_permutation=[0, 1, 5])


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
