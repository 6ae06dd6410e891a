"""Misc coverage: bf16 compute, corpus split tool, pad_spec."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.mark.slow
def test_bf16_train_step(tmp_path):
    from tests.test_trainer_cli import tiny_cfg

    cfg = tiny_cfg(tmp_path, compute_dtype="bfloat16")
    from eabnet_tpu.train import create_train_state, make_train_step

    model, state = create_train_state(cfg, jax.random.key(0))
    step = make_train_step(cfg, model, donate=False)
    rng = np.random.default_rng(0)
    n = int(cfg.train.wav_len * cfg.stft.sr)
    noisy = (rng.standard_normal((4, 3, n)) * 0.1).astype(np.float32)
    target = (rng.standard_normal((4, n)) * 0.1).astype(np.float32)
    prev = None
    for _ in range(3):
        state, losses = step(state, jnp.asarray(noisy), jnp.asarray(target))
        cur = float(losses["final"])
        assert np.isfinite(cur)
        prev = cur
    # params stay f32 (mixed precision: bf16 compute, f32 master weights)
    assert jax.tree.leaves(state.params)[0].dtype == jnp.float32


def test_split_tool(tmp_path):
    from eabnet_tpu.cli.split import main, split

    names = [f"f{i:03d}.wav" for i in range(42)]
    train, val = split(names, ratio=20, seed=123)
    assert len(val) == 2 and len(train) == 40
    assert set(train) | set(val) == set(names)
    assert not set(train) & set(val)
    # deterministic
    t2, v2 = split(names, ratio=20, seed=123)
    assert train == t2 and val == v2

    sp = tmp_path / "speech"
    no = tmp_path / "noise"
    sp.mkdir()
    no.mkdir()
    for i in range(5):
        (sp / f"s{i}.wav").write_bytes(b"")
        (no / f"n{i}.wav").write_bytes(b"")
    main(["--speech-root", str(sp), "--noise-root", str(no),
          "--out-dir", str(tmp_path / "lists")])
    assert (tmp_path / "lists" / "speechs_train").exists()
    assert (tmp_path / "lists" / "noises_val").exists()


def test_pad_spec():
    from eabnet_tpu.eval.metrics import pad_spec_to_multiple

    x = np.ones((1, 2, 161, 100))
    y = pad_spec_to_multiple(x, 64, axis=-1)
    assert y.shape[-1] == 128
    assert y[..., 100:].sum() == 0
    z = pad_spec_to_multiple(np.ones((1, 64)), 64, axis=-1)
    assert z.shape[-1] == 64
