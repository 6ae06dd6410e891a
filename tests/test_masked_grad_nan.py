"""Regression: zero-padded batch frames must not poison gradients.

Padded items make the input spectra — and therefore EaBNet's esti0 —
exactly 0 on padded frames. sqrt(x^2) and arctan2 have inf/NaN gradients
at exactly 0, and `mask * inf = NaN`, so one optimizer step turned every
parameter NaN (found via tests/test_trainer_cli.py in round 2). The
guards live in losses.safe_mag and the GaGNet CRM combine.
"""

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
from eabnet_tpu.losses import com_mag_mse_loss, frame_mask
from eabnet_tpu.losses.losses import safe_mag
from eabnet_tpu.train import create_train_state, make_train_step


def test_safe_mag_values_and_grads():
    x = jnp.asarray([[3.0, 4.0], [0.0, 0.0], [-1.0, 0.0]])
    np.testing.assert_allclose(safe_mag(x), [5.0, 0.0, 1.0])
    g = jax.grad(lambda a: jnp.sum(safe_mag(a)))(x)
    assert bool(jnp.isfinite(g).all())
    np.testing.assert_allclose(g[0], [0.6, 0.8])
    np.testing.assert_allclose(g[1], [0.0, 0.0])


def test_masked_loss_grad_finite_on_zero_frames():
    rng = np.random.default_rng(0)
    esti = jnp.asarray(rng.standard_normal((2, 6, 5, 2)), jnp.float32)
    esti = esti.at[:, 3:].set(0.0)  # padded frames: exactly zero
    label = jnp.asarray(rng.standard_normal((2, 6, 5, 2)), jnp.float32)
    label = label.at[:, 3:].set(0.0)
    mask = frame_mask(jnp.asarray([3, 3]), 6)

    g = jax.grad(lambda e: com_mag_mse_loss(e, label, mask))(esti)
    assert bool(jnp.isfinite(g).all())
    # masked frames contribute nothing
    np.testing.assert_allclose(g[:, 3:], 0.0)


def test_train_step_params_stay_finite_with_padded_batch():
    """One full composed train step on a batch whose items are shorter than
    the padded length: params must stay finite after the update."""
    cfg = ExperimentConfig(
        model=ComposedConfig(
            eabnet=EaBNetConfig(c=8, M=3, embed_dim=8, cd1=8, p=2, q=1),
            gagnet=GaGNetConfig(c=8, cd1=8, p=1, q=1, dilas=(1, 2)),
        ),
        data=DataConfig(dataset="fake", clip_seconds=0.2, num_workers=0),
        train=TrainConfig(batch_size=2, wav_len=0.4),
    )
    model, state = create_train_state(cfg, jax.random.key(0))
    step = make_train_step(cfg, model, donate=False)
    rng = np.random.default_rng(0)
    n_pad = int(cfg.train.wav_len * cfg.stft.sr)  # padded batch length
    n_true = n_pad // 2                           # true item length
    noisy = np.zeros((2, 3, n_pad), np.float32)
    target = np.zeros((2, n_pad), np.float32)
    noisy[..., :n_true] = rng.standard_normal((2, 3, n_true)) * 0.1
    target[..., :n_true] = rng.standard_normal((2, n_true)) * 0.1
    state, losses = step(state, jnp.asarray(noisy), jnp.asarray(target),
                         jnp.asarray([n_true, n_true], jnp.int32))
    assert all(bool(jnp.isfinite(v)) for v in losses.values()), losses
    bad = [
        jax.tree_util.keystr(p)
        for p, l in jax.tree.leaves_with_path(state.params)
        if not bool(jnp.isfinite(l).all())
    ]
    assert not bad, bad[:10]
