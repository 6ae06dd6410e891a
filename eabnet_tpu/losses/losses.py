"""Training losses.

Numerical parity targets:
- `com_mag_mse_loss`       (reference: EaBNet.py:627-640)
- `stagewise_com_mag_mse_loss` (reference: GaGNet.py:601-619)
- `eabnet_with_postnet_loss`   (reference: EaBNet.py:642-650)

All spectra here are in the framework-native (B, T, F, 2) layout. Instead of
building per-utterance mask tensors from a Python list (host-side, shape
dynamic), the mask is a dense (B, T) 0/1 array built once with
:func:`frame_mask` — jit-friendly and shardable.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax.numpy as jnp


def frame_mask(frame_counts, num_frames: int) -> jnp.ndarray:
    """(B,) valid-frame counts -> (B, T) 0/1 mask."""
    counts = jnp.asarray(frame_counts)[:, None]
    return (jnp.arange(num_frames)[None, :] < counts).astype(jnp.float32)


def safe_mag(x: jnp.ndarray) -> jnp.ndarray:
    """sqrt(x_r^2 + x_i^2) over the trailing RI axis with a finite gradient
    at exactly-zero bins.

    Zero-padded batch frames make the estimate exactly 0 there, and
    d/dx sqrt(x^2) at 0 is inf — the frame mask multiplies that by 0,
    which is NaN, and one optimizer step then poisons every parameter.
    The where-guard routes a zero gradient through zero bins instead;
    values are bit-identical for every nonzero bin.
    """
    sq = jnp.sum(jnp.square(x), axis=-1)
    nonzero = sq > 0
    return jnp.where(nonzero, jnp.sqrt(jnp.where(nonzero, sq, 1.0)), 0.0)


def com_mag_mse_loss(esti: jnp.ndarray, label: jnp.ndarray,
                     mask: jnp.ndarray) -> jnp.ndarray:
    """0.5 * (masked magnitude MSE + masked RI MSE).

    esti, label: (B, T, F, 2); mask: (B, T).
    """
    m = mask[:, :, None]  # (B, T, 1)
    mag_e = safe_mag(esti)
    mag_l = safe_mag(label)
    denom_mag = jnp.sum(m) * esti.shape[2]
    loss_mag = jnp.sum(jnp.square(mag_e - mag_l) * m) / denom_mag
    # the RI mask counts both real and imag entries
    loss_ri = jnp.sum(jnp.square(esti - label) * m[..., None]) / (
        2.0 * denom_mag
    )
    return 0.5 * (loss_mag + loss_ri)


def stagewise_com_mag_mse_loss(
    esti_list: Sequence[jnp.ndarray],
    label: jnp.ndarray,
    mask: jnp.ndarray,
    alpha_mid: float = 0.1,
) -> jnp.ndarray:
    """Weighted multi-stage loss: alpha = 0.1 on intermediate stages, 1.0 on
    the final stage (reference: GaGNet.py:601-619)."""
    m = mask[:, :, None]
    denom = jnp.sum(m) * label.shape[2]
    mag_l = safe_mag(label)
    loss_ri = 0.0
    loss_mag = 0.0
    n = len(esti_list)
    for i, esti in enumerate(esti_list):
        alpha = 1.0 if i == n - 1 else alpha_mid
        mag_e = safe_mag(esti)
        loss_ri = loss_ri + alpha * jnp.sum(
            jnp.square(esti - label) * m[..., None]
        ) / (2.0 * denom)
        loss_mag = loss_mag + alpha * jnp.sum(
            jnp.square(mag_e - mag_l) * m
        ) / denom
    return 0.5 * (loss_ri + loss_mag)


def eabnet_with_postnet_loss(
    output: Dict, label: jnp.ndarray, mask: jnp.ndarray
) -> Dict[str, jnp.ndarray]:
    """Composite loss dict {eabnet, postnet, final}
    (reference: EaBNet.py:642-650)."""
    loss0 = com_mag_mse_loss(output["esti0"], label, mask)
    loss1 = stagewise_com_mag_mse_loss(output["esti1"], label, mask)
    return {"eabnet": loss0, "postnet": loss1, "final": loss0 + loss1}
