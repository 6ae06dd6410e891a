"""Phase-decomposed frequency-strided convolutions for TPU.

Every down/up-sampling conv in the reference operates on the frequency
axis with stride 2 (reference: EaBNet.py:157-328 encoder/decoder stacks).
XLA lowers the transposed convs (and the input-gradients of the strided
convs) to base-dilated convolutions — the input is zero-stuffed before a
stride-1 convolution, which wastes half the MXU work and falls off TPU's
fastest conv path.

These modules compute the identical math as stride-1 convolutions over the
even/odd frequency *phases* (the classic sub-pixel / polyphase identity):

- down (stride 2):   y = conv(x[..., 0::2, :], w[:, 0::2])
                       + conv(x[..., 1::2, :], w[:, 1::2])
- up (transposed):   out[..., 0::2, :] = conv(x, w[:, 0::2])   (even taps)
                     out[..., 1::2, :] = conv(x, w[:, 1::2])   (odd taps)

so the forward AND both backward convs are plain dense stride-1
convolutions. Parameters are named and shaped exactly like
``nn.Conv``/``nn.ConvTranspose`` (kernel ``(kt, kf, Cin, Cout)``, bias
``(Cout,)``), so checkpoints, the .pth converter, and the streaming engine
are unaffected.

MEASURED RESULT (TPU v5e, bf16, batch 8, T=601, round 2): this loses to
XLA's native strided/transposed convs — encoder fwd+bwd 27.4 ms vs
16.3 ms, decoder 40.2 ms vs 23.6 ms (``tools/bench_components.py
--stages encoder|decoder --conv-impl phase|xla``). The frequency axis is
the sublane dimension of the (8, 128) tile, so the ``0::2`` phase slices
and the even/odd re-interleave each force relayouts that cost more than
the zero-stuffed dilated-conv path they avoid. Mosaic's conv lowering
already handles stride-2 well at these shapes. The blocks therefore
default to ``impl="xla"``; this module stays as a parity-tested
alternative (``impl="phase"``) for shapes/hardware where the tradeoff
flips.

Semantics reproduced bit-for-bit (up to f32 summation order, ~1e-6):
- ``PhaseFreqDownConv``  == ``nn.Conv(strides=(1, 2),
  padding=((kt-1, 0), (0, 0)))`` — causal in time, VALID in frequency.
- ``PhaseFreqUpConv``    == ``chomp_t(nn.ConvTranspose(strides=(1, 2),
  padding='VALID'), kt-1)`` — the causal chomp is folded into the time
  padding.

Only odd frequency kernels (the models use kf in {3, 5}) are supported.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn
from jax import lax

_DN = ("NHWC", "HWIO", "NHWC")


def _conv(x: jnp.ndarray, w: jnp.ndarray, pad_t: Tuple[int, int],
          pad_f: Tuple[int, int]) -> jnp.ndarray:
    # match flax nn.Conv's default dtype promotion (inputs and kernel are
    # promoted to a common dtype, bf16 stays bf16 only if both are bf16)
    dt = jnp.promote_types(x.dtype, w.dtype)
    return lax.conv_general_dilated(
        x.astype(dt), w.astype(dt), (1, 1), (pad_t, pad_f),
        dimension_numbers=_DN)


def phase_down_conv(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Stride-(1,2) conv, causal time pad, VALID frequency; no bias."""
    kt, kf = kernel.shape[0], kernel.shape[1]
    if kf % 2 == 0:
        raise ValueError(f"phase conv needs odd freq kernel, got {kf}")
    f_out = (x.shape[2] - kf) // 2 + 1
    y = _conv(x[:, :, 0::2], kernel[:, 0::2], (kt - 1, 0), (0, 0))
    y = y[:, :, :f_out]
    if kf > 1:
        yo = _conv(x[:, :, 1::2], kernel[:, 1::2], (kt - 1, 0), (0, 0))
        y = y + yo[:, :, :f_out]
    return y


def phase_up_conv(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Causal transposed conv, freq stride 2 (== ConvTranspose + chomp_t)."""
    kt, kf = kernel.shape[0], kernel.shape[1]
    if kf % 2 == 0:
        raise ValueError(f"phase conv needs odd freq kernel, got {kf}")
    if kf == 1:
        raise ValueError("phase_up_conv requires kf >= 3 (the odd-phase "
                         "branch would get an empty kernel at kf == 1)")
    b, t, f, _ = x.shape
    out_f = 2 * f + kf - 2
    p = (kf - 1) // 2
    ye = _conv(x, kernel[:, 0::2], (kt - 1, 0), (p, p))
    yo = _conv(x, kernel[:, 1::2], (kt - 1, 0), (p - 1, p - 1))
    ne, no = ye.shape[2], yo.shape[2]
    if no < ne:
        yo = jnp.pad(yo, ((0, 0), (0, 0), (0, ne - no), (0, 0)))
    y = jnp.stack([ye, yo], axis=3).reshape(b, t, 2 * ne, -1)
    return y[:, :, :out_f]


class PhaseFreqDownConv(nn.Module):
    """Drop-in for ``nn.Conv(features, (kt, kf), strides=(1, 2),
    padding=((kt-1, 0), (0, 0)))`` — identical params and math."""

    features: int
    kernel_size: Tuple[int, int]

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kt, kf = self.kernel_size
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (kt, kf, x.shape[-1], self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        y = phase_down_conv(x, kernel)
        return y + bias.astype(y.dtype)


class PhaseFreqUpConv(nn.Module):
    """Drop-in for ``chomp_t(nn.ConvTranspose(features, (kt, kf),
    strides=(1, 2), padding='VALID'), kt-1)`` — identical params/math."""

    features: int
    kernel_size: Tuple[int, int]

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kt, kf = self.kernel_size
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (kt, kf, x.shape[-1], self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        y = phase_up_conv(x, kernel)
        return y + bias.astype(y.dtype)
