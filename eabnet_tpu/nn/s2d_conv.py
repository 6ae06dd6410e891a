"""Space-to-depth frequency-strided convolutions for TPU.

Second attempt at taking the encoder/decoder's stride-(1, 2) frequency
convs (reference: EaBNet.py:157-328) off XLA's zero-stuffed dilated-conv
backward path. The polyphase decomposition (nn/phase_conv.py) lost because
its ``0::2`` frequency slices and even/odd re-interleave force sublane
relayouts. This variant avoids both:

- the frequency axis is folded into *channels* by a reshape of the two
  minor dims — ``(..., F, C) -> (..., F/2, 2C)`` is contiguous in memory
  (F-major, C-minor), so no gather and no relayout of consequence;
- with C = 64 everywhere in these models, the folded channel count is
  exactly 128 = one full TPU lane tile, doubling MXU lane utilization of
  every conv;
- the strided/transposed conv becomes a plain **stride-1** conv over the
  folded axis with a slightly larger, partially-zeroed kernel, so forward,
  grad-input, and grad-weight are all dense stride-1 convolutions.

Kernel mapping (odd kf only; the models use kf in {3, 5}).

Down (== ``nn.Conv(strides=(1,2), padding=((kt-1,0),(0,0))``, i.e. causal
time, VALID freq): out[j] = sum_s x[2j+s] w[s]. Folding x2[g] =
[x[2g] | x[2g+1]] gives a kf2 = (kf+1)/2 tap VALID conv with

    w2[t, 0:C ]  = w[2t]
    w2[t, C:2C]  = w[2t+1]   (zero when 2t+1 == kf)

Up (== ``chomp_t(nn.ConvTranspose(strides=(1,2), padding='VALID'), kt-1)``):
folding the *output* instead, out2[g] = [out[2g] | out[2g+1]], gives a
kf2 = (kf+1)/2 tap conv with freq padding ((kf-1)/2, Go - F) and

    w2[t, :, 0:Co ]  = w[2t]      (even output bins)
    w2[t, :, Co:2Co] = w[2t-1]    (odd bins; zero when t == 0)

and the output unfolds with another free minor-dim reshape.

The ~1/kf2 zero-block MXU waste is the price for full lanes + stride-1
gradients. Parameters are named/shaped exactly like ``nn.Conv`` /
``nn.ConvTranspose`` so checkpoints, the .pth converter, and streaming are
unaffected. Selected with ``impl="s2d"`` on the encoder/decoder blocks.

MEASURED RESULT (TPU v5e, bf16, batch 8, T=601, round 2): still loses to
XLA's native strided/transposed convs — encoder fwd+bwd 22.7 ms vs
15.8 ms, decoder 31.8 ms vs 23.8 ms (back-to-back A/B via
``tools/bench_components.py --stages encoder,decoder --conv-impl
s2d|xla``). The (F, C) -> (F/2, 2C) fold is itself a tile relayout (it
merges two sublane rows into one lane row), and the zero-block kernel
waste adds ~1/kf2 FLOPs; together they outweigh the stride-1-gradient
win. Conclusion after two attempts (see also nn/phase_conv.py): Mosaic's
strided-conv lowering is already near the achievable floor for these
shapes, so ``impl="xla"`` stays the default and both alternatives remain
as parity-tested experiment records.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn
from jax import lax

_DN = ("NHWC", "HWIO", "NHWC")


def _conv(x: jnp.ndarray, w: jnp.ndarray, pad_t: Tuple[int, int],
          pad_f: Tuple[int, int]) -> jnp.ndarray:
    dt = jnp.promote_types(x.dtype, w.dtype)
    return lax.conv_general_dilated(
        x.astype(dt), w.astype(dt), (1, 1), (pad_t, pad_f),
        dimension_numbers=_DN)


def s2d_down_conv(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Stride-(1,2) conv, causal time pad, VALID frequency; no bias."""
    kt, kf, cin, cout = kernel.shape
    if kf % 2 == 0:
        raise ValueError(f"s2d conv needs odd freq kernel, got {kf}")
    b, t, f, _ = x.shape
    f_out = (f - kf) // 2 + 1
    if f % 2:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 0)))
    x2 = x.reshape(b, t, -1, 2 * cin)
    kf2 = (kf + 1) // 2
    w2 = jnp.zeros((kt, kf2, 2 * cin, cout), kernel.dtype)
    w2 = w2.at[:, :, :cin].set(kernel[:, 0::2])
    w2 = w2.at[:, : kf // 2, cin:].set(kernel[:, 1::2])
    y = _conv(x2, w2, (kt - 1, 0), (0, 0))
    return y[:, :, :f_out]


def s2d_up_conv(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Causal transposed conv, freq stride 2 (== ConvTranspose + chomp_t)."""
    kt, kf, cin, cout = kernel.shape
    if kf % 2 == 0:
        raise ValueError(f"s2d conv needs odd freq kernel, got {kf}")
    b, t, f, _ = x.shape
    f_out = 2 * f + kf - 2
    g_out = (f_out + 1) // 2
    p = (kf - 1) // 2
    kf2 = p + 1
    w2 = jnp.zeros((kt, kf2, cin, 2 * cout), kernel.dtype)
    w2 = w2.at[:, :, :, :cout].set(kernel[:, 0::2])
    w2 = w2.at[:, 1:, :, cout:].set(kernel[:, 1::2])
    y = _conv(x, w2, (kt - 1, 0), (p, g_out - f))
    return y.reshape(b, t, 2 * g_out, cout)[:, :, :f_out]


class S2DFreqDownConv(nn.Module):
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
        y = s2d_down_conv(x, kernel)
        return y + bias.astype(y.dtype)


class S2DFreqUpConv(nn.Module):
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
        y = s2d_up_conv(x, kernel)
        return y + bias.astype(y.dtype)
