"""Normalization layers and PReLU for the block library.

All activations in this framework are channels-LAST:
  2-D feature maps: (B, T, F, C)   [time, freq, channels]
  1-D feature maps: (B, T, C)

`NormSwitch` mirrors the reference's BN / IN / cLN selector
(reference: EaBNet.py:662-694) with a *working* cumulative layer norm — the
reference's cLN branch crashes as written (it passes the string dim label as
`num_features`, EaBNet.py:689-691), so here cLN is a first-class citizen: the
strictly-causal norm that the streaming path relies on.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


class PReLU(nn.Module):
    """Per-channel parametric ReLU, init slope 0.25 (torch default)."""

    features: int
    init_slope: float = 0.25

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        alpha = self.param(
            "alpha",
            lambda _, shape: jnp.full(shape, self.init_slope, jnp.float32),
            (self.features,),
        )
        alpha = alpha.astype(x.dtype)
        return jnp.maximum(x, 0) + alpha * jnp.minimum(x, 0)


class InstanceNorm(nn.Module):
    """Affine instance norm over all non-(batch, channel) axes.

    Matches ``torch.nn.InstanceNorm{1,2}d(C, affine=True)`` in its default
    (no running stats) configuration: per-sample, per-channel statistics with
    biased variance, eps inside the sqrt. The reference notes this norm is
    not strictly causal at inference (EaBNet.py:46-48); cLN below is the
    causal alternative.
    """

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: (B, *spatial, C) — reduce over all spatial axes.
        axes = tuple(range(1, x.ndim - 1))
        mean = jnp.mean(x, axis=axes, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=axes, keepdims=True)
        y = (x - mean) / jnp.sqrt(var + self.eps)
        gamma = self.param("scale", nn.initializers.ones, (self.features,))
        beta = self.param("bias", nn.initializers.zeros, (self.features,))
        return y * gamma.astype(x.dtype) + beta.astype(x.dtype)


class CumulativeLayerNorm(nn.Module):
    """Strictly causal cumulative layer norm.

    At each time step t the statistics are taken over channels (and freq for
    2-D maps) of frames 0..t via cumulative sums — the running-stat design of
    the reference's cLN (EaBNet.py:696-769), with its wiring bug fixed.
    Suited to unbounded streaming: the carried state is just
    (count, sum, sum-of-squares) per sample.
    """

    features: int
    eps: float = 1e-5
    prior: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: (B, T, C) or (B, T, F, C); time is axis 1.
        # Statistics are ALWAYS f32: the cumulative E[x^2]-E[x]^2 form
        # cancels catastrophically when the sums accumulate in bf16 on
        # TPU (counts reach ~6e6 elements at T=601), driving the
        # variance negative -> sqrt NaN from the first training step.
        # The streaming step (streaming/stream.py) carries its
        # (count, sum, sq) state in f32 to match bit-for-bit.
        red_axes = tuple(range(2, x.ndim))  # channels (+freq)
        n_per_step = 1
        for a in red_axes:
            n_per_step *= x.shape[a]
        # One virtual zero-mean unit-variance frame (n_per_step pseudo
        # elements) regularizes the earliest frames: causal padding makes
        # frame-0 activations near-constant, so the raw cumulative sigma
        # can be arbitrarily small there and every norm's backward scales
        # by 1/sigma — ~30 stacked cLNs then overflow the gradients on
        # the full-size model (observed: composed cLN training NaNs by
        # step 4, f32 AND bf16). The prior bounds 1/sigma at t=0 and
        # decays as 1/t; the streaming step applies the identical prior.
        # prior=False ("cLN-ref" in NormSwitch) drops the virtual frame
        # for exact reference-intended semantics (EaBNet.py:717-726 has
        # no prior) — use it when interoperating cLN checkpoints with
        # the torch stack bit-for-bit.
        xf = x.astype(jnp.float32)
        pr = n_per_step if self.prior else 0
        step_sum = jnp.sum(xf, axis=red_axes)  # (B, T)
        step_sq = jnp.sum(jnp.square(xf), axis=red_axes)
        cum_sum = jnp.cumsum(step_sum, axis=1)
        cum_sq = jnp.cumsum(step_sq, axis=1) + pr
        cnt = (jnp.arange(1, x.shape[1] + 1, dtype=jnp.float32)
               * n_per_step) + pr
        cum_mean = cum_sum / cnt
        cum_var = jnp.maximum(cum_sq / cnt - jnp.square(cum_mean), 0.0)
        shape = cum_mean.shape + (1,) * (x.ndim - 2)
        cum_mean = cum_mean.reshape(shape)
        cum_std = jnp.sqrt(cum_var + self.eps).reshape(shape)
        y = ((xf - cum_mean) / cum_std).astype(x.dtype)
        gamma = self.param("scale", nn.initializers.ones, (self.features,))
        beta = self.param("bias", nn.initializers.zeros, (self.features,))
        return y * gamma.astype(x.dtype) + beta.astype(x.dtype)


class NormSwitch(nn.Module):
    """BN / IN / cLN selector (reference: EaBNet.py:662-694).

    "cLN" is the gradient-stabilized variant (virtual-frame prior; see
    CumulativeLayerNorm) — the recommended training configuration.
    "cLN-ref" is the exact reference-intended cumulative norm
    (EaBNet.py:717-726, no prior) for bit-exact torch interop of cLN
    checkpoints; its early-frame 1/sigma is unbounded, so prefer "cLN"
    for training from scratch.
    """

    norm_type: str
    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.norm_type == "BN":
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                name="norm",
            )(x)
        if self.norm_type == "IN":
            return InstanceNorm(self.features, name="norm")(x)
        if self.norm_type == "cLN":
            return CumulativeLayerNorm(self.features, name="norm")(x)
        if self.norm_type == "cLN-ref":
            return CumulativeLayerNorm(self.features, prior=False,
                                       name="norm")(x)
        raise ValueError(f"unknown norm_type {self.norm_type!r}")
