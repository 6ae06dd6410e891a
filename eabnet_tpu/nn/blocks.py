"""The single parameterized block library serving both EaBNet and GaGNet.

The reference keeps two near-duplicate copies of every building block
(EaBNet.py vs GaGNet.py — see SURVEY.md §2.3 duplication note); here one
library covers both via parameters:

- ``SqueezedTCM(twin_gate=True)``  = EaBNet's gated twin-branch TCM
  (reference: EaBNet.py:532-578)
- ``SqueezedTCM(twin_gate=False)`` = GaGNet's single-branch TCM
  (reference: GaGNet.py:287-326)
- ``UNetEncoder(norm_all_stages=...)`` covers the EaBNet variant that skips
  norm on stages 2-3 (EaBNet.py:218-223) and the GaGNet variant that doesn't
  (GaGNet.py:388-395).

Layout is channels-last everywhere: 2-D maps are (B, T, F, C) with time as
the first spatial axis (stride-1, causally padded) and frequency the second
(the only downsampled axis) — the layout XLA/TPU convs prefer.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from eabnet_tpu.nn.norms import NormSwitch, PReLU
from eabnet_tpu.nn.phase_conv import PhaseFreqDownConv, PhaseFreqUpConv
from eabnet_tpu.nn.s2d_conv import S2DFreqDownConv, S2DFreqUpConv


def causal_pad_t(x: jnp.ndarray, k_t: int, dilation: int = 1) -> jnp.ndarray:
    """Left-pad the time axis (axis 1) by (k_t-1)*dilation zeros."""
    if k_t <= 1:
        return x
    pad = [(0, 0)] * x.ndim
    pad[1] = ((k_t - 1) * dilation, 0)
    return jnp.pad(x, pad)


def chomp_t(x: jnp.ndarray, t: int) -> jnp.ndarray:
    """Trim the last ``t`` frames (causal conv-transpose correction,
    reference: EaBNet.py:617-624)."""
    return x[:, : x.shape[1] - t] if t > 0 else x


class GateConv2d(nn.Module):
    """GLU-gated 2-D conv, causal in time via left-pad
    (reference: EaBNet.py:434-460).

    Emits 2*out_ch channels in one conv; the top half gates the bottom half
    with a sigmoid — one MXU pass, gate fused by XLA.
    """

    out_ch: int
    kernel: Tuple[int, int]
    stride: Tuple[int, int]
    impl: str = "xla"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.impl == "s2d" and self.stride == (1, 2):
            # freq folded into channels: stride-1 conv, full 128 lanes
            y = S2DFreqDownConv(2 * self.out_ch, self.kernel,
                                name="conv")(x)
        elif self.impl == "phase" and self.stride == (1, 2):
            # polyphase decomposition: stride-1 convs over the even/odd
            # freq phases, so fwd AND bwd stay off TPU's dilated-conv path
            y = PhaseFreqDownConv(2 * self.out_ch, self.kernel,
                                  name="conv")(x)
        else:
            # causal left-pad expressed as conv-native asymmetric padding —
            # identical math to an explicit jnp.pad + VALID, but XLA never
            # materializes the padded copy in HBM
            y = nn.Conv(
                2 * self.out_ch, self.kernel, strides=self.stride,
                padding=((self.kernel[0] - 1, 0), (0, 0)), name="conv",
            )(x)
        out, gate = jnp.split(y, 2, axis=-1)
        return out * nn.sigmoid(gate)


class GateConvTranspose2d(nn.Module):
    """GLU-gated 2-D transposed conv with causal chomp
    (reference: EaBNet.py:463-490)."""

    out_ch: int
    kernel: Tuple[int, int]
    stride: Tuple[int, int]
    impl: str = "xla"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.impl == "s2d" and self.stride == (1, 2):
            y = S2DFreqUpConv(2 * self.out_ch, self.kernel,
                              name="conv")(x)  # chomp folded in
        elif self.impl == "phase" and self.stride == (1, 2):
            y = PhaseFreqUpConv(2 * self.out_ch, self.kernel,
                                name="conv")(x)  # chomp folded in
        else:
            y = nn.ConvTranspose(
                2 * self.out_ch, self.kernel, strides=self.stride,
                padding="VALID", name="conv",
            )(x)
            y = chomp_t(y, self.kernel[0] - 1)
        out, gate = jnp.split(y, 2, axis=-1)
        return out * nn.sigmoid(gate)


class Conv2dUnit(nn.Module):
    """Freq-downsampling conv + norm + PReLU inside the nested UNet
    (reference: EaBNet.py:391-407). Kernel k2 is (1, 3) by default, so time
    needs no padding."""

    kernel: Tuple[int, int]
    ch: int
    norm_type: str
    impl: str = "xla"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.impl == "s2d":
            x = S2DFreqDownConv(self.ch, self.kernel, name="conv")(x)
        elif self.impl == "phase":
            x = PhaseFreqDownConv(self.ch, self.kernel, name="conv")(x)
        else:
            x = nn.Conv(self.ch, self.kernel, strides=(1, 2),
                        padding=((self.kernel[0] - 1, 0), (0, 0)),
                        name="conv")(x)
        x = NormSwitch(self.norm_type, self.ch, name="norm")(x, train)
        return PReLU(self.ch, name="act")(x)


class Deconv2dUnit(nn.Module):
    """Freq-upsampling transposed conv + norm + PReLU
    (reference: EaBNet.py:410-431). ``cat`` variant takes doubled input
    channels (handled implicitly by lazy flax shape inference)."""

    kernel: Tuple[int, int]
    ch: int
    norm_type: str
    impl: str = "xla"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.impl == "s2d":
            x = S2DFreqUpConv(self.ch, self.kernel, name="conv")(x)
        elif self.impl == "phase":
            x = PhaseFreqUpConv(self.ch, self.kernel, name="conv")(x)
        else:
            x = nn.ConvTranspose(self.ch, self.kernel, strides=(1, 2),
                                 padding="VALID", name="conv")(x)
            x = chomp_t(x, self.kernel[0] - 1)
        x = NormSwitch(self.norm_type, self.ch, name="norm")(x, train)
        return PReLU(self.ch, name="act")(x)


def skip_connect(x_main: jnp.ndarray, x_aux: jnp.ndarray,
                 connect: str) -> jnp.ndarray:
    """add / channel-cat merge (reference: EaBNet.py:493-503)."""
    if connect == "add":
        return x_main + x_aux
    return jnp.concatenate([x_main, x_aux], axis=-1)


class EnUnetModule(nn.Module):
    """Nested mini-UNet stage (reference: EaBNet.py:331-388).

    in-conv (gated, optionally transposed) -> ``scale`` downsampling units
    -> ``scale`` upsampling units with intra skips -> residual add.
    """

    cout: int
    k1: Tuple[int, int]
    k2: Tuple[int, int]
    intra_connect: str
    norm_type: str
    scale: int
    is_deconv: bool = False
    impl: str = "xla"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        conv_cls = GateConvTranspose2d if self.is_deconv else GateConv2d
        x = conv_cls(self.cout, self.k1, (1, 2), impl=self.impl,
                     name="in_conv")(x)
        x = NormSwitch(self.norm_type, self.cout, name="in_norm")(x, train)
        x = PReLU(self.cout, name="in_act")(x)
        x_resi = x
        skips = []
        for i in range(self.scale):
            x = Conv2dUnit(self.k2, self.cout, self.norm_type,
                           impl=self.impl, name=f"enco_{i}")(x, train)
            skips.append(x)
        for i in range(self.scale):
            if i > 0:
                x = skip_connect(x, skips[-(i + 1)], self.intra_connect)
            x = Deconv2dUnit(self.k2, self.cout, self.norm_type,
                             impl=self.impl, name=f"deco_{i}")(x, train)
        return x_resi + x


class U2NetEncoder(nn.Module):
    """Four nested-UNet stages + gated out-conv; freq 161->79->39->19->9->4
    (reference: EaBNet.py:157-197). Returns (features, skip list)."""

    c: int
    k1: Tuple[int, int]
    k2: Tuple[int, int]
    intra_connect: str
    norm_type: str
    c_end: int = 64
    k_beg: Tuple[int, int] = (2, 5)
    impl: str = "xla"

    @nn.compact
    def __call__(self, x, train: bool = False):
        skips = []
        for i, scale in enumerate((4, 3, 2, 1)):
            k = self.k_beg if i == 0 else self.k1
            x = EnUnetModule(self.c, k, self.k2, self.intra_connect,
                             self.norm_type, scale, impl=self.impl,
                             name=f"unet_{i}")(x, train)
            skips.append(x)
        x = GateConv2d(self.c_end, self.k1, (1, 2), impl=self.impl,
                       name="last_conv")(x)
        x = NormSwitch(self.norm_type, self.c_end, name="last_norm")(x, train)
        x = PReLU(self.c_end, name="last_act")(x)
        skips.append(x)
        return x, skips


class UNetEncoder(nn.Module):
    """Plain 5-stage gated-conv encoder (reference: EaBNet.py:199-239).

    ``norm_stages`` marks which stages carry a norm: the EaBNet copy omits
    it on stages 1-2 (EaBNet.py:218-223); the GaGNet copy norms all five
    (GaGNet.py:384-403).
    """

    c: int
    k1: Tuple[int, int]
    norm_type: str
    c_end: int = 64
    k_beg: Tuple[int, int] = (2, 5)
    norm_stages: Tuple[bool, ...] = (True, False, False, True, True)
    impl: str = "xla"

    @nn.compact
    def __call__(self, x, train: bool = False):
        skips = []
        for i in range(5):
            ch = self.c_end if i == 4 else self.c
            k = self.k_beg if i == 0 else self.k1
            x = GateConv2d(ch, k, (1, 2), impl=self.impl,
                           name=f"conv_{i}")(x)
            if self.norm_stages[i]:
                x = NormSwitch(self.norm_type, ch, name=f"norm_{i}")(x, train)
            x = PReLU(ch, name=f"act_{i}")(x)
            skips.append(x)
        return x, skips


class U2NetDecoder(nn.Module):
    """Mirror of U2NetEncoder with skip-cat inputs
    (reference: EaBNet.py:241-279)."""

    embed_dim: int
    c: int
    k1: Tuple[int, int]
    k2: Tuple[int, int]
    intra_connect: str
    norm_type: str
    k_end: Tuple[int, int] = (2, 5)
    impl: str = "xla"

    @nn.compact
    def __call__(self, x, skips, train: bool = False):
        for i, scale in enumerate((1, 2, 3, 4)):
            x = jnp.concatenate([x, skips[-(i + 1)]], axis=-1)
            x = EnUnetModule(self.c, self.k1, self.k2, self.intra_connect,
                             self.norm_type, scale, is_deconv=True,
                             impl=self.impl, name=f"unet_{i}")(x, train)
        x = jnp.concatenate([x, skips[0]], axis=-1)
        x = GateConvTranspose2d(self.embed_dim, self.k_end, (1, 2),
                                impl=self.impl, name="last_conv")(x)
        x = NormSwitch(self.norm_type, self.embed_dim, name="last_norm")(
            x, train)
        return PReLU(self.embed_dim, name="last_act")(x)


class UNetDecoder(nn.Module):
    """Mirror of UNetEncoder (reference: EaBNet.py:282-328)."""

    embed_dim: int
    c: int
    k1: Tuple[int, int]
    norm_type: str
    k_end: Tuple[int, int] = (2, 5)
    impl: str = "xla"

    @nn.compact
    def __call__(self, x, skips, train: bool = False):
        for i in range(5):
            ch = self.embed_dim if i == 4 else self.c
            k = self.k_end if i == 4 else self.k1
            x = jnp.concatenate([x, skips[-(i + 1)]], axis=-1)
            x = GateConvTranspose2d(ch, k, (1, 2), impl=self.impl,
                                    name=f"conv_{i}")(x)
            x = NormSwitch(self.norm_type, ch, name=f"norm_{i}")(x, train)
            x = PReLU(ch, name=f"act_{i}")(x)
        return x


class SqueezedTCM(nn.Module):
    """Squeezed temporal conv module on (B, T, D) feature maps.

    ``twin_gate=True``: bottleneck 1x1 -> two parallel causally-padded
    dilated convs, left * sigmoid(right) (reference: EaBNet.py:532-578).
    ``twin_gate=False``: single dilated branch (reference: GaGNet.py:287-326).
    All pointwise convs are Dense layers (pure MXU matmuls); the dilated conv
    is a 1-D conv over time with ``kernel_dilation``.
    """

    kd1: int
    cd1: int
    d_feat: int
    dilation: int
    is_causal: bool = True
    norm_type: str = "IN"
    twin_gate: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        resi = x
        x = nn.Dense(self.cd1, use_bias=False, name="in_conv")(x)

        def branch(h, name):
            h = PReLU(self.cd1, name=f"{name}_act")(h)
            h = NormSwitch(self.norm_type, self.cd1,
                           name=f"{name}_norm")(h, train)
            full = (self.kd1 - 1) * self.dilation
            pad = (full, 0) if self.is_causal else (full // 2, full // 2)
            return nn.Conv(
                self.cd1, (self.kd1,), padding=(pad,),
                kernel_dilation=(self.dilation,), use_bias=False,
                name=f"{name}_conv",
            )(h)

        if self.twin_gate:
            x = branch(x, "left") * nn.sigmoid(branch(x, "right"))
        else:
            x = branch(x, "main")
        x = PReLU(self.cd1, name="out_act")(x)
        x = NormSwitch(self.norm_type, self.cd1, name="out_norm")(x, train)
        x = nn.Dense(self.d_feat, use_bias=False, name="out_conv")(x)
        return x + resi


class _Kernel(nn.Module):
    """Param-only mirror of a Dense/Conv kernel (same name + init, so the
    fused-kernel path shares checkpoints with the module path)."""

    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        return {"kernel": self.param("kernel",
                                     nn.initializers.lecun_normal(),
                                     self.shape)}


class _Alpha(nn.Module):
    """Param-only mirror of PReLU."""

    features: int

    @nn.compact
    def __call__(self):
        return {"alpha": self.param(
            "alpha", lambda _, s: jnp.full(s, 0.25, jnp.float32),
            (self.features,))}


class _ScaleBias(nn.Module):
    features: int

    @nn.compact
    def __call__(self):
        return {
            "scale": self.param("scale", nn.initializers.ones,
                                (self.features,)),
            "bias": self.param("bias", nn.initializers.zeros,
                               (self.features,)),
        }


class _NormParams(nn.Module):
    """Param-only mirror of NormSwitch(IN) — nested 'norm' scope."""

    features: int

    @nn.compact
    def __call__(self):
        return {"norm": _ScaleBias(self.features, name="norm")()}


class _TCMParams(nn.Module):
    """Param-only mirror of SqueezedTCM: identical tree (names, shapes,
    initializer functions and RNG paths), zero computation — the fused
    Pallas chain consumes the tree directly."""

    kd1: int
    cd1: int
    d_feat: int
    twin_gate: bool

    @nn.compact
    def __call__(self):
        out = {"in_conv": _Kernel((self.d_feat, self.cd1),
                                  name="in_conv")()}
        branches = ("left", "right") if self.twin_gate else ("main",)
        for b in branches:
            out[f"{b}_act"] = _Alpha(self.cd1, name=f"{b}_act")()
            out[f"{b}_norm"] = _NormParams(self.cd1, name=f"{b}_norm")()
            out[f"{b}_conv"] = _Kernel((self.kd1, self.cd1, self.cd1),
                                       name=f"{b}_conv")()
        out["out_act"] = _Alpha(self.cd1, name="out_act")()
        out["out_norm"] = _NormParams(self.cd1, name="out_norm")()
        out["out_conv"] = _Kernel((self.cd1, self.d_feat),
                                  name="out_conv")()
        return out


class SqueezedTCNGroup(nn.Module):
    """A chain of SqueezedTCMs with the given dilation schedule
    (reference: EaBNet.py:506-529 uses 2**i, i<p; GaGNet.py:261-284 uses an
    explicit list).

    ``impl='pallas'`` runs the whole chain as ONE activation-resident
    Pallas kernel pair (fwd + custom-VJP bwd, kernels/tcm_chain.py): the
    (B,T,256)/(B,T,64) streams never round-trip HBM between TCMs. Param
    tree, outputs and gradients are identical to the module path
    (tests/test_tcm_chain.py). Falls back to the module path for
    configurations the kernel does not cover (norm != IN, non-causal).
    """

    kd1: int
    cd1: int
    d_feat: int
    dilations: Sequence[int]
    is_causal: bool = True
    norm_type: str = "IN"
    twin_gate: bool = True
    impl: str = "xla"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if (self.impl == "pallas" and self.norm_type == "IN"
                and self.is_causal):
            from eabnet_tpu.kernels.tcm_chain import tcm_chain_pallas

            params = {
                f"tcm_{i}": _TCMParams(self.kd1, self.cd1, self.d_feat,
                                       self.twin_gate, name=f"tcm_{i}")()
                for i in range(len(self.dilations))
            }
            return tcm_chain_pallas(params, x, self.kd1, self.cd1,
                                    tuple(self.dilations), self.twin_gate)
        for i, d in enumerate(self.dilations):
            x = SqueezedTCM(self.kd1, self.cd1, self.d_feat, d,
                            self.is_causal, self.norm_type, self.twin_gate,
                            name=f"tcm_{i}")(x, train)
        return x
