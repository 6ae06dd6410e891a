"""Fused execution of a GaGNet glance-gaze stage.

The reference runs each refinement stage as 3 (or 2, squeezed) sequential
TCN stacks — glance, gaze-real, gaze-imag (reference: GaGNet.py:92-258) —
each a chain of p*len(dilas) SqueezedTCMs whose convs/matmuls are small at
(B, T) granularity, so the stage is dominated by kernel-launch and HBM
round-trip overhead rather than FLOPs.

The stacks are structurally identical and mutually independent, so this
module executes them *stacked*: every Dense becomes one batched einsum over
a leading stack axis S, every dilated conv a vmapped (grouped) conv, and
the four input projections (glance/gaze x main/gate) collapse into a single
matmul. FLOPs are unchanged; op count drops ~3x and each op gets S-fold
more rows for the MXU.

Parameters are declared through name-mirroring holder modules so the
variable tree is IDENTICAL to the unfused ``GlanceGazeModule`` — same
checkpoints, same .pth converter mapping, same streaming engine. A parity
test (tests/test_gagnet_fused.py) initializes one tree and asserts equal
outputs and gradients through both paths.

Only norm_type "IN"/"cLN" are fusible (BatchNorm's running stats don't
vmap); GaGNet falls back to the unfused modules for "BN".

MEASURED RESULT (TPU v5e, bf16, batch 8, T=601, round 2): a wash —
fwd+bwd 21.19 ms fused vs 21.61 ms unfused (back-to-back A/B,
``tools/bench_components.py --stages gagnet --gag-fused on|off``). The
premise was wrong for TPU: inside a single compiled XLA program there is
no per-op launch cost to amortize, and stacking does not reduce the
activation bytes moving through HBM, which is what actually bounds the
stage. ``fused_stages`` therefore defaults to False (simplest proven
path); the module remains as a parity-tested alternative and a recorded
experiment. A real win here would need an activation-resident Pallas
kernel (the TCM chain's (B,T,64) bottleneck fits VMEM), cutting HBM
round-trips rather than op count.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax

from eabnet_tpu.config import GaGNetConfig


def _flatten_spec(x: jnp.ndarray) -> jnp.ndarray:
    """(B, T, F, 2) -> (B, T, 2F), same row order as gagnet._flatten_spec."""
    return jnp.concatenate([x[..., 0], x[..., 1]], axis=-1)


class _Dense(nn.Module):
    """Param-holder mirroring ``nn.Dense(features)``: returns (kernel, bias)
    without computing anything."""

    in_dim: int
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.in_dim, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros,
                       (self.features,), jnp.float32) if self.use_bias \
            else None
        return k, b


class _Conv1d(nn.Module):
    """Param-holder mirroring ``nn.Conv(features, (k,), use_bias=False)``."""

    k: int
    in_dim: int
    features: int

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          (self.k, self.in_dim, self.features), jnp.float32)


class _PReLU(nn.Module):
    """Param-holder mirroring ``eabnet_tpu.nn.norms.PReLU``."""

    features: int
    init_slope: float = 0.25

    @nn.compact
    def __call__(self):
        return self.param(
            "alpha",
            lambda _, shape: jnp.full(shape, self.init_slope, jnp.float32),
            (self.features,))


class _ScaleBias(nn.Module):
    features: int

    @nn.compact
    def __call__(self):
        return (self.param("scale", nn.initializers.ones, (self.features,)),
                self.param("bias", nn.initializers.zeros, (self.features,)))


class _Norm(nn.Module):
    """Param-holder mirroring ``NormSwitch`` (IN / cLN): child scope
    "norm" holding scale+bias."""

    features: int

    @nn.compact
    def __call__(self):
        return _ScaleBias(self.features, name="norm")()


class _TCMParams(nn.Module):
    """Param-holder mirroring ``SqueezedTCM(twin_gate=False)``."""

    kd1: int
    cd1: int
    d_feat: int

    @nn.compact
    def __call__(self):
        return {
            "in": _Dense(self.d_feat, self.cd1, use_bias=False,
                         name="in_conv")()[0],
            "main_act": _PReLU(self.cd1, name="main_act")(),
            "main_norm": _Norm(self.cd1, name="main_norm")(),
            "main_conv": _Conv1d(self.kd1, self.cd1, self.cd1,
                                 name="main_conv")(),
            "out_act": _PReLU(self.cd1, name="out_act")(),
            "out_norm": _Norm(self.cd1, name="out_norm")(),
            "out": _Dense(self.cd1, self.d_feat, use_bias=False,
                          name="out_conv")()[0],
        }


class _GroupParams(nn.Module):
    cfg: GaGNetConfig

    @nn.compact
    def __call__(self):
        return [
            _TCMParams(self.cfg.kd1, self.cfg.cd1, self.cfg.d_feat,
                       name=f"tcm_{j}")()
            for j in range(len(self.cfg.dilas))
        ]


def _stack_tree(trees):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


def _sdense(x, k):
    dt = jnp.promote_types(x.dtype, k.dtype)
    return jnp.einsum("sbtc,scd->sbtd", x.astype(dt), k.astype(dt))


def _sprelu(x, alpha):
    a = alpha[:, None, None, :].astype(x.dtype)
    return jnp.maximum(x, 0) + a * jnp.minimum(x, 0)


def _snorm(x, scale_bias, norm_type: str, eps: float = 1e-5):
    scale, bias = scale_bias
    if norm_type == "IN":
        # InstanceNorm on (B,T,C) reduces time only (norms.py:51-56);
        # stacked layout (S,B,T,C) -> reduce axis 2
        mean = jnp.mean(x, axis=2, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=2, keepdims=True)
        y = (x - mean) / jnp.sqrt(var + eps)
    elif norm_type in ("cLN", "cLN-ref"):
        # CumulativeLayerNorm on (B,T,C): stats over channels, cumulative
        # over time — must match norms.py exactly: f32 statistics,
        # unit-variance virtual-frame prior (dropped for "cLN-ref"),
        # clamped variance
        n = x.shape[-1]
        pr = n if norm_type == "cLN" else 0
        xf = x.astype(jnp.float32)
        cum_sum = jnp.cumsum(jnp.sum(xf, axis=-1), axis=2)
        cum_sq = jnp.cumsum(jnp.sum(jnp.square(xf), axis=-1), axis=2) + pr
        cnt = (jnp.arange(1, x.shape[2] + 1, dtype=jnp.float32) * n) + pr
        mean = (cum_sum / cnt)[..., None]
        var = jnp.maximum((cum_sq / cnt)[..., None] - jnp.square(mean),
                          0.0)
        y = ((xf - mean) / jnp.sqrt(var + eps)).astype(x.dtype)
    else:  # pragma: no cover - guarded by fusion eligibility
        raise ValueError(f"unfusible norm {norm_type!r}")
    return y * scale[:, None, None, :].astype(x.dtype) \
        + bias[:, None, None, :].astype(x.dtype)


def _sconv1d(x, k, dilation: int, is_causal: bool):
    """x (S,B,T,C), k (S,kd,C,C): per-stack dilated conv over time."""
    kd = k.shape[1]
    full = (kd - 1) * dilation
    pad = (full, 0) if is_causal else (full // 2, full // 2)
    dt = jnp.promote_types(x.dtype, k.dtype)

    def one(a, w):
        return lax.conv_general_dilated(
            a, w, (1,), (pad,), rhs_dilation=(dilation,),
            dimension_numbers=("NHC", "HIO", "NHC"))

    return jax.vmap(one)(x.astype(dt), k.astype(dt))


def _run_stacked_tcn(x, groups, cfg: GaGNetConfig):
    """x (S,B,T,D); groups = list over p of list over dilas of stacked
    TCM param dicts."""
    for grp in groups:
        for tcm, dila in zip(grp, cfg.dilas):
            resi = x
            h = _sdense(x, tcm["in"])
            h = _sprelu(h, tcm["main_act"])
            h = _snorm(h, tcm["main_norm"], cfg.norm_type)
            h = _sconv1d(h, tcm["main_conv"], dila, cfg.is_causal)
            h = _sprelu(h, tcm["out_act"])
            h = _snorm(h, tcm["out_norm"], cfg.norm_type)
            x = _sdense(h, tcm["out"]) + resi
    return x


class FusedGlanceGaze(nn.Module):
    """Drop-in for ``GlanceGazeModule`` — identical param tree, fused
    stacked execution (see module docstring)."""

    cfg: GaGNetConfig

    @nn.compact
    def __call__(self, feat_x, pre_x, train: bool = False):
        cfg = self.cfg
        pre_flat = _flatten_spec(pre_x)
        inpt = jnp.concatenate([feat_x, pre_flat], axis=-1)
        in_dim = inpt.shape[-1]

        def stack_params(prefix):
            # groups live DIRECTLY under the block scope, mirroring
            # GlanceBlock/GazeBlock's f"{prefix}_{g}" SqueezedTCNGroups
            return [_GroupParams(cfg, name=f"{prefix}_{g}")()
                    for g in range(cfg.p)]

        class _Glance(nn.Module):
            @nn.compact
            def __call__(self):
                return {
                    "in_main": _Dense(in_dim, cfg.d_feat, name="in_main")(),
                    "in_gate": _Dense(in_dim, cfg.d_feat, name="in_gate")(),
                    "tcn": stack_params("tcn"),
                    "head": _Dense(cfg.d_feat, cfg.freq_bins,
                                   name="head")(),
                }

        class _Gaze(nn.Module):
            @nn.compact
            def __call__(self):
                d = {
                    "in_main": _Dense(in_dim, cfg.d_feat, name="in_main")(),
                    "in_gate": _Dense(in_dim, cfg.d_feat, name="in_gate")(),
                    "head_r": _Dense(cfg.d_feat, cfg.freq_bins,
                                     name="head_r")(),
                    "head_i": _Dense(cfg.d_feat, cfg.freq_bins,
                                     name="head_i")(),
                }
                if cfg.is_squeezed:
                    d["tcn_ri"] = stack_params("tcn_ri")
                else:
                    d["tcn_r"] = stack_params("tcn_r")
                    d["tcn_i"] = stack_params("tcn_i")
                return d

        gl = _Glance(name="glance")()
        gz = _Gaze(name="gaze")()

        # one matmul for all four input projections (same input)
        kin = jnp.concatenate(
            [gl["in_main"][0], gl["in_gate"][0],
             gz["in_main"][0], gz["in_gate"][0]], axis=-1)
        bin_ = jnp.concatenate(
            [gl["in_main"][1], gl["in_gate"][1],
             gz["in_main"][1], gz["in_gate"][1]], axis=-1)
        dt = jnp.promote_types(inpt.dtype, kin.dtype)
        proj = inpt.astype(dt) @ kin.astype(dt) + bin_.astype(dt)
        gm, gg, zm, zg = jnp.split(proj, 4, axis=-1)
        x_g = gm * nn.sigmoid(gg)
        x_z = zm * nn.sigmoid(zg)

        # stack the independent TCN stacks and run them fused
        if cfg.is_squeezed:
            stacks = [gl["tcn"], gz["tcn_ri"]]
            x = jnp.stack([x_g, x_z])
        else:
            stacks = [gl["tcn"], gz["tcn_r"], gz["tcn_i"]]
            x = jnp.stack([x_g, x_z, x_z])
        groups = [
            [_stack_tree([stk[g][j] for stk in stacks])
             for j in range(len(cfg.dilas))]
            for g in range(cfg.p)
        ]
        x = _run_stacked_tcn(x, groups, cfg)

        # heads (batched over the stack axis where inputs differ)
        acti = {"sigmoid": nn.sigmoid, "tanh": jnp.tanh, "relu": nn.relu}[
            cfg.acti_type]
        if cfg.is_squeezed:
            hk = jnp.concatenate([gz["head_r"][0], gz["head_i"][0]],
                                 axis=-1)
            hb = jnp.concatenate([gz["head_r"][1], gz["head_i"][1]])
            ri = x[1].astype(dt) @ hk.astype(dt) + hb.astype(dt)
            r, i = jnp.split(ri, 2, axis=-1)
            gain = acti(x[0].astype(dt) @ gl["head"][0].astype(dt)
                        + gl["head"][1].astype(dt))
        else:
            hk = jnp.stack([gl["head"][0], gz["head_r"][0],
                            gz["head_i"][0]])
            hb = jnp.stack([gl["head"][1], gz["head_r"][1],
                            gz["head_i"][1]])
            y = _sdense(x, hk) + hb[:, None, None, :].astype(dt)
            gain, r, i = y[0], y[1], y[2]
            gain = acti(gain)
        resi = jnp.stack([r, i], axis=-1)

        # CRM combine, identical to GlanceGazeModule (GaGNet.py:129-132)
        # guarded mag/phase: padded frames carry exactly-zero spectra, and
        # sqrt/arctan2 gradients at (0, 0) are inf/NaN (losses.safe_mag)
        sq = jnp.sum(jnp.square(pre_x), axis=-1)
        nz = sq > 0
        pre_mag = jnp.where(nz, jnp.sqrt(jnp.where(nz, sq, 1.0)), 0.0)
        pre_phase = jnp.arctan2(
            pre_x[..., 1], jnp.where(nz, pre_x[..., 0], 1.0))
        filt = pre_mag * gain
        coarse = jnp.stack(
            [filt * jnp.cos(pre_phase), filt * jnp.sin(pre_phase)], axis=-1
        )
        return coarse + resi
