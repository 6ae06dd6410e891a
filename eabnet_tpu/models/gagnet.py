"""GaGNet — glance-and-gaze single-channel post-filter, TPU-native.

Parity target: reference GaGNet.py:5-258. A U²Net/UNet encoder embeds the
concatenated (noisy-ref, previous-estimate) spectra; q glance-gaze modules
then iteratively refine the estimate: the glance block predicts a real
magnitude gain, the gaze block a complex residual, combined as
``mag * gain * e^{j*phase} + residual`` (reference: GaGNet.py:129-132).

Native layout: spectra are (B, T, F, 2); the flattened per-frame feature
vectors are (B, T, D). All pointwise convs are Dense layers (MXU matmuls).
"""

from __future__ import annotations

from typing import List

import jax.numpy as jnp
from flax import linen as nn

from eabnet_tpu.config import GaGNetConfig
from eabnet_tpu.nn.blocks import SqueezedTCNGroup, U2NetEncoder, UNetEncoder


def _flatten_spec(x: jnp.ndarray) -> jnp.ndarray:
    """(B, T, F, 2) -> (B, T, 2F) with real bins first then imag bins,
    matching the reference's (B,2,F,T).view(B,2F,T) row order
    (GaGNet.py:188-189)."""
    return jnp.concatenate([x[..., 0], x[..., 1]], axis=-1)


class GlanceBlock(nn.Module):
    """Real-valued magnitude-gain branch (reference: GaGNet.py:136-194)."""

    cfg: GaGNetConfig

    @nn.compact
    def __call__(self, feat_x, pre_flat, train: bool = False):
        cfg = self.cfg
        inpt = jnp.concatenate([feat_x, pre_flat], axis=-1)
        x = nn.Dense(cfg.d_feat, name="in_main")(inpt) * nn.sigmoid(
            nn.Dense(cfg.d_feat, name="in_gate")(inpt)
        )
        for i in range(cfg.p):
            x = SqueezedTCNGroup(
                cfg.kd1, cfg.cd1, cfg.d_feat, cfg.dilas, cfg.is_causal,
                cfg.norm_type, twin_gate=False, impl=cfg.tcn_impl,
                name=f"tcn_{i}",
            )(x, train)
        gain = nn.Dense(cfg.freq_bins, name="head")(x)
        acti = {"sigmoid": nn.sigmoid, "tanh": jnp.tanh, "relu": nn.relu}[
            cfg.acti_type
        ]
        return acti(gain)  # (B, T, F)


class GazeBlock(nn.Module):
    """Complex-residual branch (reference: GaGNet.py:197-258)."""

    cfg: GaGNetConfig

    @nn.compact
    def __call__(self, feat_x, pre_flat, train: bool = False):
        cfg = self.cfg
        inpt = jnp.concatenate([feat_x, pre_flat], axis=-1)
        x = nn.Dense(cfg.d_feat, name="in_main")(inpt) * nn.sigmoid(
            nn.Dense(cfg.d_feat, name="in_gate")(inpt)
        )

        def stack(h, prefix):
            for i in range(cfg.p):
                h = SqueezedTCNGroup(
                    cfg.kd1, cfg.cd1, cfg.d_feat, cfg.dilas, cfg.is_causal,
                    cfg.norm_type, twin_gate=False, impl=cfg.tcn_impl,
                    name=f"{prefix}_{i}",
                )(h, train)
            return h

        if cfg.is_squeezed:
            x = stack(x, "tcn_ri")
            x_r = x_i = x
        else:
            x_r, x_i = stack(x, "tcn_r"), stack(x, "tcn_i")
        r = nn.Dense(cfg.freq_bins, name="head_r")(x_r)
        i = nn.Dense(cfg.freq_bins, name="head_i")(x_i)
        return jnp.stack([r, i], axis=-1)  # (B, T, F, 2)


class GlanceGazeModule(nn.Module):
    """One refinement stage (reference: GaGNet.py:92-133)."""

    cfg: GaGNetConfig

    @nn.compact
    def __call__(self, feat_x, pre_x, train: bool = False):
        # feat_x: (B, T, D); pre_x: (B, T, F, 2)
        pre_flat = _flatten_spec(pre_x)
        gain = GlanceBlock(self.cfg, name="glance")(feat_x, pre_flat, train)
        resi = GazeBlock(self.cfg, name="gaze")(feat_x, pre_flat, train)
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


class GaGNet(nn.Module):
    """Glance-and-gaze post-filter (reference: GaGNet.py:5-90).

    inpt, pre_x: (B, T, F, 2) -> list of q stage outputs (B, T, F, 2),
    the last being the final refined spectrum.
    """

    cfg: GaGNetConfig

    @nn.compact
    def __call__(self, inpt: jnp.ndarray, pre_x: jnp.ndarray,
                 train: bool = False) -> List[jnp.ndarray]:
        cfg = self.cfg
        x = jnp.concatenate([inpt, pre_x], axis=-1)  # (B, T, F, 2cin)
        # cfg.enc_remat: recompute the encoder's internal activations in
        # the backward (see EaBNetConfig.enc_remat; identical param tree)
        def _maybe_remat(cls):
            return nn.remat(cls, static_argnums=(2,)) if cfg.enc_remat \
                else cls

        if cfg.is_u2:
            feat, _ = _maybe_remat(U2NetEncoder)(
                cfg.c, cfg.k1, cfg.k2, cfg.intra_connect,
                cfg.norm_type, name="en")(x, train)
        else:
            feat, _ = _maybe_remat(UNetEncoder)(
                cfg.c, cfg.k1, cfg.norm_type,
                norm_stages=(True,) * 5,  # GaGNet norms all 5 stages
                name="en",
            )(x, train)
        b, t = feat.shape[0], feat.shape[1]
        feat = feat.reshape(b, t, -1)  # (B, T, F'*C) == d_feat
        if cfg.fused_stages and cfg.norm_type != "BN":
            # same params/math, stacked execution (models/gagnet_fused.py)
            from eabnet_tpu.models.gagnet_fused import FusedGlanceGaze

            stage_cls = FusedGlanceGaze
        else:
            stage_cls = GlanceGazeModule
        outs = []
        for i in range(cfg.q):
            pre_x = stage_cls(cfg, name=f"gag_{i}")(feat, pre_x, train)
            outs.append(pre_x)
        return outs
