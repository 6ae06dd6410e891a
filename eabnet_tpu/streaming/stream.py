"""Streaming (frame-by-frame) inference with O(1) per-frame state.

The architecture is strictly causal (left-padded time convs, chomped
deconvs, unidirectional LSTMs — SURVEY.md §5 long-context), so offline and
streaming outputs are bit-identical when the norms are causal too. This
module re-expresses every block as a step function over one frame,
consuming the SAME parameter pytree as the offline flax models:

- time convs / transposed convs -> FIR over a carried ring buffer of the
  last (k_t-1)·dilation frames;
- LSTMs -> carried (h, c);
- cumulative layer norm -> carried (count, sum, sum-of-squares);
- BN uses its frozen inference statistics (stateless per frame).

InstanceNorm is rejected: its per-utterance statistics are inherently
non-causal (the reference documents the same caveat, EaBNet.py:46-48) —
train with norm_type="cLN" or "BN" for streaming deployment.

State is a plain pytree, so `step` jits once and the whole utterance can
also be folded through `lax.scan` (see `run`).
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from eabnet_tpu.config import ComposedConfig, EaBNetConfig
from eabnet_tpu.nn.lstm import LSTM

# ----------------------------------------------------------- primitives


def _conv2d(window: jnp.ndarray, p: Dict, stride_f: int) -> jnp.ndarray:
    """(B, k_t_eff, F, C) window -> (B, 1, F', O) via VALID conv."""
    out = lax.conv_general_dilated(
        window, p["kernel"], (1, stride_f), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "bias" in p:
        out = out + p["bias"]
    return out


def _convt2d_frame(window: jnp.ndarray, p: Dict,
                   stride_f: int) -> jnp.ndarray:
    """Transposed conv on a (B, k_t, F, C) window; returns the single
    output frame aligned with the window's last input frame (equivalent to
    offline conv-transpose + chomp)."""
    k_t = p["kernel"].shape[0]
    full = lax.conv_transpose(
        window, p["kernel"], (1, stride_f), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    out = full[:, k_t - 1 : k_t]
    if "bias" in p:
        out = out + p["bias"]
    return out


def _conv1d(window: jnp.ndarray, kernel: jnp.ndarray,
            dilation: int) -> jnp.ndarray:
    """(B, span, C) window -> (B, 1, O) dilated VALID conv."""
    return lax.conv_general_dilated(
        window, kernel, (1,), "VALID", rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )


def _prelu(x: jnp.ndarray, p: Dict) -> jnp.ndarray:
    return jnp.maximum(x, 0) + p["alpha"] * jnp.minimum(x, 0)


def _dense(x: jnp.ndarray, p: Dict) -> jnp.ndarray:
    y = x @ p["kernel"]
    if "bias" in p:
        y = y + p["bias"]
    return y


class _Ring:
    """Helpers for FIR ring buffers stored as (B, k-1, ...) arrays."""

    @staticmethod
    def init(b: int, span: int, *feat: int) -> jnp.ndarray:
        return jnp.zeros((b, span) + tuple(feat), jnp.float32)

    @staticmethod
    def push(buf: jnp.ndarray, frame: jnp.ndarray):
        """Append frame (B, 1, ...), return (window, new_buf)."""
        window = jnp.concatenate([buf, frame], axis=1)
        return window, window[:, 1:]


# ------------------------------------------------------------- normalizers


class _NormStepper:
    """Step-mode NormSwitch: BN (frozen stats) or cLN (carried stats)."""

    def __init__(self, norm_type: str):
        if norm_type == "IN":
            raise ValueError(
                "InstanceNorm cannot stream (non-causal statistics); "
                "train with norm_type='cLN' or 'BN'"
            )
        self.norm_type = norm_type

    def init(self, b: int) -> Any:
        if self.norm_type in ("cLN", "cLN-ref"):
            return {
                "count": jnp.zeros((b,), jnp.float32),
                "sum": jnp.zeros((b,), jnp.float32),
                "sq": jnp.zeros((b,), jnp.float32),
            }
        return ()

    def __call__(self, params: Dict, stats: Dict, state: Any,
                 x: jnp.ndarray, eps: float = 1e-5):
        """x: (B, 1, F, C) or (B, 1, C) single frame."""
        p = params["norm"]
        if self.norm_type == "BN":
            mean = stats["norm"]["mean"]
            var = stats["norm"]["var"]
            y = (x - mean) / jnp.sqrt(var + eps)
            return state, y * p["scale"] + p["bias"]
        # cLN: accumulate over (channels [+freq]) per frame. The carried
        # (count, sum, sq) state is ALWAYS f32, matching the offline
        # norm's f32 statistics (nn/norms.py: bf16 accumulation cancels
        # catastrophically in the E[x^2]-E[x]^2 form).
        xf = x.astype(jnp.float32)
        red = tuple(range(1, x.ndim))
        n_new = float(np.prod(x.shape[1:]))
        count = state["count"] + n_new
        s = state["sum"] + jnp.sum(xf, axis=red)
        sq = state["sq"] + jnp.sum(jnp.square(xf), axis=red)
        # identical unit-variance virtual-frame prior to the offline norm
        # (nn/norms.py): n_per_step pseudo elements, mean 0, var 1.
        # "cLN-ref" drops the prior (exact reference-intended semantics,
        # EaBNet.py:717-726) to match the offline prior=False norm.
        pr = n_new if self.norm_type == "cLN" else 0.0
        mean = s / (count + pr)
        var = jnp.maximum((sq + pr) / (count + pr)
                          - jnp.square(mean), 0.0)
        shape = (-1,) + (1,) * (x.ndim - 1)
        y = ((xf - mean.reshape(shape)) / jnp.sqrt(
            var.reshape(shape) + eps
        )).astype(x.dtype)
        y = y * p["scale"] + p["bias"]
        return {"count": count, "sum": s, "sq": sq}, y


# ------------------------------------------------------------ block steps


class _GateConv:
    """GateConv2d step (ring buffer of k_t-1 input frames)."""

    def __init__(self, k_t: int, stride_f: int, transposed: bool = False):
        self.k_t = k_t
        self.stride_f = stride_f
        self.transposed = transposed

    def init(self, b: int, f: int, c: int):
        return _Ring.init(b, self.k_t - 1, f, c)

    def __call__(self, params: Dict, buf, x: jnp.ndarray):
        p = params["conv"]
        if self.k_t > 1:
            window, buf = _Ring.push(buf, x)
        else:
            window = x
        if self.transposed:
            y = _convt2d_frame(window, p, self.stride_f)
        else:
            y = _conv2d(window, p, self.stride_f)
        out, gate = jnp.split(y, 2, axis=-1)
        return buf, out * jax.nn.sigmoid(gate)


def _conv_unit_step(params, stats, norm, nstate, x, transposed):
    """Conv2dUnit / Deconv2dUnit step — k2=(1, w): no time state, but the
    norm may carry cumulative statistics."""
    p = params["conv"]
    y = (_convt2d_frame(x, p, 2) if transposed else _conv2d(x, p, 2))
    nstate, y = norm(params["norm"], _stats(stats, "norm"), nstate, y)
    return nstate, _prelu(y, params["act"])


def _stats(stats, key):
    return stats.get(key, {}) if stats else {}


class _EnUnet:
    """EnUnetModule step."""

    def __init__(self, cfg_scale: int, k1_t: int, intra: str,
                 norm: _NormStepper, is_deconv: bool):
        self.scale = cfg_scale
        self.intra = intra
        self.norm = norm
        self.in_conv = _GateConv(k1_t, 2, transposed=is_deconv)

    def init(self, b: int, f: int, c: int):
        st = {
            "in_conv": self.in_conv.init(b, f, c),
            "in_norm": self.norm.init(b),
        }
        for i in range(self.scale):
            st[f"enco_{i}_norm"] = self.norm.init(b)
            st[f"deco_{i}_norm"] = self.norm.init(b)
        return st

    def __call__(self, params, stats, state, x):
        new_state = {}
        buf, x = self.in_conv(params["in_conv"], state["in_conv"], x)
        new_state["in_conv"] = buf
        nstate, x = self.norm(params["in_norm"], _stats(stats, "in_norm"),
                              state["in_norm"], x)
        new_state["in_norm"] = nstate
        x = _prelu(x, params["in_act"])
        x_resi = x
        skips = []
        for i in range(self.scale):
            ns, x = _conv_unit_step(
                params[f"enco_{i}"], _stats(stats, f"enco_{i}"), self.norm,
                state[f"enco_{i}_norm"], x, transposed=False)
            new_state[f"enco_{i}_norm"] = ns
            skips.append(x)
        for i in range(self.scale):
            if i > 0:
                aux = skips[-(i + 1)]
                x = (x + aux if self.intra == "add"
                     else jnp.concatenate([x, aux], axis=-1))
            ns, x = _conv_unit_step(
                params[f"deco_{i}"], _stats(stats, f"deco_{i}"), self.norm,
                state[f"deco_{i}_norm"], x, transposed=True)
            new_state[f"deco_{i}_norm"] = ns
        return new_state, x_resi + x


class _TCM:
    """SqueezedTCM step (twin-gate or single-branch)."""

    def __init__(self, kd1: int, cd1: int, dilation: int,
                 norm: _NormStepper, twin: bool):
        self.kd1 = kd1
        self.cd1 = cd1
        self.dilation = dilation
        self.norm = norm
        self.twin = twin
        self.branches = ("left", "right") if twin else ("main",)

    def init(self, b: int):
        span = (self.kd1 - 1) * self.dilation
        st = {f"{br}_buf": _Ring.init(b, span, self.cd1)
              for br in self.branches}
        for br in self.branches:
            st[f"{br}_norm"] = self.norm.init(b)
        st["out_norm"] = self.norm.init(b)
        return st

    def __call__(self, params, stats, state, x):
        """x: (B, 1, D)."""
        resi = x
        h0 = _dense(x, params["in_conv"])
        new_state = {}
        outs = []
        for br in self.branches:
            h = _prelu(h0, params[f"{br}_act"])
            ns, h = self.norm(params[f"{br}_norm"],
                              _stats(stats, f"{br}_norm"),
                              state[f"{br}_norm"], h)
            new_state[f"{br}_norm"] = ns
            window, buf = _Ring.push(state[f"{br}_buf"], h)
            new_state[f"{br}_buf"] = buf
            outs.append(
                _conv1d(window, params[f"{br}_conv"]["kernel"],
                        self.dilation)
            )
        h = (outs[0] * jax.nn.sigmoid(outs[1]) if self.twin else outs[0])
        h = _prelu(h, params["out_act"])
        ns, h = self.norm(params["out_norm"], _stats(stats, "out_norm"),
                          state["out_norm"], h)
        new_state["out_norm"] = ns
        h = _dense(h, params["out_conv"])
        return new_state, h + resi


# -------------------------------------------------------------- encoders


class _U2Encoder:
    def __init__(self, cfg, norm: _NormStepper):
        self.norm = norm
        self.modules = [
            _EnUnet(s, (cfg.k_beg if hasattr(cfg, "k_beg") else (2, 5))[0]
                    if i == 0 else cfg.k1[0], cfg.intra_connect, norm,
                    is_deconv=False)
            for i, s in enumerate((4, 3, 2, 1))
        ]
        self.last = _GateConv(cfg.k1[0], 2)

    def init(self, b, f_in, channels):
        # channels: list of (f, c) input shapes per stage, precomputed
        st = {}
        for i, m in enumerate(self.modules):
            st[f"unet_{i}"] = m.init(b, *channels[i])
        st["last_conv"] = self.last.init(b, *channels[4])
        st["last_norm"] = self.norm.init(b)
        return st

    def __call__(self, params, stats, state, x):
        new_state = {}
        skips = []
        for i, m in enumerate(self.modules):
            new_state[f"unet_{i}"], x = m(
                params[f"unet_{i}"], _stats(stats, f"unet_{i}"),
                state[f"unet_{i}"], x)
            skips.append(x)
        new_state["last_conv"], x = self.last(
            params["last_conv"], state["last_conv"], x)
        ns, x = self.norm(params["last_norm"], _stats(stats, "last_norm"),
                          state["last_norm"], x)
        new_state["last_norm"] = ns
        x = _prelu(x, params["last_act"])
        skips.append(x)
        return new_state, x, skips


class _U2Decoder:
    def __init__(self, cfg, norm: _NormStepper):
        self.norm = norm
        self.modules = [
            _EnUnet(s, cfg.k1[0], cfg.intra_connect, norm, is_deconv=True)
            for s in (1, 2, 3, 4)
        ]
        self.last = _GateConv(2, 2, transposed=True)  # k_end=(2,5)

    def init(self, b, channels):
        st = {}
        for i, m in enumerate(self.modules):
            st[f"unet_{i}"] = m.init(b, *channels[i])
        st["last_conv"] = self.last.init(b, *channels[4])
        st["last_norm"] = self.norm.init(b)
        return st

    def __call__(self, params, stats, state, x, skips):
        new_state = {}
        for i, m in enumerate(self.modules):
            x = jnp.concatenate([x, skips[-(i + 1)]], axis=-1)
            new_state[f"unet_{i}"], x = m(
                params[f"unet_{i}"], _stats(stats, f"unet_{i}"),
                state[f"unet_{i}"], x)
        x = jnp.concatenate([x, skips[0]], axis=-1)
        new_state["last_conv"], x = self.last(
            params["last_conv"], state["last_conv"], x)
        ns, x = self.norm(params["last_norm"], _stats(stats, "last_norm"),
                          state["last_norm"], x)
        new_state["last_norm"] = ns
        return new_state, _prelu(x, params["last_act"])


class _UNetEncoder:
    """Plain 5-stage gated-conv encoder step (reference: EaBNet.py:199-239;
    param names conv_i / norm_i / act_i, norm on stages per norm_stages)."""

    def __init__(self, norm: _NormStepper,
                 norm_stages=(True, False, False, True, True)):
        self.norm = norm
        self.norm_stages = norm_stages
        self.convs = [_GateConv(2, 2) for _ in range(5)]

    def init(self, b, f_in, channels):
        st = {}
        for i, conv in enumerate(self.convs):
            st[f"conv_{i}"] = conv.init(b, *channels[i])
            if self.norm_stages[i]:
                st[f"norm_{i}"] = self.norm.init(b)
        return st

    def __call__(self, params, stats, state, x):
        new_state = {}
        skips = []
        for i, conv in enumerate(self.convs):
            new_state[f"conv_{i}"], x = conv(
                params[f"conv_{i}"], state[f"conv_{i}"], x)
            if self.norm_stages[i]:
                ns, x = self.norm(params[f"norm_{i}"],
                                  _stats(stats, f"norm_{i}"),
                                  state[f"norm_{i}"], x)
                new_state[f"norm_{i}"] = ns
            x = _prelu(x, params[f"act_{i}"])
            skips.append(x)
        return new_state, x, skips


class _UNetDecoder:
    """Plain 5-stage gated-deconv decoder step
    (reference: EaBNet.py:282-328)."""

    def __init__(self, norm: _NormStepper):
        self.norm = norm
        self.convs = [_GateConv(2, 2, transposed=True) for _ in range(5)]

    def init(self, b, channels):
        st = {}
        for i, conv in enumerate(self.convs):
            st[f"conv_{i}"] = conv.init(b, *channels[i])
            st[f"norm_{i}"] = self.norm.init(b)
        return st

    def __call__(self, params, stats, state, x, skips):
        new_state = {}
        for i, conv in enumerate(self.convs):
            x = jnp.concatenate([x, skips[-(i + 1)]], axis=-1)
            new_state[f"conv_{i}"], x = conv(
                params[f"conv_{i}"], state[f"conv_{i}"], x)
            ns, x = self.norm(params[f"norm_{i}"],
                              _stats(stats, f"norm_{i}"),
                              state[f"norm_{i}"], x)
            new_state[f"norm_{i}"] = ns
            x = _prelu(x, params[f"act_{i}"])
        return new_state, x


# ------------------------------------------------------------- top level


class StreamingEaBNet:
    """Frame-by-frame EaBNet (reference architecture EaBNet.py:88-125,
    expressed as the streaming API SURVEY.md §5 calls for).

    Usage:
        s = StreamingEaBNet(cfg, params)         # params: offline pytree
        state = s.init_state(batch=1)
        state, esti = s.step(state, frame)       # frame: (B, F, M, 2)
        wav_specs = s.run(frames)                # lax.scan over (B,T,F,M,2)
    """

    def __init__(self, cfg: EaBNetConfig, params: Dict,
                 batch_stats: Dict = None):
        self.cfg = cfg
        self.params = params
        self.stats = batch_stats or {}
        self.norm = _NormStepper(cfg.norm_type)
        if cfg.is_u2:
            self.en = _U2Encoder(cfg, self.norm)
            self.de = _U2Decoder(cfg, self.norm)
        else:
            self.en = _UNetEncoder(self.norm)
            self.de = _UNetDecoder(self.norm)
        self.tcms: List[List[_TCM]] = [
            [
                _TCM(cfg.kd1, cfg.cd1, 2 ** j, self.norm, twin=True)
                for j in range(cfg.p)
            ]
            for _ in range(cfg.q)
        ]
        # freq sizes along the encoder path for F=161
        self.f_sizes = [161, 79, 39, 19, 9, 4]

    def init_state(self, batch: int) -> Dict:
        cfg = self.cfg
        b = batch
        c = cfg.c
        en_channels = [
            (self.f_sizes[0], 2 * cfg.M),
            (self.f_sizes[1], c),
            (self.f_sizes[2], c),
            (self.f_sizes[3], c),
            (self.f_sizes[4], c),
        ]
        de_channels = [
            (self.f_sizes[5], 128),
            (self.f_sizes[4], 2 * c),
            (self.f_sizes[3], 2 * c),
            (self.f_sizes[2], 2 * c),
            (self.f_sizes[1], 2 * c),
        ]
        state = {
            "en": self.en.init(b, self.f_sizes[0], en_channels),
            "de": self.de.init(b, de_channels),
            "tcm": [
                [t.init(b) for t in grp] for grp in self.tcms
            ],
        }
        if cfg.topo_type == "mimo" and cfg.bf_type == "lstm":
            zeros = jnp.zeros((b * 161, cfg.hid_node), jnp.float32)
            state["rnn1"] = (zeros, zeros)
            state["rnn2"] = (zeros, zeros)
        return state

    def step(self, state: Dict, frame: jnp.ndarray):
        """frame: (B, F, M, 2) -> (new_state, esti (B, F, 2))."""
        cfg = self.cfg
        p = self.params
        b, f, m, _ = frame.shape
        x = frame.reshape(b, 1, f, m * 2)

        new_state = dict(state)
        en_state, x, skips = self.en(p["en"], _stats(self.stats, "en"),
                                     state["en"], x)
        new_state["en"] = en_state

        f_b, c_b = x.shape[2], x.shape[3]
        h = x.reshape(b, 1, f_b * c_b)
        acc = jnp.zeros_like(h)
        tcm_states = []
        for gi, grp in enumerate(self.tcms):
            grp_states = []
            for ti, tcm in enumerate(grp):
                st, h = tcm(
                    p[f"stcn_{gi}"][f"tcm_{ti}"],
                    _stats(_stats(self.stats, f"stcn_{gi}"), f"tcm_{ti}"),
                    state["tcm"][gi][ti], h)
                grp_states.append(st)
            acc = acc + h
            tcm_states.append(grp_states)
        new_state["tcm"] = tcm_states
        x = acc.reshape(b, 1, f_b, c_b)

        de_state, x = self.de(p["de"], _stats(self.stats, "de"),
                              state["de"], x, skips)
        new_state["de"] = de_state

        # beamforming head on one frame
        bp = p["bf_map"]
        emb = x[:, 0]  # (B, F, C)
        if cfg.topo_type == "miso":
            # per-TF complex product with the reference mic
            # (see ARCHITECTURE.md note on the reference miso bug)
            w = _dense(emb, bp)  # (B, F, 2)
            ref = frame[..., 0, :]
            esti = jnp.stack(
                [w[..., 0] * ref[..., 0] - w[..., 1] * ref[..., 1],
                 w[..., 0] * ref[..., 1] + w[..., 1] * ref[..., 0]],
                axis=-1,
            )
            return new_state, esti
        if cfg.bf_type == "cnn":
            bf_w = _dense(emb, bp).reshape(b, f, m, 2)
        else:
            mean = emb.mean(axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(emb - mean), axis=-1, keepdims=True)
            emb_n = (emb - mean) / jnp.sqrt(var + 1e-5)
            emb_n = emb_n * bp["norm"]["scale"] + bp["norm"]["bias"]
            lanes = emb_n.reshape(b * f, -1)
            new_state["rnn1"], h1 = LSTM.step_fn(bp["rnn1"], state["rnn1"],
                                                 lanes)
            new_state["rnn2"], h2 = LSTM.step_fn(bp["rnn2"], state["rnn2"],
                                                 h1)
            w = jax.nn.relu(h2 @ bp["fc1"]["kernel"] + bp["fc1"]["bias"])
            w = w @ bp["fc2"]["kernel"] + bp["fc2"]["bias"]
            bf_w = w.reshape(b, f, m, 2)

        wr, wi = bf_w[..., 0], bf_w[..., 1]
        xr, xi = frame[..., 0], frame[..., 1]
        esti = jnp.stack(
            [jnp.sum(wr * xr - wi * xi, axis=-1),
             jnp.sum(wr * xi + wi * xr, axis=-1)],
            axis=-1,
        )
        return new_state, esti

    def run(self, frames: jnp.ndarray) -> jnp.ndarray:
        """(B, T, F, M, 2) -> (B, T, F, 2) via lax.scan over frames."""
        state = self.init_state(frames.shape[0])

        def body(st, frame):
            st, out = self.step(st, frame)
            return st, out

        _, outs = lax.scan(body, state,
                           jnp.transpose(frames, (1, 0, 2, 3, 4)))
        return jnp.transpose(outs, (1, 0, 2, 3, 4)) if outs.ndim == 5 \
            else jnp.transpose(outs, (1, 0, 2, 3))


class StreamingComposed:
    """Streaming EaBNet + per-frame GaGNet refinement."""

    def __init__(self, cfg: ComposedConfig, params: Dict,
                 batch_stats: Dict = None):
        self.cfg = cfg
        self.eab = StreamingEaBNet(cfg.eabnet, params["eabnet"],
                                   (batch_stats or {}).get("eabnet"))
        self.gag_cfg = cfg.gagnet
        self.gag_params = params["postnet"]
        self.gag_stats = (batch_stats or {}).get("postnet", {})
        g = cfg.gagnet
        norm = _NormStepper(g.norm_type)
        self.g_norm = norm
        self.g_en = _U2Encoder(g, norm)
        self.g_tcn: Dict[str, List] = {}
        for i in range(g.q):
            for blk, stacks in (("glance", ["tcn"]),
                                ("gaze", ["tcn_ri"] if g.is_squeezed
                                 else ["tcn_r", "tcn_i"])):
                for stack in stacks:
                    for pi in range(g.p):
                        key = f"gag_{i}/{blk}/{stack}_{pi}"
                        self.g_tcn[key] = [
                            _TCM(g.kd1, g.cd1, d, norm, twin=False)
                            for d in g.dilas
                        ]

    def init_state(self, batch: int) -> Dict:
        g = self.gag_cfg
        b = batch
        en_channels = [
            (161, 2 * g.cin),
            (79, g.c),
            (39, g.c),
            (19, g.c),
            (9, g.c),
        ]
        st = {
            "eab": self.eab.init_state(batch),
            "g_en": self.g_en.init(b, 161, en_channels),
            "g_tcn": {
                key: [t.init(b) for t in tcms]
                for key, tcms in self.g_tcn.items()
            },
        }
        return st

    def step(self, state: Dict, frame: jnp.ndarray):
        """frame (B, F, M, 2) -> (state, dict(esti0, esti))."""
        g = self.gag_cfg
        p = self.gag_params
        new_state = dict(state)
        new_state["eab"], esti0 = self.eab.step(state["eab"], frame)
        ref = frame[:, :, self.cfg.ref_mic, :]  # (B, F, 2)

        b = frame.shape[0]
        x = jnp.concatenate([ref, esti0], axis=-1)[:, None]  # (B,1,F,4)
        g_en_state, feat, _ = self.g_en(
            p["en"], _stats(self.gag_stats, "en"), state["g_en"], x)
        new_state["g_en"] = g_en_state
        feat = feat.reshape(b, 1, -1)  # (B, 1, 256)

        pre = esti0
        tcn_state = dict(state["g_tcn"])
        for i in range(g.q):
            gp = p[f"gag_{i}"]
            pre_flat = jnp.concatenate(
                [pre[..., 0], pre[..., 1]], axis=-1
            )[:, None]  # (B, 1, 2F)
            inpt = jnp.concatenate([feat, pre_flat], axis=-1)

            def gated(block):
                return _dense(inpt, block["in_main"]) * jax.nn.sigmoid(
                    _dense(inpt, block["in_gate"])
                )

            gstats = _stats(self.gag_stats, f"gag_{i}")

            # glance
            h = gated(gp["glance"])
            for pi in range(g.p):
                key = f"gag_{i}/glance/tcn_{pi}"
                tstats = _stats(_stats(gstats, "glance"), f"tcn_{pi}")
                sts = []
                for di, tcm in enumerate(self.g_tcn[key]):
                    st, h = tcm(
                        gp["glance"][f"tcn_{pi}"][f"tcm_{di}"],
                        _stats(tstats, f"tcm_{di}"), tcn_state[key][di], h)
                    sts.append(st)
                tcn_state[key] = sts
            gain = _dense(h, gp["glance"]["head"])
            gain = {"sigmoid": jax.nn.sigmoid, "tanh": jnp.tanh,
                    "relu": jax.nn.relu}[g.acti_type](gain)[:, 0]

            # gaze
            h0 = gated(gp["gaze"])
            ri = []
            stacks = ["tcn_ri"] if g.is_squeezed else ["tcn_r", "tcn_i"]
            for stack in stacks:
                h = h0
                for pi in range(g.p):
                    key = f"gag_{i}/gaze/{stack}_{pi}"
                    tstats = _stats(_stats(gstats, "gaze"), f"{stack}_{pi}")
                    sts = []
                    for di, tcm in enumerate(self.g_tcn[key]):
                        st, h = tcm(
                            gp["gaze"][f"{stack}_{pi}"][f"tcm_{di}"],
                            _stats(tstats, f"tcm_{di}"),
                            tcn_state[key][di], h)
                        sts.append(st)
                    tcn_state[key] = sts
                ri.append(h)
            if g.is_squeezed:
                ri = [ri[0], ri[0]]
            resi = jnp.stack(
                [_dense(ri[0], gp["gaze"]["head_r"])[:, 0],
                 _dense(ri[1], gp["gaze"]["head_i"])[:, 0]],
                axis=-1,
            )  # (B, F, 2)

            mag = jnp.sqrt(jnp.sum(jnp.square(pre), axis=-1))
            phase = jnp.arctan2(pre[..., 1], pre[..., 0])
            filt = mag * gain
            pre = jnp.stack(
                [filt * jnp.cos(phase), filt * jnp.sin(phase)], axis=-1
            ) + resi
        new_state["g_tcn"] = tcn_state
        return new_state, {"esti0": esti0, "esti": pre}

    def run(self, frames: jnp.ndarray):
        state = self.init_state(frames.shape[0])

        def body(st, frame):
            st, out = self.step(st, frame)
            return st, out["esti"]

        _, outs = lax.scan(body, state,
                           jnp.transpose(frames, (1, 0, 2, 3, 4)))
        return jnp.transpose(outs, (1, 0, 2, 3))
