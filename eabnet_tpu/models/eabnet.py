"""EaBNet — the all-neural causal beamformer, TPU-native.

Architecture parity with the reference (EaBNet.py:9-125): U²Net/UNet encoder
over (time, freq) with freq-only downsampling -> q accumulated squeezed-TCN
groups on the flattened bottleneck -> mirrored decoder -> per-TF beamforming
weights (2-layer LSTM head or pointwise conv) -> complex filter-and-sum over
microphones.

TPU-native choices:
- channels-last (B, T, F, C) activations; convs are NHWC/HWIO;
- the bottleneck (B, T, 256) feeds Dense/1-D-conv TCMs = straight MXU work;
- the LSTM head batches the B*F frequency lanes into the scan's batch
  dimension so the recurrence stays matmul-shaped (reference puts B*F=161B
  lanes through two stacked LSTMs, EaBNet.py:609);
- the final beamform is a single complex einsum 'btfm,btfm->btf' pair.

I/O (native layout): inpt (B, T, F, M, 2) -> esti (B, T, F, 2).
The reference-layout output (B, 2, T, F) is `to_reference_layout(esti)`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from eabnet_tpu.config import EaBNetConfig
from eabnet_tpu.nn.blocks import (
    SqueezedTCNGroup,
    U2NetDecoder,
    U2NetEncoder,
    UNetDecoder,
    UNetEncoder,
)


def to_reference_layout(esti_btf2: jnp.ndarray) -> jnp.ndarray:
    """(B, T, F, 2) -> (B, 2, T, F), the reference's output contract."""
    return jnp.transpose(esti_btf2, (0, 3, 1, 2))


def from_reference_layout(esti_b2tf: jnp.ndarray) -> jnp.ndarray:
    """(B, 2, T, F) -> (B, T, F, 2)."""
    return jnp.transpose(esti_b2tf, (0, 2, 3, 1))


class _LSTMParams(nn.Module):
    """Declares one LSTM layer's parameters (torch layout/init) and
    returns them — lets the beamformer head share one parameter tree
    between the lax.scan path and the fused Pallas kernel."""

    in_dim: int
    hidden: int

    @nn.compact
    def __call__(self):
        h = self.hidden
        k = 1.0 / float(h) ** 0.5

        def uniform_init(key, shape):
            return jax.random.uniform(key, shape, jnp.float32,
                                      minval=-k, maxval=k)

        return {
            "w_ih": self.param("w_ih", uniform_init, (self.in_dim, 4 * h)),
            "w_hh": self.param("w_hh", uniform_init, (h, 4 * h)),
            "b_ih": self.param("b_ih", uniform_init, (4 * h,)),
            "b_hh": self.param("b_hh", uniform_init, (4 * h,)),
        }


class _DenseParams(nn.Module):
    in_dim: int
    out_dim: int

    @nn.compact
    def __call__(self):
        return {
            "kernel": self.param("kernel", nn.initializers.lecun_normal(),
                                 (self.in_dim, self.out_dim)),
            "bias": self.param("bias", nn.initializers.zeros,
                               (self.out_dim,)),
        }


class LSTMBeamformer(nn.Module):
    """LSTM beamforming-weight head (reference: EaBNet.py:581-614).

    LayerNorm over the embedding -> fold freq into the lane/batch dim ->
    two stacked LSTMs over time -> MLP -> (B, T, F, M, 2) complex weights.

    ``impl='pallas'`` runs the whole sequential section (both LSTM layers +
    MLP) in one fused Pallas kernel with VMEM-resident weights/state
    (eabnet_tpu/kernels/lstm_bf.py); ``impl='scan'`` is the portable
    lax.scan path. Both share one parameter tree.
    """

    embed_dim: int
    M: int
    hid_node: int = 64
    impl: str = "scan"
    remat: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: (B, T, F, C)
        b, t, f, c = x.shape
        h = self.hid_node
        # LayerNorm params under the name "norm" (checkpoint-compatible)
        ln = _DenseLikeNorm(c, name="norm")()
        params = {
            "rnn1": _LSTMParams(c, h, name="rnn1")(),
            "rnn2": _LSTMParams(h, h, name="rnn2")(),
            "fc1": _DenseParams(h, h, name="fc1")(),
            "fc2": _DenseParams(h, 2 * self.M, name="fc2")(),
        }

        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
        x = (x - mean) / jnp.sqrt(var + 1e-5)
        x = x * ln["scale"] + ln["bias"]

        # (B, F, T, C) -> (B*F, T, C): every frequency is an independent lane
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * f, t, c)

        if self.impl == "pallas":
            from eabnet_tpu.kernels.lstm_bf import lstm_bf_pallas

            w = lstm_bf_pallas(params, x)
        else:
            w = _scan_head(params, x, remat=self.remat)
        w = w.reshape(b, f, t, self.M, 2)
        return jnp.transpose(w, (0, 2, 1, 3, 4))  # (B, T, F, M, 2)


class _DenseLikeNorm(nn.Module):
    """LayerNorm scale/bias parameters under flax's standard names."""

    dim: int

    @nn.compact
    def __call__(self):
        return {
            "scale": self.param("scale", nn.initializers.ones, (self.dim,)),
            "bias": self.param("bias", nn.initializers.zeros, (self.dim,)),
        }


def _scan_head(params, x: jnp.ndarray, remat: bool = False) -> jnp.ndarray:
    """lax.scan implementation of the head on the shared param tree.

    Layer-1 input projections are hoisted into one large matmul; the scan
    body carries only the hidden matmuls + gates.
    """
    l, t, c = x.shape
    p1, p2 = params["rnn1"], params["rnn2"]
    h = p1["w_hh"].shape[0]
    xw1 = x @ p1["w_ih"] + (p1["b_ih"] + p1["b_hh"])  # (L, T, 4H)
    b2 = p2["b_ih"] + p2["b_hh"]

    def gate(gates, c_prev):
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c_new = nn.sigmoid(f) * c_prev + nn.sigmoid(i) * jnp.tanh(g)
        return nn.sigmoid(o) * jnp.tanh(c_new), c_new

    def step(carry, xw_t):
        h1, c1, h2, c2 = carry
        h1, c1 = gate(xw_t + h1 @ p1["w_hh"], c1)
        h2, c2 = gate(h1 @ p2["w_ih"] + b2 + h2 @ p2["w_hh"], c2)
        return (h1, c1, h2, c2), h2

    if remat:
        # selective remat of the scan BODY: the backward pass recomputes
        # each step's gate intermediates from the carried (h, c) instead
        # of storing ~(B*F, 4H) activation blocks for every time step —
        # the pinned source of the batch-24 HBM ceiling (ROOFLINE.md).
        step = jax.checkpoint(step)

    zeros = jnp.zeros((l, h), x.dtype)
    # NOTE: keep unroll=1 — unrolling speeds the forward slightly but the
    # unrolled backward materializes (T/u, u, B*F, 4H) activation blocks
    # that blow past v5e HBM at training batch sizes (measured: 18.6G).
    _, ys = jax.lax.scan(step, (zeros, zeros, zeros, zeros),
                         jnp.transpose(xw1, (1, 0, 2)))
    ys = jnp.transpose(ys, (1, 0, 2))  # (L, T, H)
    y = nn.relu(ys @ params["fc1"]["kernel"] + params["fc1"]["bias"])
    return y @ params["fc2"]["kernel"] + params["fc2"]["bias"]


def beamform_sum(bf_w: jnp.ndarray, inpt: jnp.ndarray) -> jnp.ndarray:
    """Complex filter-and-sum over mics (reference: EaBNet.py:114-117).

    bf_w, inpt: (B, T, F, M, 2) -> (B, T, F, 2).
    One fused complex-multiply/reduce; XLA lowers the einsum pair onto the
    VPU/MXU without materializing intermediates.
    """
    wr, wi = bf_w[..., 0], bf_w[..., 1]
    xr, xi = inpt[..., 0], inpt[..., 1]
    esti_r = jnp.sum(wr * xr - wi * xi, axis=-1)
    esti_i = jnp.sum(wr * xi + wi * xr, axis=-1)
    return jnp.stack([esti_r, esti_i], axis=-1)


class EaBNet(nn.Module):
    """Embedding-and-Beamforming network (reference: EaBNet.py:9-125)."""

    cfg: EaBNetConfig

    @nn.compact
    def __call__(self, inpt: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """inpt: (B, T, F, M, 2) -> esti: (B, T, F, 2)."""
        cfg = self.cfg
        if inpt.ndim == 4:  # single-mic input
            inpt = inpt[..., None, :]
        b, t, f, m, _ = inpt.shape

        # fold (mic, ri) into channels: (B, T, F, 2M), mic-major
        # (channel = 2*m + ri) — a free reshape in this layout. The reference
        # folds ri-major (EaBNet.py:96-97); the checkpoint converter permutes
        # the first conv's input channels accordingly.
        x = inpt.reshape(b, t, f, m * 2)

        # cfg.enc_remat wraps the whole encoder/decoder in jax.checkpoint:
        # outputs (the skips the decoder needs anyway + the bottleneck)
        # stay stored, every internal activation is recomputed in the
        # backward. Param trees are identical either way (lifted
        # transform), so the flag is checkpoint-compatible.
        def _maybe_remat(cls, train_argnum):
            if not cfg.enc_remat:
                return cls
            return nn.remat(cls, static_argnums=(train_argnum,))

        if cfg.is_u2:
            x, skips = _maybe_remat(U2NetEncoder, 2)(
                cfg.c, cfg.k1, cfg.k2, cfg.intra_connect,
                cfg.norm_type, name="en")(x, train)
            de = _maybe_remat(U2NetDecoder, 3)(
                cfg.embed_dim, cfg.c, cfg.k1, cfg.k2,
                cfg.intra_connect, cfg.norm_type, name="de")
        else:
            x, skips = _maybe_remat(UNetEncoder, 2)(
                cfg.c, cfg.k1, cfg.norm_type, name="en")(x, train)
            de = _maybe_remat(UNetDecoder, 3)(
                cfg.embed_dim, cfg.c, cfg.k1, cfg.norm_type, name="de")

        # bottleneck: (B, T, F', C) -> (B, T, F'*C) == d_feat
        f_bottle, c_bottle = x.shape[2], x.shape[3]
        x = x.reshape(b, t, f_bottle * c_bottle)

        # q accumulated squeezed-TCN groups (reference: EaBNet.py:101-105)
        acc = jnp.zeros_like(x)
        for i in range(cfg.q):
            x = SqueezedTCNGroup(
                cfg.kd1, cfg.cd1, cfg.d_feat,
                dilations=tuple(2 ** j for j in range(cfg.p)),
                is_causal=cfg.is_causal, norm_type=cfg.norm_type,
                twin_gate=True, impl=cfg.tcn_impl, name=f"stcn_{i}",
            )(x, train)
            acc = acc + x
        x = acc.reshape(b, t, f_bottle, c_bottle)

        x = de(x, skips, train)  # (B, T, F, embed_dim)

        if cfg.topo_type == "mimo":
            if cfg.bf_type == "lstm":
                # the Pallas head carries a custom VJP (fused reverse-scan
                # backward kernel) so it is usable for training too
                bf_w = LSTMBeamformer(cfg.embed_dim, m, cfg.hid_node,
                                      impl=cfg.bf_impl,
                                      remat=cfg.bf_remat,
                                      name="bf_map")(x)
            else:  # pointwise conv head (reference: EaBNet.py:79,111-113)
                w = nn.Dense(2 * m, name="bf_map")(x)  # (B, T, F, 2M)
                bf_w = w.reshape(b, t, f, m, 2)
            return beamform_sum(bf_w, inpt)
        # miso: 2-channel weights applied to the reference mic 0
        # (reference: EaBNet.py:118-125)
        w = nn.Dense(2, name="bf_map")(x)  # (B, T, F, 2)
        ref = inpt[..., 0, :]
        wr, wi = w[..., 0], w[..., 1]
        xr, xi = ref[..., 0], ref[..., 1]
        esti_r = wr * xr - wi * xi
        esti_i = wr * xi + wi * xr
        return jnp.stack([esti_r, esti_i], axis=-1)
