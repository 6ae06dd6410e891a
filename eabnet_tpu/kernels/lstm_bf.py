"""Pallas TPU kernels: the fused double-LSTM recurrence of the beamforming
head, forward AND backward (custom VJP).

The beamformer head (reference: EaBNet.py:581-614) is the model's only
time-sequential section: two stacked unidirectional LSTMs + a 2-layer MLP
over T frames, batched over L = B*F frequency lanes. Design:

- layer-1 input projections for ALL timesteps are hoisted outside into one
  large MXU matmul and streamed per-step through the grid pipeline;
- the per-step forward body does exactly two MXU ops: h1 @ W_hh1 and a
  single fused [h1_new, h2] @ [W_ih2; W_hh2] for layer 2; recurrent state
  lives in VMEM scratch;
- the trailing MLP is hoisted outside as one (L*T, H) batched matmul;
- the BACKWARD is a reverse-time Pallas kernel with a custom VJP: it
  recomputes the pre-activation gates from the saved (h, c) sequences
  (cheap MXU work instead of storing (T, L, 4H) gate tensors like XLA's
  scan transpose does), carries (dh, dc) for both layers in VMEM, and
  accumulates the weight gradients on-chip;
- lanes are independent, so both kernels block the lane axis
  (grid = lane-blocks x time) to bound VMEM at large batches; the weight-
  gradient accumulators persist across lane blocks.

Matches `LSTMBeamformer(impl='scan')` and its jax.grad numerically
(tested in interpret mode and on TPU).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Max lanes per grid block. The limits differ because the backward streams
# 12 arrays per step (states at t and t-1, cotangents, dgates out) against
# the 16 MB scoped-VMEM budget, while the forward streams only 5 — so the
# forward can take ~3x more lanes per block. Sequences stream in the
# PRIMAL dtype (bf16 under mixed-precision training, halving scoped VMEM
# and HBM traffic; compute and carried state stay f32), so the bf16 limit
# is twice the f32 one — at batch 8 (1288 lanes) both kernels then run in
# ONE lane block (grid = T instead of 2T).
LANE_BLOCK = 2048            # forward
BWD_LANE_BLOCK = 704         # backward, f32 sequences
BWD_LANE_BLOCK_BF16 = 1536   # backward, bf16 sequences


def _lstm_gates(gates, c_prev):
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c_new = jax.nn.sigmoid(f) * c_prev + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return h_new, c_new


def _fwd_kernel(xw1_ref, w_hh1_ref, w2_ref, b2_ref,
                h1_out, c1_out, h2_out, c2_out, h1, c1, h2, c2):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h1[:] = jnp.zeros_like(h1)
        c1[:] = jnp.zeros_like(c1)
        h2[:] = jnp.zeros_like(h2)
        c2[:] = jnp.zeros_like(c2)

    wdt = w_hh1_ref.dtype  # matmul operand dtype (bf16 under mixed prec)
    gates1 = xw1_ref[0].astype(jnp.float32) + jnp.dot(
        h1[:].astype(wdt), w_hh1_ref[:],
        preferred_element_type=jnp.float32,
    )
    h1_new, c1_new = _lstm_gates(gates1, c1[:])

    # layer 2: one fused matmul [h1_new, h2] @ [[W_ih2], [W_hh2]]
    hh = jnp.concatenate([h1_new, h2[:]], axis=-1).astype(wdt)
    gates2 = b2_ref[:].astype(jnp.float32) + jnp.dot(
        hh, w2_ref[:], preferred_element_type=jnp.float32
    )
    h2_new, c2_new = _lstm_gates(gates2, c2[:])

    h1[:] = h1_new
    c1[:] = c1_new
    h2[:] = h2_new
    c2[:] = c2_new
    h1_out[0] = h1_new.astype(h1_out.dtype)
    c1_out[0] = c1_new.astype(c1_out.dtype)
    h2_out[0] = h2_new.astype(h2_out.dtype)
    c2_out[0] = c2_new.astype(c2_out.dtype)


def _cell_bwd(dh, dc, c_prev, c_new, gates):
    """dgates (pre-activation) and dc_prev for one LSTM cell."""
    gi, gf, gg, go = jnp.split(gates, 4, axis=-1)
    si, sf, sg, so = (jax.nn.sigmoid(gi), jax.nn.sigmoid(gf),
                      jnp.tanh(gg), jax.nn.sigmoid(go))
    tc = jnp.tanh(c_new)
    do = dh * tc * so * (1.0 - so)
    dct = dc + dh * so * (1.0 - tc * tc)
    df = dct * c_prev * sf * (1.0 - sf)
    di = dct * sg * si * (1.0 - si)
    dg = dct * si * (1.0 - sg * sg)
    dgates = jnp.concatenate([di, df, dg, do], axis=-1)
    return dgates, dct * sf


def _bwd_kernel(
    # streamed at t and t-1 (same residual arrays, shifted index maps)
    xw1_ref, dy_ref,
    h1_ref, c1_ref, h2_ref, c2_ref,
    h1p_ref, c1p_ref, h2p_ref, c2p_ref,
    w_hh1_ref, w_ih2_ref, w_hh2_ref, b2_ref,
    # outputs
    dxw1_ref, dw_hh1_ref, dw_ih2_ref, dw_hh2_ref, db2_ref,
    # scratch (reverse-time carries + weight-grad accumulators)
    dh1_s, dc1_s, dh2_s, dc2_s, aw_hh1, aw_ih2, aw_hh2, ab2,
):
    li = pl.program_id(0)
    i = pl.program_id(1)
    n_t = pl.num_programs(1)
    is_first = i == 0          # processing t == T-1 (of this lane block)
    is_last = i == n_t - 1     # processing t == 0

    @pl.when(is_first)
    def _():
        for s in (dh1_s, dc1_s, dh2_s, dc2_s):
            s[:] = jnp.zeros_like(s)

    # weight-grad accumulators persist across lane blocks
    @pl.when(jnp.logical_and(is_first, li == 0))
    def _():
        for a in (aw_hh1, aw_ih2, aw_hh2, ab2):
            a[:] = jnp.zeros_like(a)

    wdt = w_hh1_ref.dtype  # matmul operand dtype (bf16 under mixed prec)
    f32 = jnp.float32
    h1_t, c1_t = h1_ref[0].astype(f32), c1_ref[0].astype(f32)
    c2_t = c2_ref[0].astype(f32)
    # at t == 0 the "previous" state is the zero initial state
    not_t0 = f32(jnp.logical_not(is_last))
    h1_p = h1p_ref[0].astype(f32) * not_t0
    c1_p = c1p_ref[0].astype(f32) * not_t0
    h2_p = h2p_ref[0].astype(f32) * not_t0
    c2_p = c2p_ref[0].astype(f32) * not_t0

    # --- recompute the pre-activation gates (cheap MXU work) ------------
    gates1 = xw1_ref[0].astype(f32) + jnp.dot(
        h1_p.astype(wdt), w_hh1_ref[:], preferred_element_type=f32
    )
    gates2 = (
        jnp.dot(h1_t.astype(wdt), w_ih2_ref[:], preferred_element_type=f32)
        + jnp.dot(h2_p.astype(wdt), w_hh2_ref[:],
                  preferred_element_type=f32)
        + b2_ref[:].astype(f32)
    )

    # --- layer 2 backward -------------------------------------------------
    dh2 = dy_ref[0].astype(f32) + dh2_s[:]
    dgates2, dc2_new = _cell_bwd(dh2, dc2_s[:], c2_p, c2_t, gates2)
    dc2_s[:] = dc2_new
    dg2 = dgates2.astype(wdt)
    dh2_s[:] = jnp.dot(dg2, w_hh2_ref[:].T, preferred_element_type=f32)

    # --- layer 1 backward -------------------------------------------------
    dh1 = dh1_s[:] + jnp.dot(
        dg2, w_ih2_ref[:].T, preferred_element_type=f32
    )
    dgates1, dc1_new = _cell_bwd(dh1, dc1_s[:], c1_p, c1_t, gates1)
    dc1_s[:] = dc1_new
    dg1 = dgates1.astype(wdt)
    dh1_s[:] = jnp.dot(dg1, w_hh1_ref[:].T, preferred_element_type=f32)

    dxw1_ref[0] = dgates1.astype(dxw1_ref.dtype)

    # weight-gradient accumulation (tiny MXU outer products in VMEM)
    aw_hh1[:] += jnp.dot(h1_p.astype(wdt).T, dg1,
                         preferred_element_type=f32)
    aw_ih2[:] += jnp.dot(h1_t.astype(wdt).T, dg2,
                         preferred_element_type=f32)
    aw_hh2[:] += jnp.dot(h2_p.astype(wdt).T, dg2,
                         preferred_element_type=f32)
    ab2[:] += jnp.sum(dgates2, axis=0, keepdims=True)

    @pl.when(jnp.logical_and(is_last, li == pl.num_programs(0) - 1))
    def _():
        dw_hh1_ref[:] = aw_hh1[:].astype(dw_hh1_ref.dtype)
        dw_ih2_ref[:] = aw_ih2[:].astype(dw_ih2_ref.dtype)
        dw_hh2_ref[:] = aw_hh2[:].astype(dw_hh2_ref.dtype)
        db2_ref[:] = ab2[:].astype(db2_ref.dtype)


def _lane_pad(x, lb):
    """Pad the lane axis (axis 1 of (T, L, F)) to a multiple of lb."""
    l = x.shape[1]
    pad = (-l) % lb
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    return x


def _pick_lane_block(l: int, limit: int = None) -> int:
    """Fewest lane blocks whose size fits VMEM, sizes rounded to the
    sublane multiple to minimize padding waste."""
    limit = limit or LANE_BLOCK
    if l <= limit:
        return l
    nl = -(-l // limit)
    lb = -(-l // nl)
    return ((lb + 7) // 8) * 8


def _time_spec(lb: int, n_total: int = 0, reverse: bool = False,
               shift: int = 0, feat: int = 0):
    """BlockSpec streaming (1, lb, feat) blocks over a (T, L, feat) array
    on the (lane_block, time) grid."""
    if reverse:
        def index_map(li, i):
            return (jnp.maximum(n_total - 1 - i - shift, 0), li, 0)
    else:
        def index_map(li, i):
            return (i, li, 0)
    return pl.BlockSpec((1, lb, feat), index_map,
                        memory_space=pltpu.VMEM)


def _run_fwd_kernel(xw1, w_hh1, w2, b2, interpret):
    t, l, g4 = xw1.shape
    h = g4 // 4
    lb = _pick_lane_block(l)
    xw1 = _lane_pad(xw1, lb)
    lp = xw1.shape[1]
    nl = lp // lb
    vmem = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    seq = jax.ShapeDtypeStruct((t, lp, h), xw1.dtype)
    outs = pl.pallas_call(
        _fwd_kernel,
        grid=(nl, t),
        in_specs=[_time_spec(lb, feat=4 * h), vmem(), vmem(), vmem()],
        out_specs=tuple(_time_spec(lb, feat=h) for _ in range(4)),
        out_shape=(seq, seq, seq, seq),
        scratch_shapes=[pltpu.VMEM((lb, h), jnp.float32)] * 4,
        interpret=interpret,
    )(xw1, w_hh1, w2, b2)
    return outs, lp


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _double_lstm(xw1, w_hh1, w_ih2, w_hh2, b2, interpret):
    """(T, L, 4H) projected inputs -> (T, L, H) layer-2 hiddens."""
    l = xw1.shape[1]
    w2 = jnp.concatenate([w_ih2, w_hh2], axis=0)
    (_, _, h2_seq, _), _ = _run_fwd_kernel(
        xw1, w_hh1, w2, b2.reshape(1, -1), interpret
    )
    return h2_seq[:, :l]


def _double_lstm_fwd(xw1, w_hh1, w_ih2, w_hh2, b2, interpret):
    l = xw1.shape[1]
    w2 = jnp.concatenate([w_ih2, w_hh2], axis=0)
    (h1s, c1s, h2s, c2s), _ = _run_fwd_kernel(
        xw1, w_hh1, w2, b2.reshape(1, -1), interpret
    )
    return h2s[:, :l], (xw1, w_hh1, w_ih2, w_hh2, b2, h1s, c1s, h2s, c2s)


def _double_lstm_bwd(interpret, res, dy):
    xw1, w_hh1, w_ih2, w_hh2, b2, h1s, c1s, h2s, c2s = res
    l = xw1.shape[1]
    t, fwd_lp, h = h2s.shape  # residuals are lane-padded to the fwd block
    sdt = xw1.dtype
    bwd_limit = (BWD_LANE_BLOCK_BF16 if sdt == jnp.bfloat16
                 else BWD_LANE_BLOCK)
    lb = _pick_lane_block(l, bwd_limit)
    h1s, c1s, h2s, c2s = (
        _lane_pad(a[:, :l], lb) for a in (h1s, c1s, h2s, c2s)
    )
    lp = h1s.shape[1]
    nl = lp // lb
    xw1_p = _lane_pad(xw1, lb)
    # padded lanes carry zero cotangents -> zero dgates -> no grad leakage
    dy_p = _lane_pad(dy.astype(sdt), lb)

    vmem = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    at_t = functools.partial(_time_spec, lb, t, reverse=True, shift=0)
    at_p = functools.partial(_time_spec, lb, t, reverse=True, shift=1)

    wshape = jax.ShapeDtypeStruct((h, 4 * h), w_hh1.dtype)
    dxw1, dw_hh1, dw_ih2, dw_hh2, db2 = pl.pallas_call(
        _bwd_kernel,
        grid=(nl, t),
        in_specs=[
            at_t(feat=4 * h),            # xw1 at t
            at_t(feat=h),                # dy at t
            at_t(feat=h), at_t(feat=h),  # h1, c1 at t
            at_t(feat=h), at_t(feat=h),  # h2, c2 at t
            at_p(feat=h), at_p(feat=h),  # h1, c1 at t-1
            at_p(feat=h), at_p(feat=h),  # h2, c2 at t-1
            vmem(), vmem(), vmem(), vmem(),  # w_hh1, w_ih2, w_hh2, b2
        ],
        out_specs=(
            at_t(feat=4 * h),
            vmem(), vmem(), vmem(), vmem(),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((t, lp, 4 * h), sdt),
            wshape, wshape, wshape,
            jax.ShapeDtypeStruct((1, 4 * h), b2.dtype),
        ),
        scratch_shapes=(
            [pltpu.VMEM((lb, h), jnp.float32)] * 4
            + [pltpu.VMEM((h, 4 * h), jnp.float32)] * 3
            + [pltpu.VMEM((1, 4 * h), jnp.float32)]
        ),
        # one-lane-block bf16 at batch 8 sits ~1% above the default 16 MB
        # scoped-VMEM budget; v5e has 128 MB of VMEM, so raise the cap
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
        interpret=interpret,
    )(
        xw1_p, dy_p,
        h1s, c1s, h2s, c2s,
        h1s, c1s, h2s, c2s,
        w_hh1, w_ih2, w_hh2, b2.reshape(1, 4 * h),
    )
    return dxw1[:, :l], dw_hh1, dw_ih2, dw_hh2, db2.reshape(4 * h)


_double_lstm.defvjp(_double_lstm_fwd, _double_lstm_bwd)


def lstm_bf_pallas(params: Dict, x: jnp.ndarray,
                   interpret: bool | None = None) -> jnp.ndarray:
    """params: the bf_map param subtree {rnn1, rnn2, fc1, fc2} (norm is
    applied by the caller); x: (L, T, C) normalized embeddings ->
    (L, T, 2M) beamforming weights.

    ``interpret=None`` auto-selects the Pallas interpreter on non-TPU
    backends so the same code path runs in CPU tests."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    p1, p2 = params["rnn1"], params["rnn2"]

    # hoisted layer-1 input projection: one (L*T, C) @ (C, 4H) matmul.
    # Sequences keep the primal dtype: f32 inputs run the exact path,
    # bf16 (mixed-precision training) halves every kernel stream while the
    # carried state and all accumulations stay f32 inside the kernels.
    xw1 = x @ p1["w_ih"] + (p1["b_ih"] + p1["b_hh"])
    xw1 = jnp.transpose(xw1, (1, 0, 2))  # (T, L, 4H)
    b2 = p2["b_ih"] + p2["b_hh"]

    h2_seq = _double_lstm(xw1, p1["w_hh"], p2["w_ih"], p2["w_hh"], b2,
                          interpret)

    ys = jnp.transpose(h2_seq, (1, 0, 2))  # (L, T, H)
    # hoisted MLP: big batched matmuls on the MXU
    y = jax.nn.relu(ys @ params["fc1"]["kernel"] + params["fc1"]["bias"])
    return y @ params["fc2"]["kernel"] + params["fc2"]["bias"]
