"""Pallas TPU kernel: the fused double-LSTM recurrence of the beamforming
head.

The beamformer head (reference: EaBNet.py:581-614) is the model's only
time-sequential section: two stacked unidirectional LSTMs + a 2-layer MLP
over T frames, batched over L = B*F frequency lanes. This kernel keeps the
sequential path as lean as possible:

- layer-1 input projections for ALL timesteps are hoisted outside into one
  large MXU matmul and streamed in per-step through the grid pipeline;
- the per-step body does exactly two MXU ops: h1 @ W_hh1, and a single
  fused [h1_new, h2] @ [W_ih2; W_hh2] for layer 2;
- recurrent state (h1, c1, h2, c2) lives in VMEM scratch, never HBM;
- the trailing MLP is hoisted back outside the kernel and runs as one
  (L*T, H) batched matmul where the MXU is actually utilized.

Matches `LSTMBeamformer(impl='scan')` numerically (tested).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(xw1_ref, w_hh1_ref, w2_ref, b2_ref, out_ref, h1, c1, h2, c2):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h1[:] = jnp.zeros_like(h1)
        c1[:] = jnp.zeros_like(c1)
        h2[:] = jnp.zeros_like(h2)
        c2[:] = jnp.zeros_like(c2)

    def lstm_gates(gates, c_prev):
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c_new = (
            jax.nn.sigmoid(f) * c_prev + jax.nn.sigmoid(i) * jnp.tanh(g)
        )
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        return h_new, c_new

    gates1 = xw1_ref[0] + jnp.dot(
        h1[:], w_hh1_ref[:], preferred_element_type=jnp.float32
    )
    h1_new, c1_new = lstm_gates(gates1, c1[:])

    # layer 2: one fused matmul [h1_new, h2] @ [[W_ih2], [W_hh2]]
    hh = jnp.concatenate([h1_new, h2[:]], axis=-1)
    gates2 = b2_ref[:] + jnp.dot(
        hh, w2_ref[:], preferred_element_type=jnp.float32
    )
    h2_new, c2_new = lstm_gates(gates2, c2[:])

    h1[:] = h1_new
    c1[:] = c1_new
    h2[:] = h2_new
    c2[:] = c2_new
    out_ref[0] = h2_new


def lstm_bf_pallas(params: Dict, x: jnp.ndarray,
                   interpret: bool | None = None) -> jnp.ndarray:
    """params: the bf_map param subtree {rnn1, rnn2, fc1, fc2} (norm is
    applied by the caller); x: (L, T, C) normalized embeddings ->
    (L, T, 2M) beamforming weights.

    ``interpret=None`` auto-selects the Pallas interpreter on non-TPU
    backends so the same code path runs in CPU tests."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    l, t, c = x.shape
    p1, p2 = params["rnn1"], params["rnn2"]
    h = p1["w_hh"].shape[0]

    # hoisted layer-1 input projection: one (L*T, C) @ (C, 4H) matmul
    xw1 = x @ p1["w_ih"] + (p1["b_ih"] + p1["b_hh"])
    xw1 = jnp.transpose(xw1, (1, 0, 2))  # (T, L, 4H)

    w2 = jnp.concatenate([p2["w_ih"], p2["w_hh"]], axis=0)  # (2H, 4H)
    b2 = (p2["b_ih"] + p2["b_hh"]).reshape(1, 4 * h)

    vmem = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    h2_seq = pl.pallas_call(
        _kernel,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, l, 4 * h), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            vmem(), vmem(), vmem(),  # w_hh1, w2, b2
        ],
        out_specs=pl.BlockSpec((1, l, h), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, l, h), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((l, h), jnp.float32),
            pltpu.VMEM((l, h), jnp.float32),
            pltpu.VMEM((l, h), jnp.float32),
            pltpu.VMEM((l, h), jnp.float32),
        ],
        interpret=interpret,
    )(xw1.astype(jnp.float32), p1["w_hh"], w2, b2)

    ys = jnp.transpose(h2_seq, (1, 0, 2))  # (L, T, H)
    # hoisted MLP: big batched matmuls on the MXU
    y = jax.nn.relu(ys @ params["fc1"]["kernel"] + params["fc1"]["bias"])
    return y @ params["fc2"]["kernel"] + params["fc2"]["bias"]
