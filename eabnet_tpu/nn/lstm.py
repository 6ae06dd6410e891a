"""Unidirectional LSTM tuned for the TPU.

The input projection for ALL timesteps is hoisted out of the recurrence into
one large (B*T, C) @ (C, 4H) matmul that rides the MXU; the `lax.scan` body
then only carries the (B, H) @ (H, 4H) hidden matmul plus elementwise gates.
With the beamforming head's B*F-way lane batching (161*B lanes) the scan body
stays MXU-shaped.

Gate order is (i, f, g, o) — the torch convention — so checkpoint conversion
is a plain copy (reference recurrence: EaBNet.py:591-592).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class LSTM(nn.Module):
    """Single-layer unidirectional LSTM over (B, T, C) -> (B, T, H)."""

    hidden: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, t, c = x.shape
        h = self.hidden
        k = 1.0 / float(h) ** 0.5

        def uniform_init(key, shape):
            return jax.random.uniform(
                key, shape, jnp.float32, minval=-k, maxval=k
            )

        w_ih = self.param("w_ih", uniform_init, (c, 4 * h))
        w_hh = self.param("w_hh", uniform_init, (h, 4 * h))
        # two bias vectors like torch (they always add; kept separate for
        # exact parameter-count and checkpoint parity)
        bias = self.param("b_ih", uniform_init, (4 * h,)) + self.param(
            "b_hh", uniform_init, (4 * h,)
        )

        dtype = x.dtype
        xw = jnp.matmul(x, w_ih.astype(dtype),
                        preferred_element_type=jnp.float32)
        xw = (xw + bias).astype(dtype)  # (B, T, 4H)
        w_hh = w_hh.astype(dtype)

        def step(carry, xw_t):
            h_prev, c_prev = carry
            gates = xw_t + jnp.matmul(
                h_prev, w_hh, preferred_element_type=jnp.float32
            ).astype(dtype)
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c_new = nn.sigmoid(f) * c_prev + nn.sigmoid(i) * jnp.tanh(g)
            h_new = nn.sigmoid(o) * jnp.tanh(c_new)
            return (h_new, c_new), h_new

        init = (
            jnp.zeros((b, h), dtype),
            jnp.zeros((b, h), dtype),
        )
        xw_t_major = jnp.transpose(xw, (1, 0, 2))  # (T, B, 4H)
        _, ys = jax.lax.scan(step, init, xw_t_major)
        return jnp.transpose(ys, (1, 0, 2))

    @staticmethod
    def step_fn(params: dict, h_c, x_t: jnp.ndarray):
        """Single-frame step for streaming inference.

        ``params`` is this module's param dict {w_ih, w_hh, bias};
        ``h_c = (h, c)`` each (B, H); ``x_t`` (B, C).
        """
        h_prev, c_prev = h_c
        gates = (
            x_t @ params["w_ih"]
            + h_prev @ params["w_hh"]
            + params["b_ih"]
            + params["b_hh"]
        )
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c_new = nn.sigmoid(f) * c_prev + nn.sigmoid(i) * jnp.tanh(g)
        h_new = nn.sigmoid(o) * jnp.tanh(c_new)
        return (h_new, c_new), h_new
