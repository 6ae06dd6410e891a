"""Post-training weights-only int8 quantization for serving.

Every >=2-D parameter (conv HWIO kernels, dense/LSTM matrices) is stored
as symmetric per-output-channel int8 (scale over all axes but the last —
flax puts output features last); 1-D parameters (biases, norm gains,
PReLU alphas) stay float. At apply time the weights dequantize to the
compute dtype on-device, so the MXU still runs bf16/f32 matmuls
("weights-only" quantization): the win is a 4x smaller parameter
footprint in HBM and on disk, bought at a per-channel relative weight
error <= 1/254.

For THIS model family the honest expectation (measured in ROOFLINE.md)
is that throughput does not move — the step is activation- and
recurrence-bound, parameters are a few MB — so int8w is a
footprint/packaging option with a quality gate, not a speed knob. The
measurement exists either way; BASELINE's serving north star is quoted
per compute mode.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _is_packed(x) -> bool:
    return isinstance(x, dict) and set(x.keys()) == {"w", "s"}


def quantize_weights_int8(params) -> Any:
    """Float param pytree -> packed pytree of {"w": int8|f32, "s": scale}
    leaves (consumed by :func:`dequantize_weights`)."""
    import jax

    def pack(leaf) -> Dict[str, np.ndarray]:
        w = np.asarray(leaf)
        if w.ndim < 2 or not np.issubdtype(w.dtype, np.floating):
            return {"w": w, "s": np.float32(1.0)}
        absmax = np.abs(w).max(axis=tuple(range(w.ndim - 1)))  # (O,)
        scale = np.where(absmax > 0, absmax / 127.0, 1.0).astype(
            np.float32)
        q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
        return {"w": q, "s": scale}

    return jax.tree.map(pack, params)


def dequantize_weights(packed, dtype) -> Any:
    """Packed pytree -> float params in ``dtype`` (jit-traceable; runs
    on-device so the stored weights stay int8 in HBM)."""
    import jax
    import jax.numpy as jnp

    def unpack(leaf):
        w = jnp.asarray(leaf["w"])
        if w.dtype == jnp.int8:
            return w.astype(dtype) * jnp.asarray(leaf["s"], dtype)
        return w.astype(dtype)

    return jax.tree.map(unpack, packed, is_leaf=_is_packed)


def packed_nbytes(packed) -> int:
    """Parameter bytes of a packed tree (the HBM/disk footprint claim)."""
    import jax

    total = 0
    for leaf in jax.tree.leaves(packed, is_leaf=_is_packed):
        total += np.asarray(leaf["w"]).nbytes + np.asarray(
            leaf["s"]).nbytes
    return total
