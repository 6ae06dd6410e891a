"""Pallas TPU kernels: activation-resident squeezed-TCM chain, forward
AND backward (custom VJP).

A SqueezedTCNGroup (reference: EaBNet.py:506-529 twin-gate chain;
GaGNet.py:261-284 single-branch chain) is a chain of p TCMs whose live
data is tiny — the (T, 256) trunk and (T, 64) bottleneck streams fit VMEM
outright — while XLA's op-by-op execution round-trips every intermediate
through HBM. The round-2 measurement campaign (NOTES_r2.md) showed these
stages are HBM-bound, not op-count-bound, and named this kernel as the
one mechanism with real headroom: keep the entire chain's activations in
VMEM.

Design:
- grid over the batch; each grid step holds one sample's (T, 256) trunk
  in VMEM and runs ALL p TCMs of the group — matmuls on the MXU, gates /
  PReLUs / instance-norm stats on the VPU — writing only the group output
  back to HBM. All p TCMs' weights are VMEM-resident for the whole grid.
- the 5-tap dilated causal conv is computed as ONE (T, K*C) x (K*C, C)
  matmul over a shifted-copies concat — a better MXU shape than K small
  matmuls.
- the BACKWARD is a second Pallas kernel with a custom VJP: it saves NO
  per-TCM activations in HBM (only the group input is a residual),
  recomputes the chain forward in VMEM, then walks it in reverse —
  manual derivatives through the residual trunk, 1x1 projections,
  instance norms (T-reductions), PReLUs, the sigmoid gate and the dilated
  convs — accumulating all weight gradients in VMEM scratch across the
  batch grid.
- instance-norm statistics and all accumulations are f32; matmul operands
  follow the primal dtype (bf16 under mixed-precision training).

Supports both TCM variants of the block library (nn/blocks.py):
twin_gate=True (EaBNet) and twin_gate=False (GaGNet). Norm support: IN
(the reference default). Matches SqueezedTCNGroup and its jax.grad
numerically (tested in interpret mode and on TPU,
tests/test_tcm_chain.py).

MEASURED RESULT (v5e, bf16, batch 8, T=601, interleaved 12-round A/B,
min under tenant sharing — full table in ROOFLINE.md): fwd+bwd
2.01 ms (pallas) vs 2.07 ms (xla) on the EaBNet stack, 0.77 vs 0.75 ms
on the GaGNet glance stack — PARITY. The HBM round-trips this kernel
removes are repaid by in-kernel recompute, rotate+mask shifts, and
half-tile C=64 matmuls; with round 2's three rejected op
restructurings this establishes the TCN stage is at its hardware floor.
Kept as a parity-tested alternative (the experiment-ledger convention);
the default stays tcn_impl="xla".
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-5


def _prelu(x, alpha):
    return jnp.maximum(x, 0.0) + alpha[None, :] * jnp.minimum(x, 0.0)


def _prelu_bwd(x, alpha, dy):
    dx = jnp.where(x > 0, dy, dy * alpha[None, :])
    dalpha = jnp.sum(dy * jnp.minimum(x, 0.0), axis=0)
    return dx, dalpha


def _in_fwd(x, gamma, beta):
    """Instance norm over the time axis of (T, C); returns
    (out, xhat, inv_std) — xhat/inv_std feed the backward."""
    mean = jnp.mean(x, axis=0, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=0, keepdims=True)
    inv = jax.lax.rsqrt(var + EPS)
    xhat = (x - mean) * inv
    return xhat * gamma[None, :] + beta[None, :], xhat, inv


def _in_bwd(xhat, inv, gamma, dy):
    """d/dx of instance norm given saved (xhat, inv_std)."""
    dgamma = jnp.sum(dy * xhat, axis=0)
    dbeta = jnp.sum(dy, axis=0)
    dxhat = dy * gamma[None, :]
    m1 = jnp.mean(dxhat, axis=0, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=0, keepdims=True)
    dx = inv * (dxhat - m1 - xhat * m2)
    return dx, dgamma, dbeta


def _shift_down(a, s):
    """(T, C) delayed by s frames (zeros enter at the top).

    Implemented as a sublane rotate + iota mask: jnp.pad/slice shifts
    lower to `tpu.concatenate` with unaligned row offsets, which Mosaic
    rejects ("offset mismatch on non-concat dimension"); `tpu.rotate`
    handles any static amount."""
    if s == 0:
        return a
    rolled = pltpu.roll(a, s, 0)
    idx = jax.lax.broadcasted_iota(jnp.int32, a.shape, 0)
    return jnp.where(idx < s, jnp.zeros_like(a), rolled)


def _shift_up(a, s):
    """(T, C) advanced by s frames (zeros enter at the bottom) — the
    transpose of _shift_down."""
    if s == 0:
        return a
    t = a.shape[0]
    rolled = pltpu.roll(a, t - s, 0)
    idx = jax.lax.broadcasted_iota(jnp.int32, a.shape, 0)
    return jnp.where(idx >= t - s, jnp.zeros_like(a), rolled)


def _dconv_fwd(n, w, dil, k, wdt):
    """Causal dilated conv as K per-tap matmuls over rotated inputs: tap
    i sees the input delayed by (k-1-i)*dil. w: (K, C, C)."""
    out = None
    for i in range(k):
        term = jnp.dot(
            _shift_down(n, (k - 1 - i) * dil).astype(wdt), w[i],
            preferred_element_type=jnp.float32,
        )
        out = term if out is None else out + term
    return out


def _dconv_bwd_data(dc, w, dil, k):
    """Cotangent wrt the conv input: each tap's contribution advanced
    forward in time (transpose of the delays in _dconv_fwd)."""
    dn = None
    for i in range(k):
        term = _shift_up(
            jnp.dot(dc, w[i].T, preferred_element_type=jnp.float32),
            (k - 1 - i) * dil,
        )
        dn = term if dn is None else dn + term
    return dn


def _tcm_fwd_math(x, j, refs, dils, k, twin, wdt):
    """One TCM forward on VMEM-resident values; returns (y, saved)."""
    (wi, wl, wr, wo, al, ga, be) = refs
    c = wi.shape[2]
    h = jnp.dot(x.astype(wdt), wi[j], preferred_element_type=jnp.float32)
    branches = (("L", 0, wl), ("R", 1, wr)) if twin else (("L", 0, wl),)
    conv = {}
    saved = {"h": h}
    for name, bi, w in branches:
        p = _prelu(h, al[j, bi])
        n, xhat, inv = _in_fwd(p, ga[j, bi], be[j, bi])
        conv[name] = _dconv_fwd(n, w[j], dils[j], k, wdt)
        saved[f"n{name}"] = n
        saved[f"xhat{name}"] = xhat
        saved[f"inv{name}"] = inv
    if twin:
        g = conv["L"] * jax.nn.sigmoid(conv["R"])
        saved["cL"], saved["cR"] = conv["L"], conv["R"]
    else:
        g = conv["L"]
        saved["cL"] = conv["L"]
    po = _prelu(g, al[j, 2])
    no, xhat_o, inv_o = _in_fwd(po, ga[j, 2], be[j, 2])
    saved["g"] = g
    saved["no"] = no
    saved["xhat_o"] = xhat_o
    saved["inv_o"] = inv_o
    y = x + jnp.dot(no.astype(wdt), wo[j],
                    preferred_element_type=jnp.float32)
    return y, saved


def _fwd_kernel(x_ref, wi_ref, wl_ref, wr_ref, wo_ref, al_ref, ga_ref,
                be_ref, y_ref, *, dils, k, twin):
    wdt = wi_ref.dtype
    x = x_ref[0].astype(jnp.float32)
    refs = (wi_ref[:], wl_ref[:], wr_ref[:], wo_ref[:],
            al_ref[:].astype(jnp.float32), ga_ref[:].astype(jnp.float32),
            be_ref[:].astype(jnp.float32))
    for j in range(len(dils)):
        x, _ = _tcm_fwd_math(x, j, refs, dils, k, twin, wdt)
    y_ref[0] = x.astype(y_ref.dtype)


def _bwd_kernel(x_ref, dy_ref,
                wi_ref, wl_ref, wr_ref, wo_ref, al_ref, ga_ref, be_ref,
                dx_ref, dwi_ref, dwl_ref, dwr_ref, dwo_ref, dal_ref,
                dga_ref, dbe_ref,
                awi, awl, awr, awo, aal, aga, abe, *, dils, k, twin):
    bi_idx = pl.program_id(0)
    n_b = pl.num_programs(0)
    wdt = wi_ref.dtype

    @pl.when(bi_idx == 0)
    def _():
        for a in (awi, awl, awr, awo, aal, aga, abe):
            a[:] = jnp.zeros_like(a)

    refs = (wi_ref[:], wl_ref[:], wr_ref[:], wo_ref[:],
            al_ref[:].astype(jnp.float32), ga_ref[:].astype(jnp.float32),
            be_ref[:].astype(jnp.float32))
    (wi, wl, wr, wo, al, ga, be) = refs
    c = wi.shape[2]
    p = len(dils)

    # ---- recompute the chain forward, keeping everything in VMEM
    x = x_ref[0].astype(jnp.float32)
    inputs = []
    saves = []
    for j in range(p):
        inputs.append(x)
        x, saved = _tcm_fwd_math(x, j, refs, dils, k, twin, wdt)
        saves.append(saved)

    # ---- reverse walk
    dy = dy_ref[0].astype(jnp.float32)
    for j in range(p - 1, -1, -1):
        s = saves[j]
        x_in = inputs[j]
        # y = x + no @ wo[j]
        dno = jnp.dot(dy.astype(wdt), wo[j].T,
                      preferred_element_type=jnp.float32)
        awo[j] += jnp.dot(s["no"].astype(wdt).T, dy.astype(wdt),
                          preferred_element_type=jnp.float32)
        dpo, dga_o, dbe_o = _in_bwd(s["xhat_o"], s["inv_o"], ga[j, 2], dno)
        aga[j, 2] += dga_o
        abe[j, 2] += dbe_o
        dg, dal_o = _prelu_bwd(s["g"], al[j, 2], dpo)
        aal[j, 2] += dal_o
        if twin:
            sig = jax.nn.sigmoid(s["cR"])
            dcl = dg * sig
            dcr = dg * s["cL"] * sig * (1.0 - sig)
            branches = (("L", 0, wl, awl, dcl), ("R", 1, wr, awr, dcr))
        else:
            branches = (("L", 0, wl, awl, dg),)
        dh = jnp.zeros_like(s["h"])
        for name, bidx, w, acc, dc in branches:
            dc16 = dc.astype(wdt)
            for i in range(k):
                acc[j, i] += jnp.dot(
                    _shift_down(s[f"n{name}"],
                                (k - 1 - i) * dils[j]).astype(wdt).T,
                    dc16, preferred_element_type=jnp.float32,
                )
            dn = _dconv_bwd_data(dc16, w[j], dils[j], k)
            dp, dga_b, dbe_b = _in_bwd(s[f"xhat{name}"], s[f"inv{name}"],
                                       ga[j, bidx], dn)
            aga[j, bidx] += dga_b
            abe[j, bidx] += dbe_b
            dhb, dal_b = _prelu_bwd(s["h"], al[j, bidx], dp)
            aal[j, bidx] += dal_b
            dh = dh + dhb
        awi[j] += jnp.dot(x_in.astype(wdt).T, dh.astype(wdt),
                          preferred_element_type=jnp.float32)
        dy = dy + jnp.dot(dh.astype(wdt), wi[j].T,
                          preferred_element_type=jnp.float32)

    dx_ref[0] = dy.astype(dx_ref.dtype)

    @pl.when(bi_idx == n_b - 1)
    def _():
        dwi_ref[:] = awi[:].astype(dwi_ref.dtype)
        dwl_ref[:] = awl[:].astype(dwl_ref.dtype)
        dwr_ref[:] = awr[:].astype(dwr_ref.dtype)
        dwo_ref[:] = awo[:].astype(dwo_ref.dtype)
        dal_ref[:] = aal[:].astype(dal_ref.dtype)
        dga_ref[:] = aga[:].astype(dga_ref.dtype)
        dbe_ref[:] = abe[:].astype(dbe_ref.dtype)


def _block(t, d):
    return pl.BlockSpec((1, t, d), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


_VMEM = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _chain(x, weights, dils: Tuple[int, ...], twin: bool,
           interpret: bool):
    """x: (B, T, D); weights: (wi, wl, wr, wo, alphas, gammas, betas)
    stacked over the p TCMs -> (B, T, D)."""
    return _chain_fwd(x, weights, dils, twin, interpret)[0]


def _chain_fwd(x, weights, dils, twin, interpret):
    b, t, d = x.shape
    k = weights[1].shape[1]
    y = pl.pallas_call(
        functools.partial(_fwd_kernel, dils=dils, k=k, twin=twin),
        grid=(b,),
        in_specs=[_block(t, d)] + [_VMEM()] * 7,
        out_specs=_block(t, d),
        out_shape=jax.ShapeDtypeStruct((b, t, d), x.dtype),
        compiler_params=None if interpret else _PARAMS,
        interpret=interpret,
    )(x, *weights)
    return y, (x, weights)


def _chain_bwd(dils, twin, interpret, res, dy):
    x, weights = res
    b, t, d = x.shape
    k = weights[1].shape[1]
    p = len(dils)
    c = weights[0].shape[2]
    f32 = jnp.float32
    shapes = tuple(
        jax.ShapeDtypeStruct(w.shape, w.dtype) for w in weights
    )
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, dils=dils, k=k, twin=twin),
        grid=(b,),
        in_specs=[_block(t, d), _block(t, d)] + [_VMEM()] * 7,
        out_specs=tuple([_block(t, d)] + [_VMEM()] * 7),
        out_shape=tuple([jax.ShapeDtypeStruct((b, t, d), x.dtype)]
                        + list(shapes)),
        scratch_shapes=[
            pltpu.VMEM((p, d, c), f32),      # awi
            pltpu.VMEM((p, k, c, c), f32),   # awl
            pltpu.VMEM((p, k, c, c), f32),   # awr
            pltpu.VMEM((p, c, d), f32),      # awo
            pltpu.VMEM((p, 3, c), f32),      # aal
            pltpu.VMEM((p, 3, c), f32),      # aga
            pltpu.VMEM((p, 3, c), f32),      # abe
        ],
        compiler_params=None if interpret else _PARAMS,
        interpret=interpret,
    )(x, dy, *weights)
    dx = outs[0]
    return dx, tuple(outs[1:])


_chain.defvjp(_chain_fwd, _chain_bwd)


def tcm_chain_pallas(params: dict, x: jnp.ndarray, kd1: int, cd1: int,
                     dilations: Tuple[int, ...], twin_gate: bool,
                     interpret: bool | None = None) -> jnp.ndarray:
    """Run a whole SqueezedTCNGroup from its flax param tree.

    params: {"tcm_i": {in_conv, {L}_act, {L}_norm, {L}_conv, ...,
    out_act, out_norm, out_conv}} exactly as nn/blocks.py names them
    (branch names: left/right for twin_gate, main otherwise);
    x: (B, T, d_feat) -> (B, T, d_feat).

    ``interpret=None`` auto-selects the Pallas interpreter off-TPU so the
    same code path runs in CPU tests.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    p = len(dilations)
    d = x.shape[-1]
    branch = ("left", "right") if twin_gate else ("main",)

    def stack(fn):
        return jnp.stack([fn(params[f"tcm_{j}"]) for j in range(p)])

    wi = stack(lambda t: t["in_conv"]["kernel"])          # (p, D, C)
    wl = stack(lambda t: t[f"{branch[0]}_conv"]["kernel"])  # (p, K, C, C)
    wr = (stack(lambda t: t["right_conv"]["kernel"]) if twin_gate
          else jnp.zeros_like(wl))
    wo = stack(lambda t: t["out_conv"]["kernel"])         # (p, C, D)

    def tri(fn):
        """(p, 3, C): [branch-L, branch-R (dup for single), out]."""
        names = (branch[0], branch[1] if twin_gate else branch[0], "out")
        return jnp.stack([
            jnp.stack([fn(params[f"tcm_{j}"], nm) for nm in names])
            for j in range(p)
        ])

    alphas = tri(lambda t, nm: t[f"{nm}_act"]["alpha"])
    gammas = tri(lambda t, nm: t[f"{nm}_norm"]["norm"]["scale"])
    betas = tri(lambda t, nm: t[f"{nm}_norm"]["norm"]["bias"])

    weights = (wi, wl, wr, wo, alphas, gammas, betas)
    y = _chain(x, weights, tuple(int(v) for v in dilations), twin_gate,
               interpret)
    del d, kd1, cd1
    return y
