"""Cumulative layer norm: variance-prior semantics + gradient bounds.

Background: the full-size composed cLN model NaN'd by train step 4 on
the real chip (f32 AND bf16) — causal padding plus bias-dominated conv
outputs make early-frame cumulative sigma tiny, and ~30 stacked norms
amplify early-frame gradients by prod(1/sigma) until they overflow. The
unit-variance virtual-frame prior (nn/norms.py) bounds 1/sigma at t->0;
with it the same full-scale run converges (postnet loss 26.9 -> 0.18 in
40 steps, validated on-chip — NOTES_r3.md). The full failure needs the
full-size model + real data (minutes-scale), so this test pins the
properties the fix relies on instead: bounded gradients through a deep
cLN stack at a degenerate (constant) first frame, and prior decay to the
true statistics late in time.
"""

import jax
import jax.numpy as jnp
import numpy as np

from eabnet_tpu.nn.norms import CumulativeLayerNorm


def test_deep_cln_stack_gradients_finite_with_constant_first_frame():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 32, 64)).astype(np.float32)
    x[:, 0, :] = 0.7  # constant first frame: raw cumulative sigma -> 0

    layers = [CumulativeLayerNorm(64) for _ in range(10)]
    params = [m.init(jax.random.key(i), jnp.asarray(x))
              for i, m in enumerate(layers)]

    def loss(ps, xin):
        h = xin
        for m, p in zip(layers, ps):
            h = m.apply(p, h)
        return jnp.mean(jnp.square(h))

    g = jax.grad(loss, argnums=1)(params, jnp.asarray(x))
    assert bool(jnp.isfinite(g).all()), "cLN stack gradients overflowed"
    # bounded, not merely finite: without the variance prior the product
    # of per-layer 1/sigma factors reaches ~(1/sqrt(eps))^10 ~ 1e25
    assert float(jnp.max(jnp.abs(g))) < 1e4


def test_cln_matches_plain_statistics_late_in_time():
    # the prior must decay: late frames normalize with the true stats
    rng = np.random.default_rng(1)
    x = (rng.standard_normal((1, 2000, 64)) * 3 + 1).astype(np.float32)
    m = CumulativeLayerNorm(64)
    p = m.init(jax.random.key(0), jnp.asarray(x))
    y = np.asarray(m.apply(p, jnp.asarray(x)))
    flat = x[0, : 2000].reshape(-1)
    mean, std = flat.mean(), flat.std()
    expect = (x[0, -1] - mean) / std
    np.testing.assert_allclose(y[0, -1], expect, atol=5e-3)
