"""Alternative frequency-strided convs == the XLA strided/transposed convs.

The polyphase (nn/phase_conv.py) and space-to-depth (nn/s2d_conv.py)
implementations must be bit-for-bit drop-ins (up to f32 summation order)
for the stride-(1,2) convs they replace: same param pytree, same outputs,
same gradients. These tests share ONE param pytree between the xla
implementation and each alternative, for every block that can switch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eabnet_tpu.nn.blocks import (
    Conv2dUnit,
    Deconv2dUnit,
    GateConv2d,
    GateConvTranspose2d,
    U2NetDecoder,
    U2NetEncoder,
)

KF_CASES = [((2, 3), 80), ((2, 5), 161), ((1, 3), 39), ((2, 3), 21)]
IMPLS = ["phase", "s2d"]


def _x(f, c=6, b=2, t=11, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((b, t, f, c)), jnp.float32)


@pytest.mark.parametrize("impl", IMPLS)
@pytest.mark.parametrize("kernel,f", KF_CASES)
def test_gate_conv_phase_matches_xla(kernel, f, impl):
    x = _x(f)
    phase = GateConv2d(8, kernel, (1, 2), impl=impl)
    ref = GateConv2d(8, kernel, (1, 2), impl="xla")
    v = ref.init(jax.random.key(0), x)
    # identical param pytree: phase must run from the xla-initialized params
    chex_same = jax.tree.structure(v) == jax.tree.structure(
        phase.init(jax.random.key(0), x))
    assert chex_same
    np.testing.assert_allclose(
        phase.apply(v, x), ref.apply(v, x), atol=1e-5)


@pytest.mark.parametrize("impl", IMPLS)
@pytest.mark.parametrize("kernel,f", KF_CASES)
def test_gate_deconv_phase_matches_xla(kernel, f, impl):
    x = _x(f)
    phase = GateConvTranspose2d(8, kernel, (1, 2), impl=impl)
    ref = GateConvTranspose2d(8, kernel, (1, 2), impl="xla")
    v = ref.init(jax.random.key(0), x)
    assert jax.tree.structure(v) == jax.tree.structure(
        phase.init(jax.random.key(0), x))
    np.testing.assert_allclose(
        phase.apply(v, x), ref.apply(v, x), atol=1e-5)


@pytest.mark.parametrize("impl", IMPLS)
@pytest.mark.parametrize("kernel,f", [((1, 3), 80), ((1, 3), 41)])
def test_conv_units_match(kernel, f, impl):
    x = _x(f)
    for phase_cls, kw in [(Conv2dUnit, {}), (Deconv2dUnit, {})]:
        phase = phase_cls(kernel, 8, "BN", impl=impl, **kw)
        ref = phase_cls(kernel, 8, "BN", impl="xla", **kw)
        v = ref.init(jax.random.key(1), x, train=False)
        np.testing.assert_allclose(
            phase.apply(v, x, train=False),
            ref.apply(v, x, train=False), atol=1e-5)


@pytest.mark.parametrize("alt", IMPLS)
def test_full_encoder_decoder_match_and_grads(alt):
    """Whole U²Net encoder+decoder: outputs AND parameter gradients agree
    between the alternative and XLA implementations on shared params."""
    x = _x(161, c=18, b=1, t=7, seed=3)
    mk = lambda impl: (
        U2NetEncoder(16, (2, 3), (1, 3), "cat", "BN", impl=impl),
        U2NetDecoder(24, 16, (2, 3), (1, 3), "cat", "BN", impl=impl),
    )
    enc_p, dec_p = mk(alt)
    enc_r, dec_r = mk("xla")
    ve = enc_r.init(jax.random.key(0), x, train=False)
    bott, skips = enc_r.apply(ve, x, train=False)
    vd = dec_r.init(jax.random.key(1), bott, skips, train=False)

    def run(enc, dec, ve, vd):
        b, s = enc.apply(ve, x, train=False)
        return dec.apply(vd, b, s, train=False)

    yp = run(enc_p, dec_p, ve, vd)
    yr = run(enc_r, dec_r, ve, vd)
    np.testing.assert_allclose(yp, yr, atol=2e-5)

    def loss(enc, dec):
        def f(params):
            return jnp.sum(jnp.square(run(enc, dec, params["e"],
                                          params["d"])))
        return jax.grad(f)({"e": ve, "d": vd})

    # grads pick up f32 summation-order noise through 8 nested-UNet stages
    # and a quadratic loss; compare relative to the gradient scale
    gp, gr = loss(enc_p, dec_p), loss(enc_r, dec_r)
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gr)):
        scale = np.maximum(1e-3, np.abs(b).max())
        assert float(np.abs(a - b).max()) < 2e-2 * scale


@pytest.mark.parametrize("impl", IMPLS)
def test_even_freq_kernel_rejected(impl):
    x = _x(32)
    with pytest.raises(ValueError):
        GateConv2d(8, (2, 4), (1, 2), impl=impl).init(
            jax.random.key(0), x)
