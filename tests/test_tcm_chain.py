"""Fused Pallas TCM-chain kernel vs the module chain: identical param
trees, outputs and gradients (kernels/tcm_chain.py; interpret mode on
CPU, the same code path that runs compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eabnet_tpu.nn.blocks import SqueezedTCNGroup

B, T, D, C = 2, 33, 128, 64


def _group(impl, twin, dils=(1, 2, 4), kd1=5, d=D, c=C):
    return SqueezedTCNGroup(kd1, c, d, dils, is_causal=True,
                            norm_type="IN", twin_gate=twin, impl=impl)


def _data(seed=0, d=D):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((B, T, d)).astype(np.float32))


@pytest.mark.parametrize("twin", [True, False], ids=["twin", "single"])
def test_param_tree_identical(twin):
    x = _data()
    v_x = _group("xla", twin).init(jax.random.key(3), x)
    v_p = _group("pallas", twin).init(jax.random.key(3), x)
    flat_x = jax.tree_util.tree_flatten_with_path(v_x)[0]
    flat_p = jax.tree_util.tree_flatten_with_path(v_p)[0]
    assert [p for p, _ in flat_x] == [p for p, _ in flat_p]
    for (path, a), (_, b) in zip(flat_x, flat_p):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b)), path


@pytest.mark.parametrize("twin", [True, False], ids=["twin", "single"])
@pytest.mark.parametrize("kd1,dils", [(5, (1, 2, 4)), (3, (1, 2, 5, 9))],
                         ids=["eabnet-shape", "gagnet-shape"])
def test_forward_matches_module_chain(twin, kd1, dils):
    x = _data(1)
    gx = _group("xla", twin, dils, kd1)
    gp = _group("pallas", twin, dils, kd1)
    v = gx.init(jax.random.key(0), x)
    out_x = gx.apply(v, x)
    out_p = gp.apply(v, x)
    assert out_p.shape == out_x.shape
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               atol=2e-5)


@pytest.mark.parametrize("twin", [True, False], ids=["twin", "single"])
def test_gradients_match_module_chain(twin):
    x = _data(2)
    gx = _group("xla", twin)
    gp = _group("pallas", twin)
    v = gx.init(jax.random.key(1), x)

    def loss(g, params, inp):
        y = g.apply({"params": params}, inp)
        return jnp.sum(y * jnp.cos(jnp.arange(y.size).reshape(y.shape)
                                   * 0.01))

    lx, gradx = jax.value_and_grad(
        lambda p, i: loss(gx, p, i), argnums=(0, 1))(v["params"], x)
    lp, gradp = jax.value_and_grad(
        lambda p, i: loss(gp, p, i), argnums=(0, 1))(v["params"], x)
    assert float(lx) == pytest.approx(float(lp), rel=1e-5)
    flat_x = jax.tree_util.tree_flatten_with_path(gradx[0])[0]
    flat_p = jax.tree_util.tree_flatten_with_path(gradp[0])[0]
    for (path, a), (_, b) in zip(flat_x, flat_p):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=6e-5, rtol=1e-3,
            err_msg=str(path))
    np.testing.assert_allclose(np.asarray(gradp[1]), np.asarray(gradx[1]),
                               atol=6e-5, rtol=1e-3)


def test_bf16_stream_stays_finite():
    """Mixed-precision path: bf16 activations/params, f32 stats inside."""
    x = _data(4).astype(jnp.bfloat16)
    gp = _group("pallas", True)
    v = gp.init(jax.random.key(2), _data(4))
    params16 = jax.tree.map(lambda p: p.astype(jnp.bfloat16), v["params"])
    y = gp.apply({"params": params16}, x)
    assert y.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(y, np.float32)).all()


def test_model_level_tcn_impl_parity():
    """EaBNet with tcn_impl='pallas' matches 'xla' end-to-end on shared
    params."""
    from eabnet_tpu.config import EaBNetConfig
    from eabnet_tpu.models import EaBNet

    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((1, 10, 161, 3, 2)).astype(
        np.float32) * 0.3)
    cfg_x = EaBNetConfig(c=8, M=3, embed_dim=8, cd1=16, p=3, q=2)
    cfg_p = EaBNetConfig(c=8, M=3, embed_dim=8, cd1=16, p=3, q=2,
                         tcn_impl="pallas")
    mx, mp = EaBNet(cfg_x), EaBNet(cfg_p)
    v = mx.init(jax.random.key(0), x)
    np.testing.assert_allclose(
        np.asarray(mp.apply(v, x)), np.asarray(mx.apply(v, x)), atol=3e-5)


def test_cln_falls_back_to_module_chain():
    """norm_type='cLN' is outside the kernel's coverage: impl='pallas'
    must silently use the module chain (identical results by
    construction)."""
    x = _data(5)
    g = SqueezedTCNGroup(5, C, D, (1, 2), norm_type="cLN",
                         twin_gate=True, impl="pallas")
    v = g.init(jax.random.key(0), x)
    ref = SqueezedTCNGroup(5, C, D, (1, 2), norm_type="cLN",
                           twin_gate=True, impl="xla")
    np.testing.assert_allclose(np.asarray(g.apply(v, x)),
                               np.asarray(ref.apply(v, x)), atol=0)
