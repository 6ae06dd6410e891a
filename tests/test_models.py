"""Model-level smoke tests: parameter counts and I/O shapes.

Parameter counts are hard parity anchors measured from the reference
(BASELINE.md: EaBNet 2,838,610 / GaGNet 5,950,697 trainable params).
The I/O shape contract mirrors the recorded reference trace
[4,601,161,9,2] -> [4,2,601,161] (EaBNet.py:810-813), modulo this
framework's native time-major layout.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eabnet_tpu.config import ComposedConfig, EaBNetConfig, GaGNetConfig
from eabnet_tpu.models import EaBNet, EaBNetWithPostNet, GaGNet
from eabnet_tpu.models.eabnet import to_reference_layout

B, T, F, M = 2, 41, 161, 9


def n_params(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


@pytest.fixture(scope="module")
def small_input():
    rng = np.random.default_rng(7)
    return jnp.asarray(
        rng.standard_normal((B, T, F, M, 2)).astype(np.float32)
    )


def test_eabnet_param_count_and_shape(small_input):
    model = EaBNet(EaBNetConfig(M=M))
    params = model.init(jax.random.key(0), small_input)
    assert n_params(params) == 2_838_610
    out = model.apply(params, small_input)
    assert out.shape == (B, T, F, 2)
    assert np.isfinite(np.asarray(out)).all()
    ref_layout = to_reference_layout(out)
    assert ref_layout.shape == (B, 2, T, F)


def test_gagnet_param_count_and_shape(small_input):
    model = GaGNet(GaGNetConfig())
    spec = small_input[..., 0, :]
    params = model.init(jax.random.key(0), spec, spec)
    assert n_params(params) == 5_950_697
    outs = model.apply(params, spec, spec)
    assert len(outs) == 3
    for o in outs:
        assert o.shape == (B, T, F, 2)
        assert np.isfinite(np.asarray(o)).all()


def test_composed_model(small_input):
    model = EaBNetWithPostNet(ComposedConfig(eabnet=EaBNetConfig(M=M)))
    params = model.init(jax.random.key(0), small_input)
    assert n_params(params) == 2_838_610 + 5_950_697
    out = model.apply(params, small_input)
    assert out["esti0"].shape == (B, T, F, 2)
    assert out["esti"].shape == (B, T, F, 2)
    assert len(out["esti1"]) == 3
    np.testing.assert_array_equal(
        np.asarray(out["esti"]), np.asarray(out["esti1"][-1])
    )


def test_eabnet_unet_variant(small_input):
    model = EaBNet(EaBNetConfig(M=M, is_u2=False))
    params = model.init(jax.random.key(0), small_input)
    out = model.apply(params, small_input)
    assert out.shape == (B, T, F, 2)


def test_eabnet_cnn_bf_and_miso(small_input):
    for kw in ({"bf_type": "cnn"}, {"topo_type": "miso"}):
        model = EaBNet(EaBNetConfig(M=M, **kw))
        params = model.init(jax.random.key(0), small_input)
        out = model.apply(params, small_input)
        assert out.shape == (B, T, F, 2)


def test_eabnet_norm_variants(small_input):
    for norm in ("BN", "cLN"):
        model = EaBNet(EaBNetConfig(M=M, norm_type=norm))
        variables = model.init(jax.random.key(0), small_input)
        out = model.apply(variables, small_input)
        assert out.shape == (B, T, F, 2)
        assert np.isfinite(np.asarray(out)).all()


def test_causality_of_eabnet():
    """Causal model: changing future frames must not affect past outputs."""
    cfg = EaBNetConfig(M=3, norm_type="cLN")  # cLN is the causal norm
    rng = np.random.default_rng(3)
    x1 = rng.standard_normal((1, 30, F, 3, 2)).astype(np.float32)
    x2 = x1.copy()
    x2[:, 20:] = rng.standard_normal(x2[:, 20:].shape)
    model = EaBNet(cfg)
    params = model.init(jax.random.key(0), jnp.asarray(x1))
    y1 = np.asarray(model.apply(params, jnp.asarray(x1)))
    y2 = np.asarray(model.apply(params, jnp.asarray(x2)))
    np.testing.assert_allclose(y1[:, :20], y2[:, :20], atol=1e-5)
    assert np.abs(y1[:, 20:] - y2[:, 20:]).max() > 1e-4


@pytest.mark.parametrize("flag", ["bf_remat", "enc_remat", "both"])
@pytest.mark.parametrize("is_u2", [True, False])
def test_remat_flags_are_checkpoint_compatible_and_equivalent(
        small_input, flag, is_u2):
    """The selective-remat memory flags (bf_remat: LSTM-BF scan body,
    enc_remat: whole encoder/decoder) must not change model semantics:
    identical param tree (a checkpoint trained either way loads in the
    other), same forward up to float reassociation (successive IN stages
    amplify fusion-order round-off), finite gradients."""
    kw = dict(M=M, c=16, embed_dim=16, cd1=16, p=2, q=1, is_u2=is_u2)
    base = EaBNet(EaBNetConfig(**kw))
    on = EaBNet(EaBNetConfig(
        **kw,
        bf_remat=flag in ("bf_remat", "both"),
        enc_remat=flag in ("enc_remat", "both"),
    ))
    v = base.init(jax.random.key(0), small_input)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(
                on.init(jax.random.key(0), small_input)))
    y0 = base.apply(v, small_input)
    y1 = on.apply(v, small_input)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               atol=5e-3, rtol=1e-3)

    def loss(p, mdl):
        return jnp.sum(jnp.square(mdl.apply(p, small_input, train=True)))

    g0 = jax.grad(loss)(v, base)
    g1 = jax.grad(loss)(v, on)
    flat0 = jnp.concatenate([jnp.ravel(x) for x in jax.tree.leaves(g0)])
    flat1 = jnp.concatenate([jnp.ravel(x) for x in jax.tree.leaves(g1)])
    assert bool(jnp.isfinite(flat1).all())
    # gradients agree in aggregate (cosine), not bit-for-bit
    cos = jnp.vdot(flat0, flat1) / (
        jnp.linalg.norm(flat0) * jnp.linalg.norm(flat1) + 1e-30)
    assert float(cos) > 0.999, float(cos)


def test_gagnet_enc_remat_equivalent(small_input):
    """GaGNetConfig.enc_remat: same contract as the EaBNet flag —
    identical param tree, equivalent forward, finite grads — on the
    composed model (the config large-batch training actually uses)."""
    kw = dict(
        eabnet=EaBNetConfig(M=M, c=16, embed_dim=16, cd1=16, p=2, q=1),
    )
    base = EaBNetWithPostNet(ComposedConfig(
        **kw, gagnet=GaGNetConfig(c=12, cd1=12, p=1, q=1, dilas=(1, 2))))
    on = EaBNetWithPostNet(ComposedConfig(
        **kw, gagnet=GaGNetConfig(c=12, cd1=12, p=1, q=1, dilas=(1, 2),
                                  enc_remat=True)))
    v = base.init(jax.random.key(0), small_input)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(
                on.init(jax.random.key(0), small_input)))
    y0 = base.apply(v, small_input)["esti"]
    y1 = on.apply(v, small_input)["esti"]
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               atol=5e-3, rtol=1e-3)
    g = jax.grad(lambda p: jnp.sum(jnp.square(
        on.apply(p, small_input, train=True)["esti"])))(v)
    flat = jnp.concatenate([jnp.ravel(x) for x in jax.tree.leaves(g)])
    assert bool(jnp.isfinite(flat).all())
