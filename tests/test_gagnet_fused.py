"""Fused glance-gaze stage == the unfused modules, on a shared param tree.

FusedGlanceGaze (models/gagnet_fused.py) must be a drop-in for
GlanceGazeModule: identical variable tree (so checkpoints, the .pth
converter and the streaming engine are untouched), identical outputs and
parameter gradients up to f32 summation order.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eabnet_tpu.config import GaGNetConfig
from eabnet_tpu.models.gagnet import GaGNet, GlanceGazeModule
from eabnet_tpu.models.gagnet_fused import FusedGlanceGaze


def _cfg(**kw):
    base = dict(p=2, q=2, dilas=(1, 2, 5), norm_type="IN")
    base.update(kw)
    return GaGNetConfig(**base)


def _inputs(cfg, b=2, t=13, seed=0):
    rng = np.random.default_rng(seed)
    feat = jnp.asarray(rng.standard_normal((b, t, cfg.d_feat)), jnp.float32)
    pre = jnp.asarray(
        rng.standard_normal((b, t, cfg.freq_bins, 2)), jnp.float32)
    return feat, pre


@pytest.mark.parametrize("norm_type", ["IN", "cLN"])
@pytest.mark.parametrize("squeezed", [False, True])
def test_stage_matches_unfused(norm_type, squeezed):
    cfg = _cfg(norm_type=norm_type, is_squeezed=squeezed)
    feat, pre = _inputs(cfg)
    ref = GlanceGazeModule(cfg)
    fused = FusedGlanceGaze(cfg)
    v = ref.init(jax.random.key(0), feat, pre)
    vf = fused.init(jax.random.key(0), feat, pre)
    assert jax.tree.structure(v) == jax.tree.structure(vf)
    for (pa, a), (pb, bb) in zip(
            jax.tree.leaves_with_path(v), jax.tree.leaves_with_path(vf)):
        assert pa == pb and a.shape == bb.shape, (pa, a.shape, bb.shape)
    yr = ref.apply(v, feat, pre)
    yf = fused.apply(v, feat, pre)
    np.testing.assert_allclose(yf, yr, atol=2e-5)


def test_stage_gradients_match():
    cfg = _cfg()
    feat, pre = _inputs(cfg, seed=3)
    ref = GlanceGazeModule(cfg)
    fused = FusedGlanceGaze(cfg)
    v = ref.init(jax.random.key(1), feat, pre)

    def loss(mod):
        def f(params):
            return jnp.sum(jnp.square(mod.apply(params, feat, pre)))
        return jax.grad(f)(v)

    gr, gf = loss(ref), loss(fused)
    for (path, a), (_, b) in zip(
            jax.tree.leaves_with_path(gr), jax.tree.leaves_with_path(gf)):
        scale = np.maximum(1e-3, np.abs(a).max())
        assert float(np.abs(a - b).max()) < 1e-2 * scale, path


def test_full_gagnet_fused_vs_unfused():
    """Whole GaGNet: the fused_stages flag changes nothing numerically."""
    cfg_f = _cfg(fused_stages=True)
    cfg_u = _cfg(fused_stages=False)
    rng = np.random.default_rng(7)
    x = jnp.asarray(
        rng.standard_normal((1, 9, cfg_f.freq_bins, 2)), jnp.float32)
    pre = jnp.asarray(
        rng.standard_normal((1, 9, cfg_f.freq_bins, 2)), jnp.float32)
    net_f, net_u = GaGNet(cfg_f), GaGNet(cfg_u)
    v = net_u.init(jax.random.key(0), x, pre)
    assert jax.tree.structure(v) == jax.tree.structure(
        net_f.init(jax.random.key(0), x, pre))
    outs_u = net_u.apply(v, x, pre)
    outs_f = net_f.apply(v, x, pre)
    for a, b in zip(outs_u, outs_f):
        np.testing.assert_allclose(b, a, atol=3e-5)


def test_bn_falls_back_to_unfused():
    """norm_type='BN' must keep working (unfused path) when
    fused_stages=True is requested."""
    cfg = _cfg(norm_type="BN", fused_stages=True)
    feat_pre = _inputs(cfg)
    net = GaGNet(cfg)
    rng = np.random.default_rng(1)
    x = jnp.asarray(
        rng.standard_normal((1, 7, cfg.freq_bins, 2)), jnp.float32)
    pre = jnp.asarray(
        rng.standard_normal((1, 7, cfg.freq_bins, 2)), jnp.float32)
    v = net.init(jax.random.key(0), x, pre, train=True)
    assert "batch_stats" in v
    outs, _ = net.apply(v, x, pre, train=True, mutable=["batch_stats"])
    assert all(bool(jnp.isfinite(o).all()) for o in outs)
