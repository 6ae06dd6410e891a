"""Pallas kernel tests (interpret mode on CPU; compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eabnet_tpu.config import EaBNetConfig
from eabnet_tpu.kernels.lstm_bf import lstm_bf_pallas
from eabnet_tpu.models.eabnet import LSTMBeamformer, _scan_head


def test_lstm_bf_pallas_matches_scan():
    l, t, c, h, m = 23, 17, 16, 8, 3
    head = LSTMBeamformer(embed_dim=c, M=m, hid_node=h)
    rng = np.random.default_rng(0)
    x4 = jnp.asarray(
        rng.standard_normal((1, t, l, c)).astype(np.float32) * 0.5
    )
    variables = head.init(jax.random.key(0), x4)
    params = variables["params"]
    sub = {k: params[k] for k in ("rnn1", "rnn2", "fc1", "fc2")}

    lanes = jnp.asarray(
        rng.standard_normal((l, t, c)).astype(np.float32) * 0.5
    )
    ref = np.asarray(_scan_head(sub, lanes))
    out = np.asarray(lstm_bf_pallas(sub, lanes, interpret=True))
    assert out.shape == ref.shape == (l, t, 2 * m)
    np.testing.assert_allclose(out, ref, atol=2e-5)


@pytest.mark.slow
def test_eabnet_pallas_impl_matches_scan():
    """Full model with bf_impl='pallas' (interpreted on CPU) == 'scan'."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(
        rng.standard_normal((1, 9, 161, 3, 2)).astype(np.float32) * 0.3
    )
    cfg_s = EaBNetConfig(c=8, M=3, embed_dim=8, cd1=8, p=2, q=1)
    cfg_p = EaBNetConfig(c=8, M=3, embed_dim=8, cd1=8, p=2, q=1,
                         bf_impl="pallas")
    from eabnet_tpu.models import EaBNet

    m_s = EaBNet(cfg_s)
    params = m_s.init(jax.random.key(0), x)
    out_s = np.asarray(m_s.apply(params, x))
    out_p = np.asarray(EaBNet(cfg_p).apply(params, x))
    np.testing.assert_allclose(out_p, out_s, atol=1e-5)


def test_lstm_bf_pallas_gradient_matches_scan():
    """The custom-VJP Pallas backward must reproduce jax.grad of the scan
    head for every parameter and the input."""
    l, t, c, h, m = 19, 13, 16, 8, 3
    head = LSTMBeamformer(embed_dim=c, M=m, hid_node=h)
    rng = np.random.default_rng(3)
    x4 = jnp.asarray(
        rng.standard_normal((1, t, l, c)).astype(np.float32) * 0.5
    )
    params = head.init(jax.random.key(0), x4)["params"]
    sub = {k: params[k] for k in ("rnn1", "rnn2", "fc1", "fc2")}
    lanes = jnp.asarray(
        rng.standard_normal((l, t, c)).astype(np.float32) * 0.5
    )
    cot = jnp.asarray(
        rng.standard_normal((l, t, 2 * m)).astype(np.float32)
    )

    def loss_scan(p, x):
        return jnp.sum(_scan_head(p, x) * cot)

    def loss_pallas(p, x):
        return jnp.sum(lstm_bf_pallas(p, x, interpret=True) * cot)

    ref_gp, ref_gx = jax.grad(loss_scan, argnums=(0, 1))(sub, lanes)
    got_gp, got_gx = jax.grad(loss_pallas, argnums=(0, 1))(sub, lanes)

    np.testing.assert_allclose(np.asarray(got_gx), np.asarray(ref_gx),
                               atol=3e-5, rtol=1e-4)
    flat_ref = jax.tree_util.tree_flatten_with_path(ref_gp)[0]
    got_flat = jax.tree_util.tree_flatten_with_path(got_gp)[0]
    for (path, a), (_, b) in zip(flat_ref, got_flat):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-5, rtol=1e-4,
            err_msg=str(path),
        )


def test_lstm_bf_pallas_lane_blocking(monkeypatch):
    """Multiple lane blocks + ragged padding must match the single-block
    result (forward and gradients)."""
    import eabnet_tpu.kernels.lstm_bf as K

    l, t, c, h, m = 23, 9, 16, 8, 3  # 23 lanes -> blocks of 8 (pad to 24)
    head = LSTMBeamformer(embed_dim=c, M=m, hid_node=h)
    rng = np.random.default_rng(4)
    x4 = jnp.asarray(
        rng.standard_normal((1, t, l, c)).astype(np.float32) * 0.5
    )
    params = head.init(jax.random.key(0), x4)["params"]
    sub = {k: params[k] for k in ("rnn1", "rnn2", "fc1", "fc2")}
    lanes = jnp.asarray(
        rng.standard_normal((l, t, c)).astype(np.float32) * 0.5
    )
    cot = jnp.asarray(rng.standard_normal((l, t, 2 * m)).astype(np.float32))

    def loss(p, x):
        return jnp.sum(lstm_bf_pallas(p, x, interpret=True) * cot)

    ref_y = lstm_bf_pallas(sub, lanes, interpret=True)
    ref_g = jax.grad(loss)(sub, lanes)

    monkeypatch.setattr(K, "LANE_BLOCK", 8)
    got_y = lstm_bf_pallas(sub, lanes, interpret=True)
    got_g = jax.grad(loss)(sub, lanes)

    np.testing.assert_allclose(np.asarray(got_y), np.asarray(ref_y),
                               atol=1e-5)
    for a, b in zip(jax.tree.leaves(ref_g), jax.tree.leaves(got_g)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=3e-5)


@pytest.mark.slow
def test_pallas_config_still_trains():
    """bf_impl='pallas' models must remain differentiable: training takes
    the scan path automatically (the kernel has no VJP)."""
    cfg = EaBNetConfig(c=8, M=3, embed_dim=8, cd1=8, p=2, q=1,
                       bf_impl="pallas")
    from eabnet_tpu.models import EaBNet

    rng = np.random.default_rng(6)
    x = jnp.asarray(
        rng.standard_normal((1, 7, 161, 3, 2)).astype(np.float32) * 0.3
    )
    model = EaBNet(cfg)
    params = model.init(jax.random.key(0), x, train=True)

    def loss(p):
        return jnp.sum(jnp.square(model.apply(p, x, train=True)))

    g = jax.grad(loss)(params)
    assert np.isfinite(
        float(jax.tree.leaves(g)[0].ravel()[0])
    )


def test_lstm_beamformer_param_tree_stable():
    """The scan/pallas refactor must keep the checkpoint param names."""
    head = LSTMBeamformer(embed_dim=16, M=3, hid_node=8)
    x = jnp.zeros((1, 4, 5, 16))
    params = head.init(jax.random.key(0), x)["params"]
    assert set(params) == {"norm", "rnn1", "rnn2", "fc1", "fc2"}
    assert set(params["rnn1"]) == {"w_ih", "w_hh", "b_ih", "b_hh"}
    assert set(params["fc1"]) == {"kernel", "bias"}
    assert set(params["norm"]) == {"scale", "bias"}
    assert params["rnn1"]["w_ih"].shape == (16, 32)
    assert params["fc2"]["kernel"].shape == (8, 6)
