"""Pallas kernel tests (interpret mode on CPU; compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

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
