"""Numerical parity against the live reference implementation.

These tests import the PyTorch reference from /root/reference (read-only
mount), copy its randomly-initialized weights through the checkpoint
converter, and require the JAX model to reproduce the torch outputs on the
same inputs. They skip automatically when the reference isn't mounted —
`test_golden.py` covers the standalone case with committed golden files.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference repo not mounted"
)

if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import torch  # noqa: E402

from eabnet_tpu.config import EaBNetConfig, GaGNetConfig  # noqa: E402
from eabnet_tpu.models import EaBNet, GaGNet  # noqa: E402
from eabnet_tpu.utils.convert_torch import (  # noqa: E402
    convert_eabnet,
    convert_gagnet,
)

ATOL = 2e-4


def _ref_eabnet(cfg: EaBNetConfig):
    import EaBNet as ref_mod

    torch.manual_seed(0)
    net = ref_mod.EaBNet(
        k1=cfg.k1, k2=cfg.k2, c=cfg.c, M=cfg.M, embed_dim=cfg.embed_dim,
        kd1=cfg.kd1, cd1=cfg.cd1, d_feat=cfg.d_feat, p=cfg.p, q=cfg.q,
        is_causal=cfg.is_causal, is_u2=cfg.is_u2, bf_type=cfg.bf_type,
        topo_type=cfg.topo_type, intra_connect=cfg.intra_connect,
        norm_type=cfg.norm_type,
    )
    net.eval()
    return net


def _ref_gagnet(cfg: GaGNetConfig):
    import GaGNet as ref_mod

    torch.manual_seed(0)
    net = ref_mod.GaGNet(
        cin=cfg.cin, k1=cfg.k1, k2=cfg.k2, c=cfg.c, kd1=cfg.kd1,
        cd1=cfg.cd1, d_feat=cfg.d_feat, p=cfg.p, q=cfg.q,
        dilas=list(cfg.dilas), fft_num=cfg.fft_num, is_u2=cfg.is_u2,
        is_causal=cfg.is_causal, is_squeezed=cfg.is_squeezed,
        acti_type=cfg.acti_type, intra_connect=cfg.intra_connect,
        norm_type=cfg.norm_type,
    )
    net.eval()
    return net


@pytest.mark.parametrize(
    "cfg",
    [
        EaBNetConfig(M=9),
        EaBNetConfig(M=9, is_u2=False),
        EaBNetConfig(M=9, bf_type="cnn"),
        EaBNetConfig(M=8, intra_connect="add"),
    ],
    ids=["default", "unet", "cnn_bf", "m8_add"],
)
def test_eabnet_forward_parity(cfg):
    net = _ref_eabnet(cfg)
    rng = np.random.default_rng(42)
    b, t, f = 2, 31, 161
    x = rng.standard_normal((b, t, f, cfg.M, 2)).astype(np.float32) * 0.3

    with torch.no_grad():
        ref_out = net(torch.from_numpy(x)).numpy()  # (B, 2, T, F)

    params = convert_eabnet(net.state_dict(), cfg)
    model = EaBNet(cfg)
    ours = model.apply({"params": params}, jnp.asarray(x))
    ours_ref_layout = np.transpose(np.asarray(ours), (0, 3, 1, 2))

    assert ours_ref_layout.shape == ref_out.shape
    np.testing.assert_allclose(ours_ref_layout, ref_out, atol=ATOL)


@pytest.mark.parametrize(
    "cfg",
    [
        GaGNetConfig(),
        GaGNetConfig(is_squeezed=True),
        GaGNetConfig(is_u2=False, acti_type="tanh"),
    ],
    ids=["default", "squeezed", "unet_tanh"],
)
def test_gagnet_forward_parity(cfg):
    net = _ref_gagnet(cfg)
    rng = np.random.default_rng(43)
    b, t, f = 2, 31, 161
    inpt = rng.standard_normal((b, 2, t, f)).astype(np.float32) * 0.3
    pre = rng.standard_normal((b, 2, t, f)).astype(np.float32) * 0.3

    with torch.no_grad():
        # reference forward expects (B,2,T,F) and transposes internally
        ref_outs = net(torch.from_numpy(inpt), torch.from_numpy(pre))
        ref_outs = [o.numpy() for o in ref_outs]  # (B, 2, F, T) each

    params = convert_gagnet(net.state_dict(), cfg)
    model = GaGNet(cfg)
    # native layout: (B, T, F, 2)
    ours = model.apply(
        {"params": params},
        jnp.asarray(np.transpose(inpt, (0, 2, 3, 1))),
        jnp.asarray(np.transpose(pre, (0, 2, 3, 1))),
    )
    assert len(ours) == len(ref_outs)
    for mine, theirs in zip(ours, ref_outs):
        mine_ref_layout = np.transpose(np.asarray(mine), (0, 3, 2, 1))
        np.testing.assert_allclose(mine_ref_layout, theirs, atol=ATOL)
