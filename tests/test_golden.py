"""Standalone numerical parity via committed golden files.

Goldens were produced by tools/make_goldens.py from the PyTorch reference on
a reduced config; this test runs WITHOUT the reference or torch, proving the
converter + models reproduce recorded reference outputs bit-for-bit (2e-4).
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from eabnet_tpu.config import EaBNetConfig, GaGNetConfig
from eabnet_tpu.models import EaBNet, GaGNet
from eabnet_tpu.utils.convert_torch import convert_eabnet, convert_gagnet

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def _load(name):
    path = os.path.join(GOLDEN, f"{name}.npz")
    if not os.path.exists(path):
        pytest.skip(f"golden file {name}.npz missing")
    z = np.load(path)
    sd = {k[4:]: z[k] for k in z.files if k.startswith("sd::")}
    arrays = {k: z[k] for k in z.files if not k.startswith("sd::")}
    return sd, arrays


def test_eabnet_golden():
    sd, a = _load("eabnet_small")
    cfg = EaBNetConfig(c=16, M=3, embed_dim=16, cd1=16, p=2, q=2)
    params = convert_eabnet(sd, cfg)
    out = EaBNet(cfg).apply({"params": params}, jnp.asarray(a["x"]))
    ours = np.transpose(np.asarray(out), (0, 3, 1, 2))
    np.testing.assert_allclose(ours, a["y"], atol=2e-4)


def test_gagnet_golden():
    sd, a = _load("gagnet_small")
    cfg = GaGNetConfig(c=16, cd1=16, p=1, q=2)
    params = convert_gagnet(sd, cfg)
    outs = GaGNet(cfg).apply(
        {"params": params},
        jnp.asarray(np.transpose(a["inpt"], (0, 2, 3, 1))),
        jnp.asarray(np.transpose(a["pre"], (0, 2, 3, 1))),
    )
    for i, mine in enumerate(outs):
        ours = np.transpose(np.asarray(mine), (0, 3, 2, 1))
        np.testing.assert_allclose(ours, a[f"y{i}"], atol=2e-4)
