"""Parity for the composed model + losses against the live reference."""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference repo not mounted"
)

if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)

import jax.numpy as jnp  # noqa: E402
import torch  # noqa: E402

from eabnet_tpu.config import ComposedConfig, EaBNetConfig, GaGNetConfig  # noqa: E402
from eabnet_tpu.losses import (  # noqa: E402
    com_mag_mse_loss,
    eabnet_with_postnet_loss,
    frame_mask,
    stagewise_com_mag_mse_loss,
)
from eabnet_tpu.models import EaBNetWithPostNet  # noqa: E402
from eabnet_tpu.utils.convert_torch import convert_composed  # noqa: E402


def _ref_args(cfg: ComposedConfig):
    e, g = cfg.eabnet, cfg.gagnet
    return types.SimpleNamespace(
        k1=e.k1, k2=e.k2, c=e.c, M=e.M, embed_dim=e.embed_dim, kd1=e.kd1,
        cd1=e.cd1, d_feat=e.d_feat, p=e.p, q=e.q, is_causal=e.is_causal,
        is_u2=e.is_u2, bf_type=e.bf_type, topo_type=e.topo_type,
        intra_connect=e.intra_connect, norm_type=e.norm_type,
        ref_mic=cfg.ref_mic, freeze_eabnet=cfg.freeze_eabnet,
        gagnet_k1=g.k1, gagnet_k2=g.k2, gagnet_c=g.c, gagnet_kd1=g.kd1,
        gagnet_cd1=g.cd1, gagnet_d_feat=g.d_feat, gagnet_p=g.p,
        gagnet_q=g.q, gagnet_dilas=list(g.dilas), gagnet_fft_num=g.fft_num,
        gagnet_is_u2=g.is_u2, gagnet_is_causal=g.is_causal,
        gagnet_is_squeezed=g.is_squeezed, gagnet_acti_type=g.acti_type,
        gagnet_intra_connect=g.intra_connect, gagnet_norm_type=g.norm_type,
    )


@pytest.fixture(scope="module")
def ref_and_ours():
    import EaBNet as ref_mod

    # monkeypatch .cuda() away for the CPU-only test environment
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self

    cfg = ComposedConfig(eabnet=EaBNetConfig(M=9), gagnet=GaGNetConfig())
    torch.manual_seed(0)
    net = ref_mod.make_eabnet_with_postnet(_ref_args(cfg))
    net.eval()
    params = convert_composed(net.state_dict(), cfg)
    return cfg, net, params


def test_composed_forward_and_loss_parity(ref_and_ours):
    import EaBNet as ref_mod

    cfg, net, params = ref_and_ours
    rng = np.random.default_rng(44)
    b, t, f, m = 2, 31, 161, 9
    x = rng.standard_normal((b, t, f, m, 2)).astype(np.float32) * 0.3
    label = rng.standard_normal((b, 2, t, f)).astype(np.float32) * 0.3
    frames = [t, t - 7]

    with torch.no_grad():
        ref_out = net(torch.from_numpy(x))
        ref_losses = ref_mod.eabnet_with_postnet_loss(
            ref_out, torch.from_numpy(label), frames
        )

    model = EaBNetWithPostNet(cfg)
    ours = model.apply({"params": params}, jnp.asarray(x))

    # esti0 parity: ours (B,T,F,2) vs ref (B,2,T,F)
    np.testing.assert_allclose(
        np.transpose(np.asarray(ours["esti0"]), (0, 3, 1, 2)),
        ref_out["esti0_stft"].numpy(),
        atol=2e-4,
    )
    # final estimate parity: ref esti_stft is (B,2,T,F)
    np.testing.assert_allclose(
        np.transpose(np.asarray(ours["esti"]), (0, 3, 1, 2)),
        ref_out["esti_stft"].numpy(),
        atol=2e-4,
    )

    # loss parity (native layout: label -> (B,T,F,2))
    mask = frame_mask(np.asarray(frames), t)
    ours_losses = eabnet_with_postnet_loss(
        ours, jnp.asarray(np.transpose(label, (0, 2, 3, 1))), mask
    )
    for k in ("eabnet", "postnet", "final"):
        ref_key = {"eabnet": "eabnet", "postnet": "postnet",
                   "final": "final"}[k]
        np.testing.assert_allclose(
            float(ours_losses[k]),
            float(ref_losses[ref_key].item()),
            atol=1e-5,
            err_msg=k,
        )


def test_standalone_loss_parity():
    """Loss functions alone, with uneven frame counts."""
    import EaBNet as ref_mod
    import GaGNet as ref_gag

    rng = np.random.default_rng(45)
    b, t, f = 3, 25, 161
    esti = rng.standard_normal((b, 2, t, f)).astype(np.float32)
    label = rng.standard_normal((b, 2, t, f)).astype(np.float32)
    frames = [25, 13, 20]

    ref = float(
        ref_mod.com_mag_mse_loss(
            torch.from_numpy(esti), torch.from_numpy(label), frames
        ).item()
    )
    mask = frame_mask(np.asarray(frames), t)
    ours = float(
        com_mag_mse_loss(
            jnp.asarray(np.transpose(esti, (0, 2, 3, 1))),
            jnp.asarray(np.transpose(label, (0, 2, 3, 1))),
            mask,
        )
    )
    np.testing.assert_allclose(ours, ref, atol=1e-6)

    # stagewise: reference takes (B,2,F,T) inputs
    esti_list = [
        rng.standard_normal((b, 2, f, t)).astype(np.float32)
        for _ in range(3)
    ]
    ref_sw = float(
        ref_gag.stagewise_com_mag_mse_loss(
            [torch.from_numpy(e) for e in esti_list],
            torch.from_numpy(np.transpose(label, (0, 1, 3, 2))).contiguous(),
            frames,
        ).item()
    )
    ours_sw = float(
        stagewise_com_mag_mse_loss(
            [jnp.asarray(np.transpose(e, (0, 3, 2, 1))) for e in esti_list],
            jnp.asarray(np.transpose(label, (0, 2, 3, 1))),
            mask,
        )
    )
    np.testing.assert_allclose(ours_sw, ref_sw, atol=1e-6)
