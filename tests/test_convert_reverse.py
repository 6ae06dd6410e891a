"""Reverse checkpoint conversion: flax params -> reference torch
state_dict (the TPU->reference half of the interop loop).

Against the live reference from /root/reference: (1) torch -> flax ->
torch roundtrips bit-exactly and loads with strict=True; (2) a
flax-initialized model exported to torch produces the same forward output
as this framework, on the composed model (reference: EaBNet.py:127-155).
"""

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

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import torch  # noqa: E402

from eabnet_tpu.config import (  # noqa: E402
    ComposedConfig, EaBNetConfig, GaGNetConfig,
)
from eabnet_tpu.models import EaBNetWithPostNet  # noqa: E402
from eabnet_tpu.utils.convert_args import (  # noqa: E402
    reference_args_from_config,
)
from eabnet_tpu.utils.convert_torch import (  # noqa: E402
    convert_composed, export_torch_state_dict,
)


def small_cfg():
    return ComposedConfig(
        eabnet=EaBNetConfig(M=3, c=16, embed_dim=16, cd1=16, p=2, q=2),
        gagnet=GaGNetConfig(c=16, cd1=16, p=1, q=1, dilas=(1, 2)),
    )


@pytest.fixture(scope="module")
def ref_mod():
    saved = (torch.Tensor.cuda, torch.nn.Module.cuda)
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    import EaBNet as mod

    yield mod
    torch.Tensor.cuda, torch.nn.Module.cuda = saved


def test_roundtrip_bit_exact_and_strict_load(ref_mod):
    cfg = small_cfg()
    torch.manual_seed(3)
    net = ref_mod.make_eabnet_with_postnet(
        reference_args_from_config(cfg)
    )
    sd = net.state_dict()
    params = convert_composed(sd, cfg)
    back, unmapped = export_torch_state_dict(params, cfg, sd)
    assert unmapped == []  # every reference tensor is mapped
    for k, v in sd.items():
        np.testing.assert_array_equal(
            np.asarray(back[k]), v.detach().cpu().numpy(), err_msg=k
        )
    net.load_state_dict(
        {k: torch.from_numpy(v.copy()) for k, v in back.items()},
        strict=True,
    )


def test_flax_init_exported_to_torch_forward_parity(ref_mod):
    cfg = small_cfg()
    model = EaBNetWithPostNet(cfg)
    rng = np.random.default_rng(9)
    x = rng.standard_normal((1, 21, 161, 3, 2)).astype(np.float32) * 0.3
    variables = model.init(jax.random.key(5), jnp.asarray(x))
    ours = model.apply(variables, jnp.asarray(x))

    net = ref_mod.make_eabnet_with_postnet(reference_args_from_config(cfg))
    sd, _ = export_torch_state_dict(
        variables["params"], cfg, net.state_dict()
    )
    net.load_state_dict(
        {k: torch.from_numpy(v.copy()) for k, v in sd.items()},
        strict=True,
    )
    net.eval()
    with torch.no_grad():
        theirs = net(torch.from_numpy(x))

    np.testing.assert_allclose(
        np.transpose(np.asarray(ours["esti0"]), (0, 3, 1, 2)),
        theirs["esti0_stft"].numpy(), atol=2e-4,
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(ours["esti"]), (0, 3, 1, 2)),
        theirs["esti_stft"].numpy(), atol=2e-4,
    )
