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


def cln_cfg(norm_type):
    return ComposedConfig(
        eabnet=EaBNetConfig(M=3, c=16, embed_dim=16, cd1=16, p=2, q=2,
                            norm_type=norm_type),
        gagnet=GaGNetConfig(c=16, cd1=16, p=1, q=1, dilas=(1, 2),
                            norm_type=norm_type),
    )


def test_cln_ref_export_strict_load_and_forward_parity(ref_mod):
    """The full cumulative-norm interop loop: a flax 'cLN-ref' composed
    model exports to a .pth that the reference stack — with its
    NormSwitch wiring repaired in-memory (utils/reference_compat.py; the
    reference's own cLN branch crashes at construction, EaBNet.py:
    689-691, and its GaGNet has no cLN branch) — loads strict=True and
    reproduces at float32 round-off. Also pins the `gain`-named
    (1,C,1[,1]) affine mapping in convert_torch._norm."""
    import warnings

    from eabnet_tpu.utils.reference_compat import patch_reference_cln

    cfg = cln_cfg("cLN-ref")
    model = EaBNetWithPostNet(cfg)
    rng = np.random.default_rng(11)
    x = rng.standard_normal((1, 21, 161, 3, 2)).astype(np.float32) * 0.3
    variables = model.init(jax.random.key(6), jnp.asarray(x))
    ours = model.apply(variables, jnp.asarray(x))

    with patch_reference_cln():
        net = ref_mod.make_eabnet_with_postnet(
            reference_args_from_config(cfg))
    # perturb the norm affines away from init so the mapping is exercised
    import jax.tree_util as jtu

    def jitter(path, v):
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        if "norm" in name:
            return v + 0.05 * np.arange(v.size, dtype=v.dtype).reshape(
                v.shape) / max(v.size, 1)
        return v

    params = jtu.tree_map_with_path(jitter, variables["params"])
    ours = model.apply({"params": params}, jnp.asarray(x))
    sd, unmapped = export_torch_state_dict(params, cfg, net.state_dict())
    assert unmapped == []
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

    # and the ingestion direction: the reference-trained (hypothetical,
    # post-repair) cLN state_dict round-trips through the forward
    # converter bit-exactly
    from eabnet_tpu.utils.convert_torch import convert_composed

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        back = convert_composed(net.state_dict(), cfg)
    flat_a = dict(_flatten(params))
    flat_b = dict(_flatten(back))
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_array_equal(
            np.asarray(flat_a[k]), np.asarray(flat_b[k]), err_msg=str(k))


def _flatten(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flatten(v, prefix + (k,))
    else:
        yield prefix, tree
