"""Pin the cLN semantic gap across the torch<->flax interop boundary.

norm_type="cLN" intentionally diverges from the reference's cumulative
layer norm: a unit-variance virtual-frame prior stabilizes early-frame
gradients (nn/norms.py — without it the full-scale composed cLN model
NaNs by step 4). norm_type="cLN-ref" reproduces the reference-INTENDED
math exactly (reference: EaBNet.py:696-769 — "intended" because the
reference's own NormSwitch wiring crashes, passing the string dim label
as num_features, EaBNet.py:689-691; the norm classes themselves are
sound when constructed correctly).

These tests certify both claims:
  * cLN-ref matches the live torch CumulativeLayerNorm{1,2}d to float32
    round-off, so cLN-ref checkpoints interoperate bit-exactly.
  * cLN's divergence from cLN-ref is largest at frame 0 and decays ~1/t,
    so the converter warning's characterization is pinned, not folklore.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
HAVE_REF = os.path.isdir(REF)
if HAVE_REF and REF not in sys.path:
    sys.path.insert(0, REF)

import jax  # noqa: E402

from eabnet_tpu.nn.norms import NormSwitch  # noqa: E402


def _flax_cln(norm_type, x):
    mod = NormSwitch(norm_type, x.shape[-1])
    params = mod.init(jax.random.key(0), x)
    return np.asarray(mod.apply(params, x))


@pytest.mark.skipif(not HAVE_REF, reason="reference repo not mounted")
def test_cln_ref_matches_reference_1d():
    import torch
    from EaBNet import CumulativeLayerNorm1d

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 50, 24)).astype(np.float32)  # (B, T, C)
    ours = _flax_cln("cLN-ref", x)
    ref = CumulativeLayerNorm1d(num_features=24, affine=True)
    with torch.no_grad():
        # reference layout is (B, C, T)
        theirs = ref(torch.from_numpy(x.transpose(0, 2, 1)))
    np.testing.assert_allclose(
        ours, theirs.numpy().transpose(0, 2, 1), atol=2e-5, rtol=0
    )


@pytest.mark.skipif(not HAVE_REF, reason="reference repo not mounted")
def test_cln_ref_matches_reference_2d():
    import torch
    from EaBNet import CumulativeLayerNorm2d

    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 40, 11, 16)).astype(np.float32)  # (B,T,F,C)
    ours = _flax_cln("cLN-ref", x)
    ref = CumulativeLayerNorm2d(num_features=16, affine=True)
    with torch.no_grad():
        # reference layout is (B, C, T, F)
        theirs = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        ours, theirs.numpy().transpose(0, 2, 3, 1), atol=2e-5, rtol=0
    )


def test_cln_prior_divergence_decays_one_over_t():
    """|cLN - cLN-ref| is largest at frame 0 and decays ~1/t: the prior
    adds one virtual frame to statistics over t+1 real frames."""
    rng = np.random.default_rng(2)
    T = 400
    x = rng.normal(size=(1, T, 32)).astype(np.float32)
    with_prior = _flax_cln("cLN", x)
    without = _flax_cln("cLN-ref", x)
    diff = np.abs(with_prior - without).max(axis=(0, 2))  # per frame
    assert diff[0] > 20 * diff[-1]          # early >> late
    assert diff[0] > 0.02                   # the gap is real at t=0
    assert diff[-1] < 5e-3                  # and negligible by t=400
    # decays at least as fast as ~1/t: t * diff(t) never exceeds its
    # early-frame level over the tail (measured: faster than 1/t — the
    # prior's relative weight is 1/(t+1) in both mean and variance)
    tail = np.arange(50, T) * diff[50:]
    assert tail.max() <= 2 * (50 * diff[50]) + 1e-6


@pytest.mark.skipif(not HAVE_REF, reason="reference repo not mounted")
def test_converter_warns_on_cln_config():
    """Ingesting/exporting a cLN config must surface the semantic gap
    (ADVICE r3: silent activation divergence across the boundary)."""
    from eabnet_tpu.config import ComposedConfig, EaBNetConfig, \
        GaGNetConfig
    from eabnet_tpu.utils.convert_torch import _warn_cln_interop

    cln = ComposedConfig(
        eabnet=EaBNetConfig(norm_type="cLN"),
        gagnet=GaGNetConfig(norm_type="cLN"),
    )
    with pytest.warns(UserWarning, match="cLN-ref"):
        _warn_cln_interop(cln)

    import warnings

    exact = ComposedConfig(
        eabnet=EaBNetConfig(norm_type="cLN-ref"),
        gagnet=GaGNetConfig(norm_type="cLN-ref"),
    )
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        _warn_cln_interop(exact)  # no warning for the exact variant


def test_streaming_stepper_cln_ref_matches_offline():
    """The step-mode cLN-ref (no prior) must match the offline norm
    frame-for-frame, exactly like the cLN stepper does."""
    import jax.numpy as jnp

    from eabnet_tpu.streaming.stream import _NormStepper

    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 30, 8)).astype(np.float32)
    for norm_type in ("cLN", "cLN-ref"):
        offline = _flax_cln(norm_type, x)
        stepper = _NormStepper(norm_type)
        params = {"norm": {"scale": jnp.ones((8,)),
                           "bias": jnp.zeros((8,))}}
        state = stepper.init(2)
        outs = []
        for t in range(x.shape[1]):
            state, y = stepper(params, {}, state, jnp.asarray(x[:, t]))
            outs.append(np.asarray(y))
        np.testing.assert_allclose(
            np.stack(outs, axis=1), offline, atol=1e-5, rtol=0,
            err_msg=norm_type,
        )
