"""Weights-only int8 serving (utils/quantize.py + Enhancer int8w)."""

import numpy as np
import pytest


def test_quantize_roundtrip_error_bound():
    import jax

    from eabnet_tpu.utils.quantize import (
        dequantize_weights, packed_nbytes, quantize_weights_int8,
    )

    rng = np.random.default_rng(0)
    params = {
        "conv": {"kernel": rng.standard_normal((3, 3, 8, 16)).astype(
            np.float32) * 0.1,
                 "bias": rng.standard_normal(16).astype(np.float32)},
        "norm": {"gain": np.ones(8, np.float32)},
    }
    packed = quantize_weights_int8(params)
    assert packed["conv"]["kernel"]["w"].dtype == np.int8
    assert packed["conv"]["bias"]["w"].dtype == np.float32  # 1-D kept
    back = jax.tree.map(np.asarray,
                        dequantize_weights(packed, np.float32))
    # per-channel symmetric: error <= scale/2 = absmax/254 per weight
    k = params["conv"]["kernel"]
    absmax = np.abs(k).max(axis=(0, 1, 2))
    assert np.all(np.abs(back["conv"]["kernel"] - k)
                  <= absmax / 254.0 + 1e-7)
    np.testing.assert_array_equal(back["conv"]["bias"],
                                  params["conv"]["bias"])
    # footprint: int8 weights dominate -> ~4x under f32
    f32_bytes = sum(np.asarray(x).nbytes
                    for x in jax.tree.leaves(params))
    assert packed_nbytes(packed) < 0.45 * f32_bytes


@pytest.mark.slow
def test_enhancer_int8w_close_to_f32():
    """int8w serving output stays close to f32 on a full forward (random
    tiny model; the released-artifact quality delta is measured in
    ROOFLINE.md)."""
    import jax

    from eabnet_tpu.config import (ComposedConfig, EaBNetConfig,
                                   ExperimentConfig, GaGNetConfig)
    from eabnet_tpu.inference import Enhancer
    from eabnet_tpu.train.step import create_train_state

    cfg = ExperimentConfig(
        model=ComposedConfig(
            eabnet=EaBNetConfig(M=3, c=16, embed_dim=16, cd1=16, p=2, q=1,
                                norm_type="cLN"),
            gagnet=GaGNetConfig(c=12, cd1=12, p=1, q=1, dilas=(1, 2),
                                norm_type="cLN"),
        ),
    )
    _, state = create_train_state(cfg, jax.random.key(0))
    rng = np.random.default_rng(5)
    wav = (rng.standard_normal((3, 8000)) * 0.05).astype(np.float32)

    ref = Enhancer(cfg, state.params)(wav)
    q = Enhancer(cfg, state.params, compute_dtype="int8w")(wav)
    assert q.shape == ref.shape
    err = np.linalg.norm(q - ref) / (np.linalg.norm(ref) + 1e-12)
    assert err < 0.15, err
    corr = float(np.corrcoef(q, ref)[0, 1])
    assert corr > 0.99, corr
