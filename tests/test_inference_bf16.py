"""bf16 serving mode of the Enhancer (compute_dtype="bfloat16").

The high-throughput serving configuration runs the model's convs and
matmuls on the MXU in bf16 while the STFT front-end and the iSTFT
reconstruction stay f32 (same cast scheme as the mixed-precision train
step, train/step.py). This pins the wiring: params/activations are cast
at apply time, the output is finite f32 audio, and it stays close to
the f32 reference output. Quality-at-parity on the released artifact is
measured in ROOFLINE.md (48-item set); this test is the fast plumbing
gate. Reference analog: none — the torch stack serves in f32 only
(enhance.py:48-52 runs the full-precision model).
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_setup():
    import jax

    from eabnet_tpu.config import (ComposedConfig, EaBNetConfig,
                                   ExperimentConfig, GaGNetConfig)
    from eabnet_tpu.train.step import create_train_state

    cfg = ExperimentConfig(
        model=ComposedConfig(
            eabnet=EaBNetConfig(M=9, c=16, embed_dim=16, cd1=16, p=2, q=1),
            gagnet=GaGNetConfig(c=12, cd1=12, p=1, q=1, dilas=(1, 2)),
        ),
    )
    _, state = create_train_state(cfg, jax.random.key(0))
    rng = np.random.default_rng(7)
    noisy = (rng.standard_normal((9, 8000)) * 0.05).astype(np.float32)
    return cfg, state.params, noisy


def test_bf16_enhancer_matches_f32(tiny_setup):
    from eabnet_tpu.inference import Enhancer

    cfg, params, noisy = tiny_setup
    out32 = Enhancer(cfg, params, output="esti")(noisy)
    out16 = Enhancer(cfg, params, output="esti",
                     compute_dtype="bfloat16")(noisy)

    assert out16.shape == out32.shape
    assert out16.dtype == np.float32  # reconstruction stays f32
    assert np.isfinite(out16).all()
    # bf16 has ~8 mantissa bits; through the full net the waveform should
    # still track the f32 output closely (this is a wiring gate — the
    # released-artifact quality delta is measured in ROOFLINE.md)
    denom = float(np.linalg.norm(out32)) + 1e-12
    rel = float(np.linalg.norm(out16 - out32)) / denom
    assert rel < 0.25, rel


def test_bf16_enhancer_rejects_bad_dtype(tiny_setup):
    from eabnet_tpu.inference import Enhancer

    cfg, params, _ = tiny_setup
    with pytest.raises(ValueError):
        Enhancer(cfg, params, compute_dtype="float16")
