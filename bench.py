"""Headline benchmark: real-time factor of 9-mic enhancement on one TPU chip.

Pipeline measured end-to-end on device: STFT featurization -> EaBNet
beamformer -> GaGNet post-filter -> iSTFT, on a 6 s / 16 kHz / 9-mic
utterance (the reference's training configuration,
train_distributed.py:278-282). RTF = wall-clock per utterance / utterance
duration; the BASELINE.md north-star target is RTF <= 0.01 per chip, so
``vs_baseline = 0.01 / rtf`` (>1 beats the target).

Prints exactly one JSON line.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from eabnet_tpu.config import ExperimentConfig
    from eabnet_tpu.dsp import prepare_data, stft_to_wav
    from eabnet_tpu.models import build_model
    from eabnet_tpu.models.eabnet import to_reference_layout

    cfg = ExperimentConfig()
    model = build_model(cfg.model)

    sr = cfg.stft.sr
    seconds = 6.0
    n = int(seconds * sr)
    m = cfg.model.eabnet.M
    rng = np.random.default_rng(0)
    noisy_wav = jnp.asarray(
        (rng.standard_normal((1, m, n)) * 0.05).astype(np.float32)
    )

    t_frames = cfg.stft.num_frames(n)
    dummy = jnp.zeros((1, t_frames, cfg.stft.freq_bins, m, 2), jnp.float32)
    params = jax.jit(model.init)(jax.random.key(0), dummy)

    @jax.jit
    def enhance(params, wav):
        noisy_stft, _ = prepare_data(wav, None, cfg.stft)
        out = model.apply(params, noisy_stft)
        return stft_to_wav(
            to_reference_layout(out["esti"]), cfg.stft, length=n
        )

    # warmup: compile + settle
    out = enhance(params, noisy_wav)
    jax.block_until_ready(out)
    for _ in range(2):
        jax.block_until_ready(enhance(params, noisy_wav))

    iters = 20
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(enhance(params, noisy_wav))
        times.append(time.perf_counter() - t0)

    rtf = float(np.median(times) / seconds)
    print(
        json.dumps(
            {
                "metric": "rtf_9mic_eabnet_gagnet_6s",
                "value": rtf,
                "unit": "rtf",
                "vs_baseline": 0.01 / rtf,
            }
        )
    )


if __name__ == "__main__":
    main()
