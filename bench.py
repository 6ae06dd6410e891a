"""Headline benchmark: real-time factor of 9-mic enhancement on one TPU chip.

Pipeline measured end-to-end on device: STFT featurization -> EaBNet
beamformer -> GaGNet post-filter -> iSTFT, on a 6 s / 16 kHz / 9-mic
utterance (the reference's training configuration,
train_distributed.py:278-282). RTF = wall-clock per utterance / utterance
duration; the BASELINE.md north-star target is RTF <= 0.01 per chip, so
``vs_baseline = 0.01 / rtf`` (>1 beats the target).

Timing methodology: this environment reaches the TPU through a network
tunnel where `block_until_ready` does NOT synchronize, so naive timing
under-reports by orders of magnitude. Instead K executions of one jitted
pipeline are chained by feeding each output back as the next input (async
dispatch queues them on device), completion is forced by fetching a scalar
of the final result, and the measured round-trip latency of a trivial
fetch is subtracted before dividing by K.

Prints exactly one JSON line.
"""

import json
import time

import numpy as np


def _fetch(x) -> float:
    import numpy as _np

    return float(_np.asarray(x).ravel()[0])


def _timed_chain(fn, x0, k: int, iters: int = 5) -> float:
    """Median wall-clock of k chained executions + one host fetch."""
    x = fn(x0)
    _fetch(x)  # warmup / compile
    ts = []
    for _ in range(iters):
        x = x0
        t0 = time.perf_counter()
        for _ in range(k):
            x = fn(x)
        _fetch(x[(0,) * x.ndim])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    import jax

    # compiling through the TPU tunnel is slow; persist compiled programs
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from eabnet_tpu.config import ExperimentConfig
    from eabnet_tpu.dsp import prepare_data, stft_to_wav
    from eabnet_tpu.models import build_model
    from eabnet_tpu.models.eabnet import to_reference_layout

    # default (scan) head: the fused Pallas head is 2.1x faster in
    # isolation but pipeline-level A/B shows parity within tunnel noise,
    # so the portable path stays the benchmark configuration
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
    def enhance(wav):
        noisy_stft, _ = prepare_data(wav, None, cfg.stft)
        out = model.apply(params, noisy_stft)
        enhanced = stft_to_wav(
            to_reference_layout(out["esti"]), cfg.stft, length=n
        )
        # feed the output back as the next multichannel input so repeated
        # dispatches form one dependent chain on the device
        return jnp.broadcast_to(enhanced[:, None, :], wav.shape)

    # measured tunnel round-trip of a trivial program + fetch
    trivial = jax.jit(lambda x: x + 1.0)
    _fetch(trivial(jnp.ones((1,), jnp.float32)))
    rtts = []
    for _ in range(7):
        t0 = time.perf_counter()
        _fetch(trivial(jnp.ones((1,), jnp.float32)))
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))

    K = 20
    total = _timed_chain(enhance, noisy_wav, K)
    per_utt = max(total - rtt, 1e-9) / K
    rtf = per_utt / seconds

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
