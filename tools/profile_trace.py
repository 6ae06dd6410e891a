"""Capture a jax.profiler trace of the enhancement pipeline.

Writes a TensorBoard-compatible trace (xplane) so kernel-level timing can
be inspected with `tensorboard --logdir <out>` -> Profile tab.

    python tools/profile_trace.py --out /tmp/eabnet_trace [--steps 5]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="/tmp/eabnet_trace")
    parser.add_argument("--steps", type=int, default=5)
    args = parser.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from eabnet_tpu.config import ExperimentConfig
    from eabnet_tpu.dsp import prepare_data, stft_to_wav
    from eabnet_tpu.models import build_model
    from eabnet_tpu.models.eabnet import to_reference_layout
    from eabnet_tpu.train.loggers import profiler_trace

    cfg = ExperimentConfig()
    model = build_model(cfg.model)
    n = int(6.0 * cfg.stft.sr)
    m = cfg.model.eabnet.M
    rng = np.random.default_rng(0)
    wav = jnp.asarray(
        (rng.standard_normal((1, m, n)) * 0.05).astype(np.float32)
    )
    t_frames = cfg.stft.num_frames(n)
    params = jax.jit(model.init)(
        jax.random.key(0),
        jnp.zeros((1, t_frames, cfg.stft.freq_bins, m, 2), jnp.float32),
    )

    @jax.jit
    def enhance(w):
        s, _ = prepare_data(w, None, cfg.stft)
        e = stft_to_wav(
            to_reference_layout(model.apply(params, s)["esti"]),
            cfg.stft, length=n,
        )
        return jnp.broadcast_to(e[:, None, :], w.shape)

    # compile outside the trace
    x = enhance(wav)
    float(np.asarray(x).ravel()[0])

    with profiler_trace(args.out):
        for _ in range(args.steps):
            x = enhance(x)
        float(np.asarray(x).ravel()[0])
    print(f"trace written to {args.out}")


if __name__ == "__main__":
    main()
