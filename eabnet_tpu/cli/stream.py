"""Streaming enhancement CLI: process a wav frame-by-frame, as a real-time
deployment would — sample blocks in, sample blocks out, O(1) state.

    python -m eabnet_tpu.cli.stream in.wav out.wav --exp-root exp/

The model must use a causal norm (cLN or BN). Reports the mean per-frame
step latency against the 10 ms hop budget.
"""

from __future__ import annotations

import argparse
import time


def main(argv=None):
    parser = argparse.ArgumentParser(description="streaming enhancement")
    parser.add_argument("input")
    parser.add_argument("output")
    parser.add_argument("--exp-root", required=True)
    parser.add_argument("--ckpt", default=None)
    parser.add_argument("--mic-permutation", default=None)
    parser.add_argument("--output-stage", default="esti",
                        choices=["esti", "esti0"],
                        help="esti = composed EaBNet+GaGNet, esti0 = bare "
                        "EaBNet beamformer (same choice as cli.enhance)")
    args = parser.parse_args(argv)

    from eabnet_tpu.cli.common import respect_jax_platforms_env

    respect_jax_platforms_env()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from eabnet_tpu.dsp import StreamingIstft, StreamingStft
    from eabnet_tpu.inference import load_enhancer
    from eabnet_tpu.streaming import StreamingComposed
    from eabnet_tpu.utils.audio_io import read_wav, resample, write_wav

    enh = load_enhancer(args.exp_root, args.ckpt)
    cfg = enh.cfg
    model = StreamingComposed(cfg.model, enh.params)
    s_stft = StreamingStft(cfg.stft)
    s_istft = StreamingIstft(cfg.stft)
    hop = cfg.stft.hop_samples

    sr, noisy = read_wav(args.input)
    if noisy.ndim == 1:
        noisy = noisy[None]
    if sr != cfg.stft.sr:
        noisy = resample(noisy, sr, cfg.stft.sr)
    if args.mic_permutation:
        perm = [int(x) for x in args.mic_permutation.split(",")]
        noisy = noisy[np.asarray(perm)]
    m = noisy.shape[0]
    n = noisy.shape[1] - noisy.shape[1] % hop
    noisy = noisy[:, :n]

    @jax.jit
    def step(stft_state, model_state, istft_state, block):
        stft_state, frame = s_stft.push(stft_state, block)  # (1,M,F,2)
        frame = jnp.transpose(frame, (0, 2, 1, 3))  # (1, F, M, 2)
        model_state, out = model.step(model_state, frame)
        esti = out[args.output_stage]
        if cfg.stft.decompress_output:
            # same inverse power compression as the offline stft_to_wav
            from eabnet_tpu.dsp import power_uncompress

            esti = power_uncompress(esti, cfg.stft.compression)
        istft_state, samples = s_istft.push(istft_state, esti)
        return stft_state, model_state, istft_state, samples

    stft_state = s_stft.init_state(1, m)
    model_state = model.init_state(1)
    istft_state = s_istft.init_state(1)

    chunks = []
    t0 = time.perf_counter()
    for t in range(n // hop):
        block = jnp.asarray(noisy[None, :, t * hop : (t + 1) * hop])
        stft_state, model_state, istft_state, samples = step(
            stft_state, model_state, istft_state, block
        )
        chunks.append(samples)
    out = np.concatenate([np.asarray(c)[0] for c in chunks], axis=-1)
    wall = time.perf_counter() - t0
    frames = n // hop
    print(f"{frames} frames, {wall / frames * 1e3:.2f} ms/frame "
          f"(budget {hop / cfg.stft.sr * 1e3:.0f} ms)")
    write_wav(args.output, cfg.stft.sr, out, dtype="float")


if __name__ == "__main__":
    main()
