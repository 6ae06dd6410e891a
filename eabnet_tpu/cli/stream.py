"""Streaming enhancement CLI: process audio frame-by-frame, as a real-time
deployment would — sample blocks in, sample blocks out, O(1) state.

    # one stream
    python -m eabnet_tpu.cli.stream in.wav out.wav --exp-root exp/
    # N concurrent streams: a directory of wavs served in lockstep from
    # ONE batched state (the realistic deployment shape — each chip step
    # advances every stream by one 10 ms frame)
    python -m eabnet_tpu.cli.stream in_dir/ out_dir/ --exp-root exp/

The model must use a causal norm (cLN or BN). Reports the mean per-frame
step latency against the 10 ms hop budget; in directory mode that one
latency pays for ALL streams (streams/chip capacity is the batch size at
which it still fits the hop).

Streams in a batch are independent (batch-dim-parallel linear algebra;
pinned by tests/test_streaming.py::test_multi_stream_independence), so
ragged stream lengths are served by zero-feeding finished streams and
trimming their outputs.
"""

from __future__ import annotations

import argparse
import os
import time


def main(argv=None):
    parser = argparse.ArgumentParser(description="streaming enhancement")
    parser.add_argument("input", help="wav file, or a directory of wavs "
                        "served as concurrent streams")
    parser.add_argument("output", help="wav file (or directory)")
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

    perm = None
    if args.mic_permutation:
        perm = [int(x) for x in args.mic_permutation.split(",")]

    def load(path):
        sr, noisy = read_wav(path)
        if noisy.ndim == 1:
            noisy = noisy[None]
        if sr != cfg.stft.sr:
            noisy = resample(noisy, sr, cfg.stft.sr)
        if perm is not None:
            noisy = noisy[np.asarray(perm)]
        n = noisy.shape[1] - noisy.shape[1] % hop
        return noisy[:, :n]

    if os.path.isdir(args.input):
        names = sorted(n for n in os.listdir(args.input)
                       if n.endswith(".wav"))
        if not names:
            raise FileNotFoundError(f"no wavs under {args.input}")
        os.makedirs(args.output, exist_ok=True)
        streams = [load(os.path.join(args.input, n)) for n in names]
        out_paths = [os.path.join(args.output, n) for n in names]
        mics = {s.shape[0] for s in streams}
        if len(mics) != 1:
            raise ValueError(f"streams must share a mic count, got {mics}")
    else:
        names = [os.path.basename(args.input)]
        streams = [load(args.input)]
        out_paths = [args.output]

    b = len(streams)
    m = streams[0].shape[0]
    lengths = [s.shape[1] for s in streams]
    n_max = max(lengths)
    batch = np.zeros((b, m, n_max), np.float32)
    for i, s in enumerate(streams):
        batch[i, :, : s.shape[1]] = s

    @jax.jit
    def step(stft_state, model_state, istft_state, block):
        stft_state, frame = s_stft.push(stft_state, block)  # (B,M,F,2)
        frame = jnp.transpose(frame, (0, 2, 1, 3))  # (B, F, M, 2)
        model_state, out = model.step(model_state, frame)
        esti = out[args.output_stage]
        if cfg.stft.decompress_output:
            # same inverse power compression as the offline stft_to_wav
            from eabnet_tpu.dsp import power_uncompress

            esti = power_uncompress(esti, cfg.stft.compression)
        istft_state, samples = s_istft.push(istft_state, esti)
        return stft_state, model_state, istft_state, samples

    stft_state = s_stft.init_state(b, m)
    model_state = model.init_state(b)
    istft_state = s_istft.init_state(b)

    chunks = []
    t0 = time.perf_counter()
    for t in range(n_max // hop):
        block = jnp.asarray(batch[:, :, t * hop : (t + 1) * hop])
        stft_state, model_state, istft_state, samples = step(
            stft_state, model_state, istft_state, block
        )
        chunks.append(samples)
    out = np.concatenate([np.asarray(c) for c in chunks], axis=-1)
    wall = time.perf_counter() - t0
    frames = n_max // hop
    budget = hop / cfg.stft.sr * 1e3
    per_frame = wall / frames * 1e3
    print(f"{b} stream(s), {frames} frames, {per_frame:.2f} ms/frame "
          f"(budget {budget:.0f} ms"
          + (f"; {per_frame / b:.2f} ms/frame/stream" if b > 1 else "")
          + ")")
    for i, (path, n_i) in enumerate(zip(out_paths, lengths)):
        write_wav(path, cfg.stft.sr, out[i, :n_i], dtype="float")


if __name__ == "__main__":
    main()
