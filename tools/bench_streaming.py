"""Streaming (per-frame) latency benchmark.

The serving question: can one chip run causal frame-by-frame enhancement
inside the 10 ms frame hop? Measures the full StreamingComposed step over a
T-frame utterance via its lax.scan `run` (total time / T = exact per-frame
cost; the tunnel RTT is subtracted).

    python tools/bench_streaming.py [--frames 200]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--frames", type=int, default=200)
    parser.add_argument("--norm", default="cLN")
    parser.add_argument("--exp-root", default=None,
                        help="load config + trained weights from a "
                        "release/experiment dir (the latency quote for "
                        "the model actually deployed) instead of the "
                        "default-config random-init model")
    parser.add_argument("--streams", default="1",
                        help="comma-separated concurrent-stream counts "
                        "(batch sizes of ONE shared state): sweep them "
                        "in one process and report the largest that "
                        "still fits the 10 ms hop — the streams/chip "
                        "capacity number")
    args = parser.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from eabnet_tpu.config import ComposedConfig, EaBNetConfig, GaGNetConfig
    from eabnet_tpu.streaming import StreamingComposed

    if args.exp_root:
        from eabnet_tpu.inference import load_enhancer

        enh = load_enhancer(args.exp_root)
        cfg, params = enh.cfg.model, enh.params
        t, f, m = args.frames, enh.cfg.stft.freq_bins, cfg.eabnet.M
        rng = np.random.default_rng(0)
        frames = jnp.asarray(
            (rng.standard_normal((1, t, f, m, 2)) * 0.3).astype(np.float32)
        )
    else:
        cfg = ComposedConfig(
            eabnet=EaBNetConfig(norm_type=args.norm),
            gagnet=GaGNetConfig(norm_type=args.norm if args.norm != "IN"
                                else "IN"),
        )
        t, f, m = args.frames, 161, cfg.eabnet.M
        rng = np.random.default_rng(0)
        frames = jnp.asarray(
            (rng.standard_normal((1, t, f, m, 2)) * 0.3).astype(np.float32)
        )

        # init params via the offline model (shared tree)
        from eabnet_tpu.models import EaBNetWithPostNet

        model = EaBNetWithPostNet(cfg)
        params = jax.jit(model.init)(jax.random.key(0), frames)["params"]

    s = StreamingComposed(cfg, params)
    run = jax.jit(s.run)

    def fetch(x):
        return float(np.asarray(x).ravel()[0])

    triv = jax.jit(lambda x: x + 1.0)
    fetch(triv(jnp.ones(1))[0])
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        fetch(triv(jnp.ones(1))[0])
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))

    stream_counts = [int(x) for x in args.streams.split(",")]
    capacity = 0
    for b in stream_counts:
        batch = jnp.broadcast_to(frames, (b,) + frames.shape[1:])
        fetch(run(batch)[0, 0, 0, 0])  # compile this batch size
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            fetch(run(batch)[0, 0, 0, 0])
            ts.append(time.perf_counter() - t0)
        per_frame = (float(np.median(ts)) - rtt) / t
        fits = per_frame < 0.01
        if fits:
            capacity = max(capacity, b)
        print(
            f"streaming step ({args.norm}, {b} stream(s)): "
            f"{per_frame * 1e6:.0f} us/frame "
            f"({per_frame * 1e6 / b:.0f} us/frame/stream; budget "
            f"10,000 us at 10 ms hop; "
            f"{'fits' if fits else 'OVER BUDGET'}, "
            f"{0.01 / per_frame:.1f}x headroom)"
        )
    if len(stream_counts) > 1:
        print(f"streams/chip capacity (largest swept batch under the "
              f"hop): {capacity}")


if __name__ == "__main__":
    main()
