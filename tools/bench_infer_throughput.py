"""Batched inference throughput: utterances/sec/chip (BASELINE target).

``bench.py`` reports the latency-side headline (single-utterance RTF);
this tool reports the throughput side the BASELINE table names —
enhancement utterances/sec/chip — by batching the identical end-to-end
pipeline (STFT -> EaBNet -> GaGNet -> iSTFT, 6 s / 16 kHz / 9-mic,
reference: train_distributed.py:278-282) at several batch sizes in ONE
process (the tunnel pays a full compile per process) and interleaving
timing rounds across the arms so every arm sees the same tenant load.

    python tools/bench_infer_throughput.py --batches 1,4,8,16
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="1,4,8,16")
    ap.add_argument("--k", type=int, default=8,
                    help="chained executions per timing round")
    ap.add_argument("--rounds", type=int, default=10)
    ap.add_argument("--seconds", type=float, default=6.0)
    ap.add_argument("--compute-dtype", default="float32",
                    choices=["float32", "bfloat16", "int8w", "both",
                             "all"],
                    help="bfloat16 = the high-throughput serving mode "
                    "(model on the MXU in bf16, front-end/iSTFT f32; "
                    "same cast scheme as Enhancer(compute_dtype=...)); "
                    "int8w = per-channel int8 weights in HBM, bf16 "
                    "compute; 'both' interleaves f32 and bf16 arms at "
                    "every batch size in one process — the fair A/B "
                    "under chip time-sharing; 'all' adds int8w")
    ap.add_argument("--platform", default="default",
                    choices=["default", "cpu"],
                    help="cpu = force the CPU backend (smoke-testing)")
    ap.add_argument("--tiny", action="store_true",
                    help="reduced model (wiring smoke-tests)")
    args = ap.parse_args()
    batches = [int(b) for b in args.batches.split(",")]

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from eabnet_tpu.config import (
        ComposedConfig, EaBNetConfig, ExperimentConfig, GaGNetConfig,
    )
    from eabnet_tpu.dsp import prepare_data, stft_to_wav
    from eabnet_tpu.models import build_model
    from eabnet_tpu.models.eabnet import to_reference_layout

    if args.tiny:
        cfg = ExperimentConfig(model=ComposedConfig(
            eabnet=EaBNetConfig(M=9, c=16, embed_dim=16, cd1=16, p=2, q=1),
            gagnet=GaGNetConfig(c=12, cd1=12, p=1, q=1, dilas=(1, 2)),
        ))
    else:
        cfg = ExperimentConfig()
    model = build_model(cfg.model)
    sr = cfg.stft.sr
    n = int(args.seconds * sr)
    m = cfg.model.eabnet.M
    t_frames = cfg.stft.num_frames(n)
    dummy = jnp.zeros((1, t_frames, cfg.stft.freq_bins, m, 2), jnp.float32)
    params = jax.jit(model.init)(jax.random.key(0), dummy)

    dtypes = {"both": ["float32", "bfloat16"],
              "all": ["float32", "bfloat16", "int8w"]}.get(
        args.compute_dtype, [args.compute_dtype])

    packed = None
    if "int8w" in dtypes:
        from eabnet_tpu.utils.quantize import quantize_weights_int8

        packed = jax.device_put(quantize_weights_int8(params))

    def make_arm(b, dtype_name):
        cdt = jnp.float32 if dtype_name == "float32" else jnp.bfloat16
        int8w = dtype_name == "int8w"

        @jax.jit
        def enhance(wav):
            noisy_stft, _ = prepare_data(wav, None, cfg.stft)
            p = params
            if int8w:
                from eabnet_tpu.utils.quantize import dequantize_weights

                p = dequantize_weights(packed, cdt)
                noisy_stft = noisy_stft.astype(cdt)
            elif cdt != jnp.float32:
                p = jax.tree.map(lambda x: x.astype(cdt), params)
                noisy_stft = noisy_stft.astype(cdt)
            out = model.apply(p, noisy_stft)
            enhanced = stft_to_wav(
                to_reference_layout(out["esti"]).astype(jnp.float32),
                cfg.stft, length=n,
            )
            return jnp.broadcast_to(enhanced[:, None, :], wav.shape)

        rng = np.random.default_rng(b)
        x = jnp.asarray(
            (rng.standard_normal((b, m, n)) * 0.05).astype(np.float32)
        )
        return enhance, x

    def fetch(x):
        return float(np.asarray(x[(0,) * x.ndim]))

    keys = [(b, dt) for b in batches for dt in dtypes]
    arms = {}
    for b, dt in keys:
        t0 = time.time()
        fn, x = make_arm(b, dt)
        fetch(fn(x))  # compile + warmup
        arms[(b, dt)] = (fn, x)
        print(f"# compiled batch {b} {dt} in {time.time() - t0:.0f}s",
              flush=True)

    trivial = jax.jit(lambda v: v + 1.0)
    fetch(trivial(jnp.ones((1,), jnp.float32)))
    rtts = []
    for _ in range(7):
        t0 = time.perf_counter()
        fetch(trivial(jnp.ones((1,), jnp.float32)))
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))
    print(f"# tunnel rtt {rtt * 1e3:.1f} ms", flush=True)

    times = {k: [] for k in keys}
    for r in range(args.rounds):
        for k in keys:  # interleave arms within each round
            fn, x0 = arms[k]
            x = x0
            t0 = time.perf_counter()
            for _ in range(args.k):
                x = fn(x)
            fetch(x)
            times[k].append(time.perf_counter() - t0)

    print(f"{'batch':>5} {'dtype':>9} {'ms/batch':>9} {'utt/s':>8} "
          f"{'audio-s/s':>10} {'rtf/utt':>9}")
    results = {}
    for b, dt in keys:
        per_batch = (min(times[(b, dt)]) - rtt) / args.k  # min under sharing
        utt_s = b / per_batch
        results[(b, dt)] = utt_s
        print(f"{b:>5} {dt:>9} {per_batch * 1e3:>9.1f} {utt_s:>8.1f} "
              f"{utt_s * args.seconds:>10.0f} "
              f"{per_batch / b / args.seconds:>9.2e}")
    best = max(results, key=results.get)
    print(json.dumps({
        "metric": "enhance_utterances_per_sec_per_chip",
        "value": results[best],
        "unit": f"utt/s ({args.seconds:g}s, {m}-mic, batch {best[0]}, "
                f"{best[1]})",
        "per_arm": {f"{b}/{dt}": round(v, 2)
                    for (b, dt), v in results.items()},
    }))


if __name__ == "__main__":
    main()
