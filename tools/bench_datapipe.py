"""Online data-synthesis throughput: host pipeline vs device-side mixing.

Measures items/sec of the two synthesis paths over a synthetic corpus and
compares against the demand of a training step at the given batch size —
"can N workers keep the step fed?" (VERDICT r1 item 7; reference hot loop:
dataset/mcse_dataset.py:52-260 with up to 32 DataLoader workers,
train_zc.sh:30).

    python tools/bench_datapipe.py [--items 16] [--workers 4] [--batch 16]

Measured on this machine (2026-08, 4 workers, 6 s 9-mic items, batch-16
demand = 63 items/s at the 254 ms bf16 step):
- full host pipeline:      8.5-8.7 items/s  (~30 workers to keep up)
- host parts only:        44 items/s        (~6 workers to keep up)
- TPU v5e mix kernel:     55 ms/batch-16 -> 289 items/s (chained-execution
  timing, device-resident data; the axon tunnel's ~30 ms-RTT transfer is
  excluded because a locally-attached TPU moves the ~45 MB batch in ~4 ms)
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _write_corpus(root, fs=16000, n_speech=4, n_noise=6, seconds=6.0):
    from eabnet_tpu.utils.audio_io import write_wav

    rng = np.random.default_rng(5)
    t = np.arange(int(fs * seconds)) / fs
    sp, no = [], []
    for i in range(n_speech):
        p = os.path.join(root, f"sp{i}.wav")
        write_wav(p, fs, np.sin(2 * np.pi * (180 + 30 * i) * t) * 0.4
                  + rng.standard_normal(len(t)) * 0.02)
        sp.append(p)
    for i in range(n_noise):
        p = os.path.join(root, f"no{i}.wav")
        write_wav(p, fs, rng.standard_normal(len(t)) * 0.3)
        no.append(p)
    return sp, no


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--items", type=int, default=16)
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--clip-seconds", type=float, default=6.0)
    ap.add_argument("--step-ms", type=float, default=None,
                    help="train-step wall time to compare against "
                    "(default: the bf16+pallas batch-16 number from "
                    "README, scaled by batch/16)")
    ap.add_argument("--platform", default="default",
                    choices=["default", "cpu"],
                    help="pin the mixing device; over the axon TPU tunnel "
                    "the per-batch host->device RIR transfer rides a "
                    "~30 ms-RTT link and is NOT representative of a "
                    "locally-attached TPU — use cpu for an honest "
                    "host-offload comparison on this machine")
    args = ap.parse_args()

    if args.platform == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    from concurrent.futures import ProcessPoolExecutor

    from eabnet_tpu.data.datasets import synthesize_item
    from eabnet_tpu.data.device_mix import (
        device_mix_batch,
        synthesize_item_parts,
    )
    from eabnet_tpu.data.scenes import load_settings

    opt = load_settings("v2")
    with tempfile.TemporaryDirectory() as d:
        sp, no = _write_corpus(d, seconds=args.clip_seconds)

        def host_args(i):
            return dict(opt=opt, clip_seconds=args.clip_seconds,
                        speech_path=sp[i % len(sp)], noise_paths=no,
                        seed=1000 + i)

        # warm both paths (native build, jit compile) before timing
        synthesize_item(**host_args(0))
        device_mix_batch([synthesize_item_parts(**host_args(0))])

        with ProcessPoolExecutor(args.workers) as pool:
            t0 = time.time()
            futs = [pool.submit(synthesize_item, **host_args(i))
                    for i in range(args.items)]
            for f in futs:
                f.result()
            t_host = time.time() - t0

        with ProcessPoolExecutor(args.workers) as pool:
            t0 = time.time()
            futs = [pool.submit(synthesize_item_parts, **host_args(i))
                    for i in range(args.items)]
            parts = [f.result() for f in futs]
            t_parts = time.time() - t0
            t0 = time.time()
            for i in range(0, len(parts), args.batch):
                device_mix_batch(parts[i: i + args.batch])
            t_mix = time.time() - t0

        # scene mode: host emits parameters only (data/scene_mix.py);
        # RIR reconstruction + propagation live inside the train step,
        # so the host number IS the loader-supply number
        from eabnet_tpu.data.scene_mix import synthesize_item_scene

        synthesize_item_scene(**host_args(0))  # warm
        with ProcessPoolExecutor(args.workers) as pool:
            t0 = time.time()
            futs = [pool.submit(synthesize_item_scene, **host_args(i))
                    for i in range(args.items)]
            for f in futs:
                f.result()
            t_scene = time.time() - t0

    host_ips = args.items / t_host
    dev_ips = args.items / (t_parts + t_mix)
    scene_ips = args.items / t_scene
    step_ms = args.step_ms or (127.0 * args.batch / 8.0)
    demand_ips = args.batch / (step_ms / 1000.0)
    print(f"host pipeline:    {host_ips:7.2f} items/s "
          f"({args.workers} workers)")
    print(f"device-mix:       {dev_ips:7.2f} items/s "
          f"(host parts {args.items / t_parts:.2f}/s + "
          f"device mix {args.items / t_mix:.2f}/s)")
    print(f"scene params:     {scene_ips:7.2f} items/s "
          f"(host half of device_mix='scene'; the propagation is fused "
          f"into the train step)")
    print(f"train-step demand {demand_ips:7.2f} items/s "
          f"(batch {args.batch} @ {step_ms:.0f} ms)")
    for name, ips in (("host", host_ips), ("device-mix", dev_ips),
                      ("scene", scene_ips)):
        verdict = "keeps up" if ips >= demand_ips else "STARVES the step"
        print(f"  -> {name}: {verdict} ({ips / demand_ips:.2f}x demand)")


if __name__ == "__main__":
    main()
