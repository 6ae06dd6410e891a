"""Offline dataset generator CLI (reference:
dataset/mcse_dataset_offline_gen.py): pre-renders clean/ + noisy/ wav pairs
with a process pool; per-item deterministic seeds instead of per-process
reseeding, so the dataset is reproducible end-to-end. Supports the
`--reuse-speech` sliding-window mode."""

from __future__ import annotations

import argparse
import os
from concurrent.futures import ProcessPoolExecutor


def _render(job):
    from eabnet_tpu.data.datasets import synthesize_item
    from eabnet_tpu.utils.audio_io import write_wav

    (opt, clip_seconds, speech_path, noise_paths, seed, out_noisy,
     out_clean, start_sec, fs) = job
    noisy, clean = synthesize_item(
        opt, clip_seconds, speech_path, noise_paths, seed,
        speech_start_sec=start_sec,
    )
    write_wav(out_noisy, fs, noisy)
    write_wav(out_clean, fs, clean)
    return os.path.basename(out_noisy)


def main(argv=None):
    parser = argparse.ArgumentParser(description="offline dataset generator")
    parser.add_argument("--output-dir", required=True)
    parser.add_argument("--speech-root", required=True)
    parser.add_argument("--noise-root", required=True)
    parser.add_argument("--speech-list", required=True)
    parser.add_argument("--noise-list", required=True)
    parser.add_argument("--mcse-settings", required=True)
    parser.add_argument("--clip-seconds", type=float, required=True)
    parser.add_argument("--reuse-speech", action="store_true")
    parser.add_argument("--workers", type=int, default=16)
    parser.add_argument("--seed", type=int, default=12345)
    parser.add_argument("--limit", type=int, default=None)
    parser.add_argument("--items", type=int, default=None,
                        help="render exactly N items by cycling the "
                        "speech list with fresh per-item scene seeds "
                        "(each pass over a speech file draws a new room/"
                        "noise/SNR scene); mutually exclusive with "
                        "--reuse-speech")
    args = parser.parse_args(argv)
    if args.items and args.reuse_speech:
        parser.error("--items and --reuse-speech are mutually exclusive")

    from eabnet_tpu.cli.common import respect_jax_platforms_env

    respect_jax_platforms_env()

    from eabnet_tpu.data.scenes import load_settings
    from eabnet_tpu.utils.audio_io import read_wav

    opt = load_settings(args.mcse_settings)
    fs = int(opt["audio"]["fs"])
    noisy_root = os.path.join(args.output_dir, "noisy")
    clean_root = os.path.join(args.output_dir, "clean")
    os.makedirs(noisy_root, exist_ok=True)
    os.makedirs(clean_root, exist_ok=True)

    with open(args.speech_list) as f:
        speech_list = [x for x in f.read().split("\n") if x.strip()]
    with open(args.noise_list) as f:
        noise_list = [x for x in f.read().split("\n") if x.strip()]
    noise_paths = [os.path.join(args.noise_root, n) for n in noise_list]
    if args.limit:
        speech_list = speech_list[: args.limit]

    jobs = []
    if args.items:
        for k in range(args.items):
            speech = speech_list[k % len(speech_list)]
            speech_path = os.path.join(args.speech_root, speech)
            jobs.append((
                opt, args.clip_seconds, speech_path, noise_paths,
                args.seed + k,
                os.path.join(noisy_root, f"{k:05d}.wav"),
                os.path.join(clean_root, f"{k:05d}.wav"),
                None, fs,
            ))
        speech_list = []
    for i, speech in enumerate(speech_list):
        speech_path = os.path.join(args.speech_root, speech)
        if not args.reuse_speech:
            jobs.append((
                opt, args.clip_seconds, speech_path, noise_paths,
                args.seed + i,
                os.path.join(noisy_root, f"{i:05d}.wav"),
                os.path.join(clean_root, f"{i:05d}.wav"),
                None, fs,
            ))
        else:
            sr, audio = read_wav(speech_path)
            t, j = 0.0, 0
            while (t + args.clip_seconds) * sr <= len(audio):
                jobs.append((
                    opt, args.clip_seconds, speech_path, noise_paths,
                    args.seed + i * 1000 + j,
                    os.path.join(noisy_root, f"{i:05d}_{j}.wav"),
                    os.path.join(clean_root, f"{i:05d}_{j}.wav"),
                    t, fs,
                ))
                t += args.clip_seconds
                j += 1

    print(f"rendering {len(jobs)} items with {args.workers} workers")
    with ProcessPoolExecutor(max_workers=args.workers) as pool:
        for k, name in enumerate(pool.map(_render, jobs)):
            if (k + 1) % 50 == 0 or k + 1 == len(jobs):
                print(f"{k + 1}/{len(jobs)} done")


if __name__ == "__main__":
    main()
