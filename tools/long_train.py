"""Long-horizon training drive: thousands of steps on real hardware with
metric curves, exercising checkpoint-resume continuously.

The reference's recipe is 60 epochs over a rendered corpus
(reference: train_distributed.py:273-275, train_wbh.sh offline run); this
tool reproduces that regime end-to-end and adds what the reference never
had — a committed quality curve. It stages a formant-synth corpus, renders
an offline train set + frozen val set, then trains in chunks: every chunk
boundary saves a checkpoint, RE-ENTERS training through the auto-resume
path (so resume is exercised dozens of times per run, not once), scores
both model stages (esti0 = bare EaBNet, esti = composed GaGNet output) on
the frozen val set, and appends one JSON line to ``curves.jsonl``.

Two-phase composed recipe (reference: EaBNet.py:150-155 freeze_eabnet,
train_distributed.py:221-230): pass ``--freeze-after N`` to freeze the
beamformer once step N is reached and train only the post-filter after.

    python tools/long_train.py --workdir /root/longrun \
        --max-steps 30000 --chunk 1000
"""

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def stage_data(root, n_speech, n_noise, seconds, train_items, val_items,
               workers, settings, render_train=True):
    """Corpus -> split -> offline train render (offline mode only) ->
    frozen val render. Every stage is skipped if its output already
    exists (resumable). Online mode trains straight off the corpus
    (per-item scenes synthesized on the fly), so only the frozen val set
    is rendered."""
    from tools.e2e_demo import make_corpus

    sp_dir = os.path.join(root, "speech")
    done = os.path.join(root, ".staged")
    settings_path = os.path.join(root, "settings.json")
    if os.path.exists(done):
        return settings_path
    make_corpus(root, n_speech=n_speech, n_noise=n_noise, seconds=seconds)
    no_dir = os.path.join(root, "noise")
    with open(settings_path, "w") as f:
        json.dump(settings, f)

    from eabnet_tpu.cli.datagen import main as datagen_main
    from eabnet_tpu.cli.split import main as split_main

    lists = os.path.join(root, "lists")
    split_main(["--speech-root", sp_dir, "--noise-root", no_dir,
                "--out-dir", lists])
    if render_train:
        datagen_main([
            "--output-dir", os.path.join(root, "train_set"),
            "--speech-root", sp_dir, "--noise-root", no_dir,
            "--speech-list", os.path.join(lists, "speechs_train"),
            "--noise-list", os.path.join(lists, "noises_train"),
            "--mcse-settings", settings_path,
            "--clip-seconds", str(seconds),
            "--workers", str(workers), "--items", str(train_items),
        ])
    datagen_main([
        "--output-dir", os.path.join(root, "val"),
        "--speech-root", sp_dir, "--noise-root", no_dir,
        "--speech-list", os.path.join(lists, "speechs_val"),
        "--noise-list", os.path.join(lists, "noises_val"),
        "--mcse-settings", settings_path, "--clip-seconds", str(seconds),
        "--workers", str(workers), "--limit", str(val_items),
    ])
    with open(done, "w") as f:
        f.write("ok\n")
    return settings_path


def score_stage(cfg, params, val, output):
    from eabnet_tpu.eval import evaluate_dataset
    from eabnet_tpu.inference import Enhancer

    def items():
        for i in range(len(val)):
            noisy, clean = val[i]
            yield np.atleast_2d(noisy), np.asarray(clean).reshape(-1)

    if output == "noisy":
        acc, _ = evaluate_dataset(lambda n: n[0], items(), sr=cfg.stft.sr)
    else:
        acc, _ = evaluate_dataset(Enhancer(cfg, params, output=output),
                                  items(), sr=cfg.stft.sr)
    keys = ("si_sdr", "pesq", "nb_pesq", "stoi", "estoi", "seg_snr", "lsd")
    return {k: round(acc.mean_std(k)[0], 4) for k in keys}


def prune_checkpoints(ckpt_dir, keep_last=2, keep_every=10000):
    """Bound disk: keep the newest ``keep_last`` checkpoints plus every
    ``keep_every``-step milestone."""
    if not os.path.isdir(ckpt_dir):
        return
    ckpts = []
    for name in os.listdir(ckpt_dir):
        m = re.fullmatch(r"(\d+)\.ckpt", name)
        if m:
            ckpts.append((int(m.group(1)), os.path.join(ckpt_dir, name)))
    ckpts.sort()
    for it, path in ckpts[:-keep_last]:
        if keep_every and it % keep_every == 0:
            continue
        os.remove(path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/root/longrun")
    ap.add_argument("--max-steps", type=int, default=30000)
    ap.add_argument("--chunk", type=int, default=1000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--train-items", type=int, default=6000)
    ap.add_argument("--val-items", type=int, default=12)
    ap.add_argument("--corpus-speech", type=int, default=160)
    ap.add_argument("--corpus-noise", type=int, default=24)
    ap.add_argument("--seconds", type=float, default=6.0)
    ap.add_argument("--freeze-after", type=int, default=None,
                    help="freeze the EaBNet beamformer from this step on "
                    "and train only the GaGNet post-filter "
                    "(reference: EaBNet.py:150-155)")
    ap.add_argument("--steps-per-process", type=int, default=None,
                    help="exit with code 75 (EX_TEMPFAIL) after advancing "
                    "this many steps, so an outer loop re-execs a fresh "
                    "process that resumes from the latest checkpoint. "
                    "Works around the axon tunnel client leaking every "
                    "host<->device transfer host-side (~16 MB/train step "
                    "measured BOTH directions, .delete() doesn't help) — "
                    "an unbounded process OOMs a 128 GB host after ~8k "
                    "steps. See examples/train_composed_two_phase.sh")
    ap.add_argument("--lr", type=float, default=5e-4)
    ap.add_argument("--train-set", default="offline",
                    choices=["offline", "online"],
                    help="offline = pre-rendered pairs (train_wbh.sh "
                    "regime); online = per-item on-the-fly synthesis, "
                    "the reference's DEFAULT data mode "
                    "(train_zc.sh:27-41, dataset/mcse_dataset.py:52-260)")
    ap.add_argument("--device-mix", default="none",
                    choices=["none", "loader", "parts", "scene"],
                    help="online-mode synthesis offload "
                    "(DataConfig.device_mix): 'scene' ships scene "
                    "parameters only and mixes against the "
                    "device-resident corpus inside the train step")
    ap.add_argument("--bf-impl", default=None,
                    choices=["scan", "pallas"],
                    help="LSTM-BF head implementation (pallas = the "
                    "fused custom-VJP kernel, the measured single-chip "
                    "training envelope peak at batch 16 bf16)")
    ap.add_argument("--norm-type", default=None,
                    choices=["IN", "BN", "cLN"],
                    help="override the norm for BOTH nets; cLN trains the "
                    "causal-norm variant that the streaming engine can "
                    "run frame-by-frame (IN cannot stream by "
                    "construction, reference EaBNet.py:46-48)")
    ap.add_argument("--platform", default="default",
                    choices=["default", "cpu"],
                    help="cpu = force the CPU backend (dry-run/testing)")
    ap.add_argument("--tiny", action="store_true",
                    help="reduced model (wiring dry-runs)")
    args = ap.parse_args()

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from tools.e2e_demo import SETTINGS

    root = args.workdir
    os.makedirs(root, exist_ok=True)
    t0 = time.time()
    settings_path = stage_data(
        root, args.corpus_speech, args.corpus_noise, args.seconds,
        args.train_items, args.val_items, args.workers, SETTINGS,
        render_train=args.train_set == "offline",
    )
    print(f"[long_train] data staged in {time.time() - t0:.0f}s",
          flush=True)

    from eabnet_tpu.config import (
        ComposedConfig, DataConfig, EaBNetConfig, ExperimentConfig,
        GaGNetConfig, TrainConfig,
    )
    from eabnet_tpu.data import OfflineMcseDataset
    from eabnet_tpu.train.checkpoint import latest_checkpoint, \
        load_checkpoint
    from eabnet_tpu.train.step import create_train_state
    from eabnet_tpu.train.trainer import train

    def make_cfg(frozen: bool) -> ExperimentConfig:
        import dataclasses

        if args.tiny:
            eab = EaBNetConfig(M=9, c=16, embed_dim=16, cd1=16, p=2, q=1)
            gag = GaGNetConfig(c=12, cd1=12, p=1, q=1, dilas=(1, 2))
        else:
            eab, gag = EaBNetConfig(M=9), GaGNetConfig()
        if args.norm_type is not None:
            eab = dataclasses.replace(eab, norm_type=args.norm_type)
            gag = dataclasses.replace(gag, norm_type=args.norm_type)
        if args.bf_impl is not None:
            eab = dataclasses.replace(eab, bf_impl=args.bf_impl)
        if args.train_set == "online":
            lists = os.path.join(root, "lists")
            data = DataConfig(
                dataset="mcse", train_set="online",
                speech_root=os.path.join(root, "speech"),
                noise_root=os.path.join(root, "noise"),
                speech_list=os.path.join(lists, "speechs_train"),
                noise_list=os.path.join(lists, "noises_train"),
                device_mix=(False if args.device_mix == "none"
                            else args.device_mix),
                transfer_int16=True,
                mcse_settings=settings_path,
                val_set=os.path.join(root, "val"),
                clip_seconds=args.seconds, num_workers=args.workers,
            )
        else:
            data = DataConfig(
                dataset="mcse", train_set="offline",
                # offline mcse training reads paired clean/+noisy/ dirs
                # from speech_root (data/datasets.py:388)
                speech_root=os.path.join(root, "train_set"),
                transfer_int16=True,
                mcse_settings=settings_path,
                val_set=os.path.join(root, "val"),
                clip_seconds=args.seconds, num_workers=args.workers,
            )
        return ExperimentConfig(
            model=ComposedConfig(
                eabnet=eab,
                gagnet=gag,
                freeze_eabnet=frozen,
            ),
            data=data,
            train=TrainConfig(
                batch_size=args.batch, wav_len=args.seconds,
                total_epoch=10**9, log_every=50, lr=args.lr,
                valid_interval=1e18, saving_interval=1e18,
                checkpoint_dir=os.path.join(root, "ckpt"),
                exp_root=root, fixed_seed=True,
                compute_dtype=args.dtype,
            ),
        )

    val = OfflineMcseDataset(os.path.join(root, "val"))
    curves = os.path.join(root, "curves.jsonl")

    # constant noisy baseline row (step -1) once per run file
    if not os.path.exists(curves):
        base = score_stage(make_cfg(False), None, val, "noisy")
        with open(curves, "a") as f:
            f.write(json.dumps({"step": -1, "stage": "noisy", **base})
                    + "\n")
        print(f"[long_train] noisy baseline: {base}", flush=True)

    done = 0
    ck = latest_checkpoint(os.path.join(root, "ckpt"))
    if ck is not None:
        done = int(os.path.basename(ck).split(".")[0])
        print(f"[long_train] resuming at step {done}", flush=True)

    start = done
    while done < args.max_steps:
        if (args.steps_per_process is not None
                and done - start >= args.steps_per_process):
            print(f"[long_train] recycling process at step {done} "
                  f"(+{done - start} this process; transfer-leak "
                  f"mitigation)", flush=True)
            sys.exit(75)
        target = min(done + args.chunk, args.max_steps)
        frozen = args.freeze_after is not None and done >= args.freeze_after
        cfg = make_cfg(frozen)
        t1 = time.time()
        train(cfg, max_steps=target)
        dt = time.time() - t1
        done = target
        sps = args.chunk / max(dt, 1e-9)
        print(f"[long_train] step {done} chunk took {dt:.0f}s "
              f"({sps:.2f} it/s, frozen={frozen})", flush=True)

        ckpt = latest_checkpoint(cfg.train.checkpoint_dir)
        _, state = create_train_state(cfg, jax.random.key(0))
        state, _ = load_checkpoint(ckpt, state, cfg)
        for stage in ("esti0", "esti"):
            row = {"step": done, "stage": stage, "frozen": frozen,
                   "it_per_sec": round(sps, 3),
                   **score_stage(cfg, state.params, val, stage)}
            with open(curves, "a") as f:
                f.write(json.dumps(row) + "\n")
            print(f"[long_train] {row}", flush=True)
        prune_checkpoints(cfg.train.checkpoint_dir,
                          keep_every=10 * args.chunk)
    print("[long_train] done", flush=True)


if __name__ == "__main__":
    main()
