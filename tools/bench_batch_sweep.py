"""Batch-size throughput sweep in ONE process (fills ROOFLINE.md).

The axon tunnel pays a full compile per fresh process (the persistent
cache does not engage for this backend), so a sweep run as N separate
``bench_train.py`` invocations costs N tunnel compiles. This tool builds
and compiles the train step for every batch size first, then interleaves
short timing rounds round-robin across the arms so every arm sees the
same tenant load; the min statistic estimates dedicated-chip time.

    python tools/bench_batch_sweep.py --batches 8,16,32,64
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="8,16,32,64")
    ap.add_argument("--arms", default=None,
                    help="per-arm specs 'B[:flag+flag...]' overriding "
                    "--batches and the global flags, e.g. "
                    "'16,16:pallas,16:pallas+encremat,32:bfremat' — flags: "
                    "bfremat, encremat, pallas. Mixed arms interleave in "
                    "ONE process, the fair A/B under chip time-sharing "
                    "(cross-process comparisons confound tenant load)")
    ap.add_argument("--k", type=int, default=8,
                    help="chained steps per timing round")
    ap.add_argument("--rounds", type=int, default=12)
    ap.add_argument("--compute-dtype", default="bfloat16")
    ap.add_argument("--platform", default="default",
                    choices=["default", "cpu"],
                    help="cpu = force the CPU backend (smoke-testing; the "
                    "site hook ignores the JAX_PLATFORMS env var)")
    ap.add_argument("--wav-seconds", type=float, default=None,
                    help="override utterance length (smoke-testing)")
    ap.add_argument("--tiny", action="store_true",
                    help="reduced model (wiring smoke-tests)")
    ap.add_argument("--bf-remat", action="store_true",
                    help="selective remat of the LSTM-BF scan body "
                    "(config.bf_remat) — recomputes the gate blocks in "
                    "the backward instead of storing them; targets the "
                    "batch-24 HBM ceiling ROOFLINE.md pins on this head")
    ap.add_argument("--enc-remat", action="store_true",
                    help="coarse remat of the whole U²Net encoder + "
                    "decoder (config.enc_remat) — recomputes their "
                    "internal full-resolution conv activations in the "
                    "backward; the binder past bf_remat (batch-32 OOM)")
    ap.add_argument("--bf-impl", default="scan",
                    choices=["scan", "pallas"],
                    help="beamforming-head implementation; the pallas "
                    "kernel's backward recomputes gates from (h, c) "
                    "residuals — a smaller residual footprint than the "
                    "scan path (kernels/lstm_bf.py)")
    args = ap.parse_args()

    def parse_arm(spec):
        parts = spec.split(":")
        b = int(parts[0])
        flags = set(parts[1].split("+")) if len(parts) > 1 else set()
        unknown = flags - {"bfremat", "encremat", "pallas"}
        if unknown:
            ap.error(f"unknown arm flags {sorted(unknown)} in {spec!r}")
        return dict(batch=b, label=spec,
                    bf_remat="bfremat" in flags,
                    enc_remat="encremat" in flags,
                    bf_impl="pallas" if "pallas" in flags else "scan")

    if args.arms:
        specs = [parse_arm(s) for s in args.arms.split(",")]
    else:
        specs = [dict(batch=int(b), label=b, bf_remat=args.bf_remat,
                      enc_remat=args.enc_remat, bf_impl=args.bf_impl)
                 for b in args.batches.split(",")]

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from eabnet_tpu.config import (ComposedConfig, EaBNetConfig,
                                   ExperimentConfig, GaGNetConfig,
                                   TrainConfig)
    from eabnet_tpu.train import create_train_state, make_train_step

    def fetch(x):
        return float(np.asarray(x))

    arms = {}
    rng = np.random.default_rng(0)
    for spec in specs:
        b, label = spec["batch"], spec["label"]
        tkw = dict(batch_size=b, compute_dtype=args.compute_dtype)
        if args.wav_seconds is not None:
            tkw["wav_len"] = args.wav_seconds
        ekw = dict(bf_remat=spec["bf_remat"], enc_remat=spec["enc_remat"],
                   bf_impl=spec["bf_impl"])
        gkw = dict(enc_remat=spec["enc_remat"])
        if args.tiny:
            model = ComposedConfig(
                eabnet=EaBNetConfig(M=9, c=16, embed_dim=16, cd1=16,
                                    p=2, q=1, **ekw),
                gagnet=GaGNetConfig(c=12, cd1=12, p=1, q=1, dilas=(1, 2),
                                    **gkw))
        else:
            model = ComposedConfig(eabnet=EaBNetConfig(M=9, **ekw),
                                   gagnet=GaGNetConfig(**gkw))
        cfg = ExperimentConfig(train=TrainConfig(**tkw), model=model)
        t0 = time.time()
        try:
            net, state = create_train_state(cfg, jax.random.key(0))
            step = make_train_step(cfg, net, donate=False)
            n = int(cfg.train.wav_len * cfg.stft.sr)
            m = cfg.model.eabnet.M
            noisy = jnp.asarray(
                (rng.standard_normal((b, m, n)) * 0.05).astype(np.float32))
            target = jnp.asarray(
                (rng.standard_normal((b, n)) * 0.05).astype(np.float32))
            _, losses = step(state, noisy, target)
            fetch(losses["final"])  # force compile + first run
        except Exception as e:  # e.g. batch exceeds single-chip HBM
            print(f"[sweep] arm {label} SKIPPED (does not compile/fit on "
                  f"one chip): {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
            continue
        flops = float("nan")
        try:
            ca = step.lower(state, noisy, target).compile().cost_analysis()
            ca = ca[0] if isinstance(ca, list) else ca
            flops = float(ca.get("flops", float("nan")))
        except Exception:
            pass
        arms[label] = dict(cfg=cfg, step=step, state=state, noisy=noisy,
                           target=target, flops=flops, times=[])
        print(f"[sweep] arm {label} compiled in {time.time() - t0:.0f}s "
              f"({flops / 1e9:.0f} GFLOP/step)", flush=True)

    triv = jax.jit(lambda x: x + 1.0)
    fetch(triv(jnp.ones(1))[0])
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        fetch(triv(jnp.ones(1))[0])
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))
    print(f"[sweep] tunnel rtt {rtt * 1000:.1f} ms", flush=True)

    for r in range(args.rounds):
        for spec in specs:
            label = spec["label"]
            if label not in arms:
                continue
            a = arms[label]
            cur = a["state"]
            t0 = time.perf_counter()
            for _ in range(args.k):
                cur, losses = a["step"](cur, a["noisy"], a["target"])
            fetch(losses["final"])
            a["times"].append(time.perf_counter() - t0)
        print(f"[sweep] round {r + 1}/{args.rounds}", flush=True)

    peak = 197e12 if args.compute_dtype == "bfloat16" else 98.5e12
    print(f"\n| arm | ms/step | audio-sec/s/chip | MFU |")
    print("|---|---|---|---|")
    for spec in specs:
        label, b = spec["label"], spec["batch"]
        if label not in arms:
            print(f"| {label} | does not fit on one chip | — | — |",
                  flush=True)
            continue
        a = arms[label]
        per = (float(np.min(a["times"])) - rtt) / args.k
        wav_len = a["cfg"].train.wav_len
        audio = b * wav_len / per
        mfu = a["flops"] / per / peak * 100.0
        print(f"| {label} | {per * 1000:.1f} | {audio:.0f} | {mfu:.1f}% |",
              flush=True)


if __name__ == "__main__":
    main()
