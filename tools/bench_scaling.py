"""Data-parallel weak-scaling study over a device mesh.

Times the jitted SPMD train step at fixed PER-DEVICE batch while growing
the mesh (1, 2, 4, ... devices): flat per-device step time = ideal weak
scaling. Also reports XLA's per-device FLOP estimate so the compiled
work-per-device can be checked independently of wall clock.

On real multi-chip hardware this reports the true scaling curve. On this
image only a virtual CPU mesh exists (all "devices" share one physical
core), so wall-clock necessarily grows ~linearly with mesh size there —
the run still validates that the sharded program compiles, executes, and
keeps per-device FLOPs constant, which is what the virtual mesh CAN
certify (SURVEY.md §2.2 DP scaling story; gradient equivalence is pinned
separately in tests/test_train_multichip.py).

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/bench_scaling.py --platform cpu --per-device-batch 1
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--per-device-batch", type=int, default=1)
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--wav-seconds", type=float, default=1.0)
    ap.add_argument("--tiny", action="store_true", default=True)
    ap.add_argument("--full-model", dest="tiny", action="store_false")
    ap.add_argument("--platform", default="default",
                    choices=["default", "cpu"])
    args = ap.parse_args()

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")

    import jax.numpy as jnp

    from eabnet_tpu.config import (
        ComposedConfig, EaBNetConfig, ExperimentConfig, GaGNetConfig,
        TrainConfig,
    )
    from eabnet_tpu.parallel import data_sharding, make_mesh, replicate
    from eabnet_tpu.train import create_train_state, make_train_step

    devices = jax.devices()
    sizes = [s for s in (1, 2, 4, 8, 16, 32) if s <= len(devices)]
    print(f"platform={devices[0].platform} n_devices={len(devices)} "
          f"per_device_batch={args.per_device_batch}")

    rows = []
    for nd in sizes:
        b = args.per_device_batch * nd
        if args.tiny:
            model_cfg = ComposedConfig(
                eabnet=EaBNetConfig(c=8, M=3, embed_dim=8, cd1=8, p=2, q=1),
                gagnet=GaGNetConfig(c=8, cd1=8, p=1, q=1, dilas=(1, 2)),
            )
        else:
            model_cfg = ComposedConfig(eabnet=EaBNetConfig(M=9),
                                       gagnet=GaGNetConfig())
        cfg = ExperimentConfig(
            model=model_cfg,
            train=TrainConfig(batch_size=b, wav_len=args.wav_seconds,
                              compute_dtype=args.dtype),
        )
        mesh = make_mesh(("data",), devices[:nd])
        model, state = create_train_state(cfg, jax.random.key(0))
        state = jax.device_put(state, replicate(mesh))
        m = cfg.model.eabnet.M
        n = int(cfg.train.wav_len * cfg.stft.sr)
        rng = np.random.default_rng(0)
        noisy = jax.device_put(
            (rng.standard_normal((b, m, n)) * 0.05).astype(np.float32),
            data_sharding(mesh))
        target = jax.device_put(
            (rng.standard_normal((b, n)) * 0.05).astype(np.float32),
            data_sharding(mesh))
        step = make_train_step(cfg, model, donate=False)
        s, losses = step(state, noisy, target)
        float(np.asarray(losses["final"]))  # compile + settle

        ts = []
        for _ in range(5):
            cur = state
            t0 = time.perf_counter()
            for _ in range(args.k):
                cur, losses = step(cur, noisy, target)
            float(np.asarray(losses["final"]))
            ts.append((time.perf_counter() - t0) / args.k)
        per_step = float(np.min(ts))

        flops_dev = float("nan")
        try:
            ca = step.lower(state, noisy, target).compile().cost_analysis()
            ca = ca[0] if isinstance(ca, list) else ca
            # under SPMD, cost_analysis describes the per-device module
            # (verified: raw FLOPs stay constant at fixed per-device batch
            # as the mesh grows), so no division by mesh size
            flops_dev = float(ca.get("flops", float("nan")))
        except Exception:
            pass
        audio = b * cfg.train.wav_len / per_step
        rows.append((nd, b, per_step, flops_dev, audio))
        print(f"devices {nd:2d}  global_batch {b:3d}  "
              f"{per_step * 1e3:8.2f} ms/step  "
              f"{flops_dev / 1e9:8.2f} GFLOP/device  "
              f"{audio:8.1f} audio-sec/s")

    base = rows[0]
    print("\nweak-scaling ratios vs 1 device "
          "(time ratio ~1.0 = ideal on real chips; "
          "~n on a shared-core virtual mesh):")
    for nd, b, t, fd, _ in rows:
        print(f"devices {nd:2d}: time x{t / base[2]:.2f}, "
              f"per-device FLOPs x{fd / base[3]:.3f}")


if __name__ == "__main__":
    main()
