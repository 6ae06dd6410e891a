"""On-chip cost of the scene-fused train step vs the plain wav step.

Separates the two candidate binders of online training throughput:
- CHIP: how much does fusing RIR reconstruction + room propagation into
  the train step cost vs feeding pre-mixed audio? (Both arms interleave
  in one process — the only fair A/B on the time-shared chip.)
- HOST: the loader's scene-parameter supply rate is measured separately
  by tools/bench_datapipe.py; end-to-end it/s of a real run then splits
  into min(loader supply, chip rate, tunnel).

    python tools/bench_scene_step.py [--batch 16] [--rounds 8] [--k 4]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--seconds", type=float, default=6.0)
    ap.add_argument("--k", type=int, default=4,
                    help="chained executions per timing round")
    ap.add_argument("--rounds", type=int, default=8)
    ap.add_argument("--bf-impl", default="pallas",
                    choices=["scan", "pallas"])
    ap.add_argument("--platform", default="default",
                    choices=["default", "cpu"])
    ap.add_argument("--tiny", action="store_true",
                    help="reduced model (tool smoke tests)")
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
    from eabnet_tpu.data.scene_mix import scene_static_dims
    from eabnet_tpu.train.step import create_train_state, make_train_step

    if args.tiny:
        eab = EaBNetConfig(M=9, c=16, embed_dim=16, cd1=16, p=2, q=1,
                           norm_type="cLN")
        gag = GaGNetConfig(c=12, cd1=12, p=1, q=1, dilas=(1, 2),
                           norm_type="cLN")
    else:
        eab = EaBNetConfig(M=9, norm_type="cLN", bf_impl=args.bf_impl)
        gag = GaGNetConfig(norm_type="cLN")
    cfg = ExperimentConfig(
        model=ComposedConfig(eabnet=eab, gagnet=gag),
        train=TrainConfig(batch_size=args.batch, wav_len=args.seconds,
                          compute_dtype="bfloat16"),
    )
    b, m = args.batch, eab.M
    n = int(args.seconds * 16000)
    opt = {
        "audio": {"fs": 16000, "rir_method": "hybrid"},
        "room": {"min_dim": [3, 3, 2.5], "max_dim": [10, 10, 3],
                 "rt60": [0.05, 0.7]},
        "noise": {"n": [1, 3]},
        "target": {"dist_to_mic_array": [1, 5]},
    }
    dims = scene_static_dims(opt, args.seconds)
    s, k_img, nb = dims["s_max"], dims["k_images"], dims["n_bins"]
    rng = np.random.default_rng(0)

    model, state = create_train_state(cfg, jax.random.key(0))

    # --- wav arm ---
    wav_step = make_train_step(cfg, model, donate=False)
    noisy = jnp.asarray((rng.standard_normal((b, m, n)) * 0.05
                         ).astype(np.float32))
    target = jnp.asarray((rng.standard_normal((b, n)) * 0.05
                          ).astype(np.float32))

    # --- scene arm (synthetic but correctly-shaped scene batch) ---
    scene_step = make_train_step(cfg, model, donate=False,
                                 batch_kind="scene", scene_dims=dims)
    corpus_sp = jax.device_put(
        (rng.standard_normal((32, n)) * 2000).astype(np.int16))
    corpus_no = jax.device_put(
        (rng.standard_normal((16, n)) * 2000).astype(np.int16))
    batch = {
        "sp_idx": rng.integers(0, 32, b).astype(np.int32),
        "sp_off": np.zeros(b, np.int32),
        "no_idx": rng.integers(0, 16, (b, s - 1)).astype(np.int32),
        "no_off": np.zeros((b, s - 1), np.int32),
        "gains": (rng.random((b, s)) * 0.1).astype(np.float32),
        "delays": rng.uniform(50, 3000, (b, s, m, k_img)).astype(
            np.float32),
        "amps": (rng.random((b, s, m, k_img)) * 0.01).astype(np.float32),
        "hist_amp": (rng.random((b, s, m, nb)) * 1e-3).astype(np.float32),
        "d_delay": rng.uniform(50, 200, b).astype(np.float32),
        "d_amp": np.full(b, 0.02, np.float32),
        "tail_seeds": rng.integers(0, 2**31, (b, s)).astype(np.uint32),
        "lengths": np.full(b, n, np.int32),
    }
    batch = jax.device_put(batch)

    def fetch(x):
        return float(np.asarray(x))

    def chain(step, *inputs):
        st = state
        for _ in range(args.k):
            st, losses = step(st, *inputs)
        return losses["final"]

    arms = {
        "wav": lambda: chain(wav_step, noisy, target),
        "scene": lambda: chain(scene_step, batch, corpus_sp, corpus_no),
    }
    for name, fn in arms.items():
        t0 = time.time()
        fetch(fn())
        print(f"# compiled {name} in {time.time() - t0:.0f}s", flush=True)

    triv = jax.jit(lambda v: v + 1.0)
    fetch(triv(jnp.ones(1))[0])
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        fetch(triv(jnp.ones(1))[0])
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))

    times = {k: [] for k in arms}
    for _ in range(args.rounds):
        for name, fn in arms.items():
            t0 = time.perf_counter()
            fetch(fn())
            times[name].append((time.perf_counter() - t0 - rtt) / args.k)
    res = {}
    for name in arms:
        ms = float(np.min(times[name])) * 1e3
        res[name] = ms
        ips = args.batch / (ms / 1e3)
        print(f"{name:6s}: {ms:7.1f} ms/step  ({ips:6.1f} items/s, "
              f"{ips * args.seconds:6.0f} audio-sec/s)")
    print(f"in-step synthesis overhead: "
          f"{res['scene'] - res['wav']:+.1f} ms "
          f"({(res['scene'] / res['wav'] - 1) * 100:+.1f}%)")


if __name__ == "__main__":
    main()
