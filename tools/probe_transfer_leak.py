"""Measure per-transfer host RSS growth of the current JAX backend.

Round-3 finding: the tunneled axon TPU client leaks every host<->device
transfer host-side — ~payload-size RSS growth per device_put / implicit
jit-arg transfer / result fetch, immune to explicit ``jax.Array.delete``
— so an unbounded training process accretes ~16 MB/step and a 128 GB
host OOM-kills it after ~8k steps (measured; dmesg oom-kill at 130.8 GB
RSS). This probe quantifies the defect per arm so any environment can
re-measure in ~a minute; the mitigation is process recycling
(``tools/long_train.py --steps-per-process`` + the relaunch loop in
examples/train_composed_two_phase.sh).

    python tools/probe_transfer_leak.py [--platform cpu] [--iters 30]

Reference numbers (2026-08, axon tunnel vs CPU backend, 13.8 MB batch):
device_put 13.6 vs ~0.7 MB/iter; +delete 13.2; same-buffer reuse 13.2;
27 MB fetch 17.6 vs ~0.
"""

import argparse
import gc
import os


def rss_mb() -> float:
    with open(f"/proc/{os.getpid()}/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024.0
    return float("nan")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--platform", default="default",
                    choices=["default", "cpu"])
    args = ap.parse_args()

    import numpy as np

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    print("devices:", jax.devices())
    batch = np.random.default_rng(0).integers(
        -3000, 3000, size=(8, 9, 96000), dtype=np.int16)
    f = jax.jit(lambda x: jnp.sum(jnp.abs(x.astype(jnp.float32))))
    g = jax.jit(lambda x: x.astype(jnp.float32).reshape(-1))
    float(f(batch))
    np.asarray(g(batch))

    def run(name, fn, n=args.iters):
        gc.collect()
        g0 = rss_mb()
        for i in range(n):
            fn(i)
        gc.collect()
        g1 = rss_mb()
        print(f"{name}: {(g1 - g0) / n:+.2f} MB/iter "
              f"(rss {g0:.0f} -> {g1:.0f} MB)")

    print(f"payload: {batch.nbytes / 1e6:.1f} MB")

    def put_exec(i):
        x = jax.device_put(batch)
        float(f(x))

    def put_exec_delete(i):
        x = jax.device_put(batch)
        y = f(x)
        float(y)
        x.delete()
        y.delete()

    buf = batch.copy()

    def reuse(i):
        buf[0, 0, 0] = i
        float(f(buf))

    run("device_put + execute        ", put_exec)
    run("device_put + execute + del  ", put_exec_delete)
    run("same-host-buffer reuse      ", reuse)
    run("fetch 27 MB result          ", lambda i: np.asarray(g(batch)))


if __name__ == "__main__":
    main()
