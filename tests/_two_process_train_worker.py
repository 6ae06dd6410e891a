"""Worker for the two-process distributed TRAIN-step test
(tests/test_two_process.py). Runs a jitted tiny-config composed train
step over a global 2-device mesh where each process contributes one CPU
device — the gradient all-reduce crosses the process boundary
(reference capability: DDP gradient hooks, train_distributed.py:198).

Run as:
    python tests/_two_process_train_worker.py <coord> <pid> <out.npz>
With pid == "single", runs the same program single-process over 2
virtual CPU devices instead (the bit-match reference).
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

N_STEPS = 3
BATCH = 2
SECONDS = 0.5


def build(tmp):
    from eabnet_tpu.config import (
        ComposedConfig, DataConfig, EaBNetConfig, ExperimentConfig,
        GaGNetConfig, TrainConfig,
    )

    model_cfg = ComposedConfig(
        eabnet=EaBNetConfig(M=3, c=8, embed_dim=8, cd1=8, p=2, q=1),
        gagnet=GaGNetConfig(c=8, cd1=8, p=1, q=1, dilas=(1, 2)),
    )
    return ExperimentConfig(
        model=model_cfg,
        data=DataConfig(dataset="fake", clip_seconds=SECONDS,
                        num_workers=0),
        train=TrainConfig(batch_size=BATCH, wav_len=SECONDS,
                          total_epoch=1, lr=5e-4, grad_clip=1.0,
                          compute_dtype="float32",
                          checkpoint_dir=tmp, exp_root=tmp),
    )


def global_batches(seed=11):
    import numpy as np

    rng = np.random.default_rng(seed)
    n = int(SECONDS * 16000)
    out = []
    for _ in range(N_STEPS):
        clean = (rng.normal(size=(BATCH, n)) * 0.05).astype(np.float32)
        noisy = clean[:, None, :] + (
            rng.normal(size=(BATCH, 3, n)) * 0.03
        ).astype(np.float32)
        out.append((noisy, clean))
    return out


def main():
    coord, pid, out_path = sys.argv[1], sys.argv[2], sys.argv[3]
    single = pid == "single"
    if not single:
        jax.distributed.initialize(coordinator_address=coord,
                                   num_processes=2, process_id=int(pid))
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    import numpy as np

    from eabnet_tpu.parallel import data_sharding, make_mesh, replicate
    from eabnet_tpu.train.step import create_train_state, make_train_step

    assert len(jax.devices()) == 2, jax.devices()
    cfg = build(os.path.dirname(out_path))
    mesh = make_mesh(("data",), jax.devices())
    model, state = create_train_state(cfg, jax.random.key(0))
    state = jax.device_put(state, replicate(mesh))
    sharding = data_sharding(mesh)
    step = make_train_step(cfg, model, donate=False)

    losses = []
    for noisy, clean in global_batches():
        if single:
            gn = jax.device_put(noisy, sharding)
            gc = jax.device_put(clean, sharding)
        else:
            # each process feeds only the rows its device owns; the
            # global array spans both processes
            gn = jax.make_array_from_process_local_data(
                sharding, noisy[jax.process_index()::2], noisy.shape
            )
            gc = jax.make_array_from_process_local_data(
                sharding, clean[jax.process_index()::2], clean.shape
            )
        state, l = step(state, gn, gc)
        losses.append(float(l["final"]))

    # replicated params: the addressable shard IS the full value
    flat = {}

    def flatten(tree, path):
        if isinstance(tree, dict):
            for k in sorted(tree):
                flatten(tree[k], path + (k,))
        else:
            flat["/".join(path)] = np.asarray(jax.device_get(tree))

    flatten(jax.device_get(state.params), ())
    np.savez(out_path, __losses__=np.asarray(losses), **flat)


if __name__ == "__main__":
    main()
