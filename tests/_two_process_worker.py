"""Worker for the two-process jax.distributed CPU test
(tests/test_two_process.py). Run as:

    python tests/_two_process_worker.py <coord_addr> <process_id> <out.json>
"""

import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    coord, pid, out_path = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    jax.distributed.initialize(coordinator_address=coord, num_processes=2,
                               process_id=pid)
    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

    import numpy as np

    from eabnet_tpu.data import BatchLoader, FakeDataset
    from eabnet_tpu.train.trainer import _all_processes_mean, _is_chief

    assert jax.process_count() == 2, jax.process_count()
    assert jax.process_index() == pid

    # per-process val-shard loaders (the trainer's exact wiring,
    # train/trainer.py:136-140) over a shared deterministic dataset
    ds = FakeDataset(6, mics=2, seconds=0.1, seed=123)
    loader = BatchLoader(
        ds, 1, shuffle=False, drop_last=False,
        shard_index=jax.process_index(), shard_count=jax.process_count(),
    )
    local = [float(np.mean(t)) for _, t, _ in loader.epoch(0)]

    # the global mean must combine both processes' disjoint shards
    got = _all_processes_mean(float(np.sum(local)), float(len(local)))

    # expected: same dataset iterated unsharded
    full = [float(np.mean(ds[i][1])) for i in range(len(ds))]
    with open(out_path, "w") as f:
        json.dump({
            "process_id": pid,
            "process_count": jax.process_count(),
            "is_chief": _is_chief(),
            "n_local_items": len(local),
            "global_mean": got,
            "expected_mean": float(np.mean(full)),
        }, f)


if __name__ == "__main__":
    main()
