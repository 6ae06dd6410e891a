"""Corpus split tool — frozen train/val source lists.

The reference pins its benchmark by splitting speech/noise sources 20:1
with a seeded RNG and pre-rendering the val set while training stays online
(dataset/MCSE_dataset.ipynb cells 3/9-10). This CLI reproduces that
workflow: seeded split -> list files; render the frozen val set afterwards
with `eabnet_tpu.cli.datagen` on the val lists.
"""

from __future__ import annotations

import argparse
import os


def split(names, ratio: int, seed: int):
    import numpy as np

    rng = np.random.RandomState(seed)
    names = sorted(names)
    idx = rng.permutation(len(names))
    n_val = max(1, len(names) // (ratio + 1))
    val = [names[i] for i in sorted(idx[:n_val])]
    train = [names[i] for i in sorted(idx[n_val:])]
    return train, val


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="seeded train/val source split"
    )
    parser.add_argument("--speech-root", required=True)
    parser.add_argument("--noise-root", required=True)
    parser.add_argument("--out-dir", required=True)
    parser.add_argument("--ratio", type=int, default=20,
                        help="train:val ratio (default 20:1)")
    parser.add_argument("--seed", type=int, default=123,
                        help="split seed (reference uses RandomState(123))")
    args = parser.parse_args(argv)

    os.makedirs(args.out_dir, exist_ok=True)
    for kind, root in (("speech", args.speech_root),
                       ("noise", args.noise_root)):
        names = [n for n in os.listdir(root) if n.lower().endswith(".wav")]
        train, val = split(names, args.ratio, args.seed)
        for part, lst in (("train", train), ("val", val)):
            path = os.path.join(args.out_dir, f"{kind}s_{part}")
            with open(path, "w") as f:
                f.write("\n".join(lst))
            print(f"{path}: {len(lst)} files")


if __name__ == "__main__":
    main()
