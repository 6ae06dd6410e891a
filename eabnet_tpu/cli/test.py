"""Evaluation CLI: score a checkpoint on the validation set and write the
metric report (reference: test.py:155-212)."""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    from eabnet_tpu.cli.common import add_config_args, load_config

    parser = argparse.ArgumentParser(description="metric evaluation")
    add_config_args(parser)
    parser.add_argument("--ckpt", default=None,
                        help="checkpoint path (.ckpt or reference .pth); "
                        "default: newest in train.checkpoint_dir")
    parser.add_argument("--out-prefix", default=None,
                        help="report path prefix (default: next to ckpt)")
    parser.add_argument("--limit", type=int, default=None,
                        help="score only the first N utterances")
    parser.add_argument("--output", default="esti0",
                        choices=["esti0", "esti"],
                        help="stage to score: esti0 = bare EaBNet (what "
                        "the reference's test.py evaluates, lines "
                        "160-165), esti = composed with GaGNet postnet")
    args = parser.parse_args(argv)

    from eabnet_tpu.cli.common import respect_jax_platforms_env

    respect_jax_platforms_env()

    cfg = load_config(args)

    import jax
    import numpy as np

    from eabnet_tpu.data import make_dataset
    from eabnet_tpu.eval import evaluate_dataset, write_report
    from eabnet_tpu.inference import Enhancer
    from eabnet_tpu.train.checkpoint import latest_checkpoint, \
        load_checkpoint
    from eabnet_tpu.train.step import create_train_state

    ckpt = args.ckpt or latest_checkpoint(cfg.train.checkpoint_dir)
    assert ckpt, "no checkpoint found; pass --ckpt"
    _, state = create_train_state(cfg, jax.random.key(0))
    state, _ = load_checkpoint(ckpt, state, cfg)
    enhancer = Enhancer(cfg, state.params, output=args.output)

    _, val_ds = make_dataset(cfg.data, mics=cfg.model.eabnet.M)
    assert val_ds is not None, "config has no validation set"
    n = len(val_ds) if args.limit is None else min(args.limit, len(val_ds))

    def items():
        for i in range(n):
            noisy, clean = val_ds[i]
            yield np.atleast_2d(noisy), np.asarray(clean).reshape(-1)

    acc, rows = evaluate_dataset(enhancer, items(), sr=cfg.stft.sr)
    # stage goes into both the default file name and the report body so
    # historical score files remain comparable (esti0 = bare beamformer,
    # esti = composed postnet output)
    prefix = args.out_prefix or f"{os.path.splitext(ckpt)[0]}_{args.output}"
    path = write_report(acc, rows, prefix, extra={"stage": args.output})
    print(open(path).read())
    print(f"report: {path}")


if __name__ == "__main__":
    main()
