"""Export a trained run as a compact release artifact.

Takes an experiment dir (config.json + full `<iter>.ckpt` training
checkpoints) and writes `<out>/config.json` + `<out>/<iter>.params` — the
params-only format (train/checkpoint.py:save_params), one third the size
of a training checkpoint (no Adam moments). The artifact dir is a valid
``--exp-root`` for every surface (cli.enhance, cli.test, cli.stream,
inference.load_enhancer); resuming training from it reinitializes the
optimizer, the same degradation the reference applies to optimizer-less
`.pth` files (reference: train_distributed.py:48-57).

    python tools/export_params.py --exp-root /root/longrun --out release/
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--exp-root", required=True,
                    help="experiment dir with config.json + checkpoints")
    ap.add_argument("--ckpt", default=None,
                    help="explicit checkpoint (default: latest under "
                    "<exp-root>/ckpt or <exp-root>)")
    ap.add_argument("--out", required=True, help="release dir to write")
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")

    from eabnet_tpu.config import ExperimentConfig
    from eabnet_tpu.train.checkpoint import (
        latest_checkpoint, load_checkpoint, save_params,
    )
    from eabnet_tpu.train.step import create_train_state

    cfg = ExperimentConfig.load(os.path.join(args.exp_root, "config.json"))
    ckpt = args.ckpt or latest_checkpoint(
        os.path.join(args.exp_root, "ckpt")
    ) or latest_checkpoint(args.exp_root)
    if ckpt is None:
        raise FileNotFoundError(f"no checkpoint under {args.exp_root}")
    _, state = create_train_state(cfg, jax.random.key(0))
    state, _ = load_checkpoint(ckpt, state, cfg)

    os.makedirs(args.out, exist_ok=True)
    # point the released config's checkpoint_dir at the artifact itself so
    # load_enhancer(exp_root=<out>) finds the .params file
    import dataclasses

    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, checkpoint_dir=".",
                                       exp_root="."))
    cfg.save(os.path.join(args.out, "config.json"))
    path = save_params(state.params, args.out,
                       int(jax.device_get(state.step)))
    size = os.path.getsize(path) / 1e6
    print(f"[export] {ckpt} -> {path} ({size:.1f} MB)")


if __name__ == "__main__":
    main()
