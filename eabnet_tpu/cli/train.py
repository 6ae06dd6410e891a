"""Training CLI: `python -m eabnet_tpu.cli.train --config exp.json`
(the reference's train_distributed.py entry point, TPU-native)."""

from __future__ import annotations

import argparse


def main(argv=None):
    from eabnet_tpu.cli.common import add_config_args, load_config

    parser = argparse.ArgumentParser(description="train EaBNet+GaGNet on TPU")
    add_config_args(parser)
    parser.add_argument("--max-steps", type=int, default=None,
                        help="stop after N optimizer steps (smoke runs)")
    parser.add_argument("--multihost", action="store_true",
                        help="call jax.distributed.initialize() first")
    args = parser.parse_args(argv)

    from eabnet_tpu.cli.common import respect_jax_platforms_env

    respect_jax_platforms_env()

    import jax

    if args.multihost:
        jax.distributed.initialize()

    cfg = load_config(args)
    from eabnet_tpu.train.trainer import train

    train(cfg, max_steps=args.max_steps)


if __name__ == "__main__":
    main()
