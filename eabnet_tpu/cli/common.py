"""Shared CLI plumbing: one typed JSON config + dotted-key overrides.

Replaces the reference's ~60 argparse flags duplicated across five entry
points (SURVEY.md §5 config note) with `--config exp.json` plus
`--set train.lr=1e-4`-style overrides.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
from typing import Any, Dict, List

from eabnet_tpu.config import ExperimentConfig


def respect_jax_platforms_env() -> None:
    """Re-apply the JAX_PLATFORMS env var.

    This environment's site hooks force `jax_platforms` to a tunneled TPU
    regardless of JAX_PLATFORMS; restore the documented env behavior so
    `JAX_PLATFORMS=cpu python -m eabnet_tpu.cli...` works.
    """
    import os

    value = os.environ.get("JAX_PLATFORMS")
    if value:
        import jax

        try:
            jax.config.update("jax_platforms", value)
        except Exception:
            pass


def add_config_args(parser: argparse.ArgumentParser) -> None:
    parser.add_argument("--config", type=str, default=None,
                        help="experiment config JSON (defaults used if "
                        "omitted)")
    parser.add_argument(
        "--set", action="append", default=[], metavar="KEY=VALUE",
        help="dotted config override, e.g. --set train.lr=1e-4 "
        "--set model.eabnet.M=8 (repeatable)",
    )


def _parse_value(text: str) -> Any:
    try:
        return json.loads(text)
    except json.JSONDecodeError:
        return text


def _apply_overrides(d: Dict, overrides: List[str]) -> Dict:
    for item in overrides:
        key, _, value = item.partition("=")
        node = d
        parts = key.strip().split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = _parse_value(value)
    return d


def load_config(args: argparse.Namespace) -> ExperimentConfig:
    if args.config:
        cfg = ExperimentConfig.load(args.config)
    else:
        cfg = ExperimentConfig()
    if args.set:
        d = dataclasses.asdict(cfg)
        d = _apply_overrides(d, args.set)
        cfg = ExperimentConfig.from_dict(d)
    return cfg
