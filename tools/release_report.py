"""Generate the release eval report: noisy vs esti0 vs esti, with margins.

Scores a release artifact (or experiment dir) on one or more offline val
sets (paired clean/ + noisy/ dirs) at every stage — the committed evidence
for the composed-model claim (reference capability: EaBNet.py:127-155;
the reference's own test.py scores only the bare beamformer,
test.py:160-165). Writes a markdown report with mean ± 95 % CI for the
full metric battery and the esti-vs-esti0 margins.

    python tools/release_report.py --exp-root release/composed_9mic \
        --val release/val_set --val /root/longrun/val_large \
        --out release/REPORT.md
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

KEYS = ("si_sdr", "pesq", "nb_pesq", "stoi", "estoi", "seg_snr", "lsd")


def score(cfg, params, val_dir, output):
    from eabnet_tpu.data import OfflineMcseDataset
    from eabnet_tpu.eval import evaluate_dataset
    from eabnet_tpu.inference import Enhancer

    val = OfflineMcseDataset(val_dir)

    def items():
        for i in range(len(val)):
            noisy, clean = val[i]
            yield np.atleast_2d(noisy), np.asarray(clean).reshape(-1)

    fn = (lambda n: n[0]) if output == "noisy" else Enhancer(
        cfg, params, output=output)
    acc, _ = evaluate_dataset(fn, items(), sr=cfg.stft.sr)
    return {k: (acc.mean_std(k), acc.mean_ci(k)) for k in KEYS}, len(val)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--exp-root", required=True)
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--val", action="append", required=True,
                    help="offline val dir (repeatable)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--platform", default="cpu",
                    choices=["cpu", "default"],
                    help="'default' scores model forwards on the real "
                    "chip (metrics stay host-side) — the fast path on "
                    "CPU-starved hosts")
    args = ap.parse_args(argv)

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from eabnet_tpu.config import ExperimentConfig
    from eabnet_tpu.eval.pesq import pesq_backend
    from eabnet_tpu.train.checkpoint import (
        latest_checkpoint, load_checkpoint,
    )
    from eabnet_tpu.train.step import create_train_state

    cfg = ExperimentConfig.load(os.path.join(args.exp_root, "config.json"))
    ckpt = args.ckpt or latest_checkpoint(
        os.path.join(args.exp_root, "ckpt")
    ) or latest_checkpoint(args.exp_root)
    _, state = create_train_state(cfg, jax.random.key(0))
    state, _ = load_checkpoint(ckpt, state, cfg)

    lines = [
        "# Release eval report",
        "",
        f"Checkpoint: `{os.path.basename(ckpt)}` "
        f"(step {int(jax.device_get(state.step))}); "
        f"PESQ backend: {pesq_backend()}.",
        "Stages: `noisy` = unprocessed reference mic, `esti0` = bare "
        "EaBNet beamformer, `esti` = composed EaBNet->GaGNet "
        "(reference: EaBNet.py:127-155). mean ± 95 % CI.",
        "",
    ]
    for val_dir in args.val:
        rows = {}
        for stage in ("noisy", "esti0", "esti"):
            rows[stage], n = score(cfg, state.params, val_dir, stage)
            print(f"[report] {val_dir} {stage}: "
                  + " ".join(f"{k}={rows[stage][k][0][0]:.3f}"
                             for k in KEYS), flush=True)
        lines += [f"## {val_dir} ({n} items)", "",
                  "| stage | " + " | ".join(KEYS) + " |",
                  "|---|" + "---|" * len(KEYS)]
        for stage in ("noisy", "esti0", "esti"):
            cells = []
            for k in KEYS:
                (m, _), (_, ci) = rows[stage][k]
                cells.append(f"{m:.3f} ± {ci:.3f}")
            lines.append(f"| {stage} | " + " | ".join(cells) + " |")
        margins = {k: rows["esti"][k][0][0] - rows["esti0"][k][0][0]
                   for k in KEYS}
        lines += ["",
                  "esti − esti0 margins: "
                  + ", ".join(f"{k} {margins[k]:+.4f}" for k in KEYS),
                  ""]
    with open(args.out, "w") as f:
        f.write("\n".join(lines))
    print(f"[report] wrote {args.out}")


if __name__ == "__main__":
    main()
