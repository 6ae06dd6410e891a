#!/bin/bash
# Two-phase composed-model recipe (the reference's freeze_eabnet option,
# EaBNet.py:150-155 + train_distributed.py:221-230): train the full
# EaBNet+GaGNet chain jointly to a plateau, then freeze the beamformer
# and train only the post-filter. Frozen params never move — gradients
# AND Adam updates are masked (train/step.py), matching torch's
# requires_grad=False semantics.
#
# This drives tools/long_train.py, which owns the whole loop end-to-end:
# stage a speech corpus, render an offline train set + frozen val set,
# train in chunks (every chunk boundary exercises checkpoint auto-resume
# and scores BOTH stages — esti0 = bare beamformer, esti = post-filtered
# — appending one JSON line per stage to <workdir>/curves.jsonl).
# Everything is resumable: re-running after a kill or reboot picks up at
# the latest checkpoint. Summarize the curves at any time with
#   python tools/curves_report.py <workdir>/curves.jsonl
#
# Measured round-3 run on one TPU v5e chip: CURVES_r3.jsonl at the repo
# root (final table in NOTES_r3.md).
set -e

workdir=${1:-/root/longrun}

# --steps-per-process recycles the python process every 4000 steps (exit
# code 75 -> relaunch; auto-resume picks up at the latest checkpoint).
# This bounds host RSS on backends whose transfer client leaks every
# host<->device batch (measured ~16 MB/step on the tunneled axon
# backend, both directions, immune to explicit .delete()) at the cost of
# one recompile per recycle.
while :; do
    python tools/long_train.py \
      --workdir "$workdir" \
      --max-steps 40000 \
      --chunk 2000 \
      --freeze-after 18000 \
      --batch 8 \
      --workers 2 \
      --train-items 4000 \
      --val-items 12 \
      --seconds 6 \
      --steps-per-process 4000 && ec=0 || ec=$?
    [ $ec -eq 75 ] || exit $ec
done
