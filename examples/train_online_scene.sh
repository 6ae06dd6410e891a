#!/bin/bash
# Round-5 flagship recipe: the reference's DEFAULT data mode — online
# per-item synthesis (train_zc.sh:27-41, dataset/mcse_dataset.py:52-260)
# — at the measured single-chip production config (pallas LSTM-BF head,
# per-device batch 16, bf16), with the synthesis device-offloaded in
# 'scene' mode: host workers ship scene parameters only and the jitted
# train step reconstructs hybrid RIRs against the device-resident corpus
# (eabnet_tpu/data/scene_mix.py).
#
# Two-phase composed recipe as in round 4 (joint to a plateau, then
# freeze the beamformer and train the GaGNet post-filter alone). Batch 16
# sees 2x the items per step of the round-4 batch-8 run, so 24k steps
# match round 4's 48k-step item count.
#
# The outer loop re-execs on exit 75 (process recycling bounds the axon
# tunnel client's host-side transfer leak; scene mode ships ~2.6 MB/step
# so the recycle interval can be much longer than round 4's).
set -e

workdir=${1:-/root/longrun5}
max_steps=${2:-24000}

while :; do
    python tools/long_train.py \
      --workdir "$workdir" \
      --train-set online \
      --device-mix scene \
      --bf-impl pallas \
      --norm-type cLN \
      --dtype bfloat16 \
      --max-steps "$max_steps" \
      --chunk 3000 \
      --freeze-after 11000 \
      --batch 16 \
      --workers 3 \
      --corpus-speech 160 \
      --corpus-noise 24 \
      --val-items 12 \
      --seconds 6 \
      --steps-per-process 3000 && ec=0 || ec=$?
    [ $ec -eq 75 ] || exit $ec
done
