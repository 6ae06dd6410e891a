#!/bin/bash
# Offline-dataset 8-mic training run (the reference's train_wbh.sh recipe).
# On a multi-chip TPU slice the same command data-parallelizes over all
# local devices automatically; multi-host pods add --multihost.
set -e
exp_root=${1:-data/experiments/eabnet/offline8}
mkdir -p "$exp_root"

python -m eabnet_tpu.cli.train \
  --set train.batch_size=16 \
  --set data.num_workers=16 \
  --set model.eabnet.M=8 \
  --set train.saving_interval=0.25 \
  --set train.valid_interval=0.25 \
  --set "train.exp_root=\"$exp_root\"" \
  --set "train.checkpoint_dir=\"$exp_root/checkpoints\"" \
  --set 'data.train_set="offline"' \
  --set 'data.speech_root="data/datasets/mcse_train"' \
  --set 'data.val_set="data/datasets/mcse_val"' \
  --set train.validate_once_before_train=true
