#!/bin/bash
# Online-synthesis 9-mic training run (the reference's train_zc.sh recipe,
# TPU-native). Experiment dir management with continue/delete prompt.
set -e

if [ -z "$1" ]; then
    echo "usage: $0 <experiment_name>" >&2
    exit 1
fi
exp_root=data/experiments/eabnet/$1

if [ -d "$exp_root" ]; then
    read -p "continue training? (y/n): " response
    if [[ $response != "y" ]]; then
        read -p "$exp_root exists. delete it? (y/n): " response
        if [[ $response == "y" ]]; then
            rm -rf "$exp_root"
        else
            echo bye; exit 1
        fi
    fi
fi
mkdir -p "$exp_root"

python -m eabnet_tpu.cli.train \
  --set train.batch_size=8 \
  --set data.num_workers=32 \
  --set train.valid_interval=1.0 \
  --set train.saving_interval=0.25 \
  --set model.eabnet.M=9 \
  --set "train.exp_root=\"$exp_root\"" \
  --set "train.checkpoint_dir=\"$exp_root/checkpoints\"" \
  --set 'data.train_set="online"' \
  --set 'data.val_set="data/datasets/mcse_val_setting2"' \
  --set 'data.mcse_settings="v2"' \
  --set 'data.speech_root="data/datasets/datasets_fullband/clean_fullband/read_speech"' \
  --set 'data.noise_root="data/datasets/datasets_fullband/noise_fullband"' \
  --set 'data.speech_list="data/datasets/datasets_fullband/cleans_train"' \
  --set 'data.noise_list="data/datasets/datasets_fullband/noises_train"'
