#!/usr/bin/env bash
# Parallel WaveGAN recipe pipeline (reference:
# examples/parallelwave_gan/baker/run.sh).
# Stages: 0 preprocess, 1 train, 2 synthesize.
set -euo pipefail

stage=${1:-0}
stop_stage=${2:-100}
rootdir=${ROOTDIR:-data/wavs}
conf=${CONF:-conf/default.yaml}
dump=${DUMP:-dump}
exp=${EXP:-exp/default}

if [ "$stage" -le 0 ] && [ "$stop_stage" -ge 0 ]; then
  python preprocess.py --rootdir "$rootdir" --dumpdir "$dump" \
    --config "$conf"
fi

if [ "$stage" -le 1 ] && [ "$stop_stage" -ge 1 ]; then
  python train.py --config "$conf" \
    --train-metadata "$dump/metadata_train.jsonl" \
    --dev-metadata "$dump/metadata_dev.jsonl" \
    --output-dir "$exp"
fi

if [ "$stage" -le 2 ] && [ "$stop_stage" -ge 2 ]; then
  ckpt=$(ls -t "$exp"/checkpoints/*.npz | head -1)
  python synthesize.py --config "$conf" --checkpoint "$ckpt" \
    --test-metadata "$dump/metadata_dev.jsonl" --output-dir "$exp/wavs"
fi
