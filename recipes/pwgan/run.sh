#!/usr/bin/env bash
# Parallel WaveGAN recipe pipeline (reference:
# examples/GANVocoder/parallelwave_gan/baker/{run,preprocess}.sh).
# Stages: 0 preprocess, 1 stats+normalize, 2 train, 3 synthesize.
set -euo pipefail

stage=${1:-0}
stop_stage=${2:-100}
rootdir=${ROOTDIR:-data/wavs}
conf=${CONF:-conf/default.yaml}
dump=${DUMP:-dump}
exp=${EXP:-exp/default}
durfile=${DURFILE:-}   # optional MFA durations.txt enables --cut-sil

if [ "$stage" -le 0 ] && [ "$stop_stage" -ge 0 ]; then
  if [ -n "$durfile" ]; then
    python preprocess.py --rootdir "$rootdir" --dumpdir "$dump/raw" \
      --config "$conf" --dur-file "$durfile" --cut-sil
  else
    python preprocess.py --rootdir "$rootdir" --dumpdir "$dump/raw" \
      --config "$conf"
  fi
fi

if [ "$stage" -le 1 ] && [ "$stop_stage" -ge 1 ]; then
  # dev/test reuse the train stats (reference preprocess.sh stages 2-3)
  python normalize.py --metadata "$dump/raw/metadata_train.jsonl" \
    --dumpdir "$dump/train/norm" --stats "$dump/feats_stats.npy" \
    --compute-stats
  python normalize.py --metadata "$dump/raw/metadata_dev.jsonl" \
    --dumpdir "$dump/dev/norm" --stats "$dump/feats_stats.npy"
fi

if [ "$stage" -le 2 ] && [ "$stop_stage" -ge 2 ]; then
  python train.py --config "$conf" \
    --train-metadata "$dump/train/norm/metadata.jsonl" \
    --dev-metadata "$dump/dev/norm/metadata.jsonl" \
    --output-dir "$exp"
fi

if [ "$stage" -le 3 ] && [ "$stop_stage" -ge 3 ]; then
  ckpt=$(ls -t "$exp"/checkpoints/*.npz | head -1)
  python synthesize.py --config "$conf" --checkpoint "$ckpt" \
    --test-metadata "$dump/dev/norm/metadata.jsonl" \
    --output-dir "$exp/wavs"
fi
