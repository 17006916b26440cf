#!/usr/bin/env bash
# SpeedySpeech recipe pipeline (reference: examples/speedyspeech/baker/run.sh).
# Stages: 0 preprocess, 1 normalize, 2 train, 3 synthesize_e2e (+export),
# 4 deploy from serialized graphs.
set -euo pipefail

stage=${1:-0}
stop_stage=${2:-100}
rootdir=${ROOTDIR:-data/wavs}
durfile=${DURFILE:-data/durations.txt}
conf=${CONF:-conf/default.yaml}
dump=${DUMP:-dump}
exp=${EXP:-exp/default}

if [ "$stage" -le 0 ] && [ "$stop_stage" -ge 0 ]; then
  python preprocess.py --rootdir "$rootdir" --duration-file "$durfile" \
    --dumpdir "$dump" --config "$conf" --num-cpu 8
fi

if [ "$stage" -le 1 ] && [ "$stop_stage" -ge 1 ]; then
  python normalize.py --metadata "$dump/metadata_train.jsonl" \
    --dumpdir "$dump/norm/train" --stats-dir "$dump" --compute-stats
  python normalize.py --metadata "$dump/metadata_dev.jsonl" \
    --dumpdir "$dump/norm/dev" --stats-dir "$dump"
fi

if [ "$stage" -le 2 ] && [ "$stop_stage" -ge 2 ]; then
  python train.py --config "$conf" \
    --train-metadata "$dump/norm/train/metadata.jsonl" \
    --dev-metadata "$dump/norm/dev/metadata.jsonl" \
    --phones-dict "$dump/phone_id_map.txt" \
    --tones-dict "$dump/tone_id_map.txt" \
    --output-dir "$exp"
fi

if [ "$stage" -le 3 ] && [ "$stop_stage" -ge 3 ]; then
  ckpt=$(ls -t "$exp"/checkpoints/*.npz | head -1)
  python synthesize_e2e.py --config "$conf" --checkpoint "$ckpt" \
    --stat "$dump/feats_stats.npy" \
    --pwg-config "${PWG_CONF:-../pwgan/conf/default.yaml}" \
    --pwg-checkpoint "${PWG_CKPT:?set PWG_CKPT}" \
    --phones-dict "$dump/phone_id_map.txt" \
    --tones-dict "$dump/tone_id_map.txt" \
    --text "${TEXT:-sentences.txt}" --output-dir "$exp/wavs" \
    --export-dir "$exp/exported"
fi

if [ "$stage" -le 4 ] && [ "$stop_stage" -ge 4 ]; then
  python inference.py --export-dir "$exp/exported" \
    --phones-dict "$dump/phone_id_map.txt" \
    --tones-dict "$dump/tone_id_map.txt" \
    --text "${TEXT:-sentences.txt}" --output-dir "$exp/wavs_deployed"
fi
