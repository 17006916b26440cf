#!/usr/bin/env bash
# tacotron2 recipe pipeline (reference: examples/tacotron2/).
# Stages: 0 preprocess+normalize (shared fastspeech2 stages; durations
# are unused by the model), 1 train, 2 synthesize.
set -euo pipefail

stage=${1:-0}
stop_stage=${2:-100}
rootdir=${ROOTDIR:-data/wavs}
durfile=${DURFILE:-data/durations.txt}
conf=${CONF:-conf/default.yaml}
dump=${DUMP:-dump}
exp=${EXP:-exp/default}

if [ "$stage" -le 0 ] && [ "$stop_stage" -ge 0 ]; then
  python ../fastspeech2/preprocess.py --rootdir "$rootdir" \
    --duration-file "$durfile" --dumpdir "$dump" --config "$conf"
  python ../fastspeech2/normalize.py --metadata "$dump/metadata_train.jsonl" \
    --dumpdir "$dump/norm/train" --phones-dict "$dump/phone_id_map.txt" \
    --stats-dir "$dump" --compute-stats
  python ../fastspeech2/normalize.py --metadata "$dump/metadata_dev.jsonl" \
    --dumpdir "$dump/norm/dev" --phones-dict "$dump/phone_id_map.txt" \
    --stats-dir "$dump"
fi

if [ "$stage" -le 1 ] && [ "$stop_stage" -ge 1 ]; then
  python train.py --config "$conf" \
    --train-metadata "$dump/norm/train/metadata.jsonl" \
    --dev-metadata "$dump/norm/dev/metadata.jsonl" \
    --phones-dict "$dump/phone_id_map.txt" \
    --output-dir "$exp"
fi

if [ "$stage" -le 2 ] && [ "$stop_stage" -ge 2 ]; then
  ckpt=$(ls -t "$exp"/checkpoints/*.npz | head -1)
  python synthesize.py --config "$conf" --checkpoint "$ckpt" \
    --stat "$dump/speech_stats.npy" \
    --test-metadata "$dump/norm/dev/metadata.jsonl" \
    --phones-dict "$dump/phone_id_map.txt" \
    --output-dir "$exp/wavs"
fi
