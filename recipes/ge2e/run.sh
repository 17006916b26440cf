#!/usr/bin/env bash
# GE2E speaker-encoder pipeline (reference: examples/ge2e/).
# Stages: 0 preprocess (VAD + mel partials), 1 train, 2 export embeddings.
set -euo pipefail

stage=${1:-0}
stop_stage=${2:-100}
rootdir=${ROOTDIR:-data/speakers}
dump=${DUMP:-dump/ge2e_mels}
exp=${EXP:-exp/ge2e}

if [ "$stage" -le 0 ] && [ "$stop_stage" -ge 0 ]; then
  python preprocess.py --input "$rootdir" --output "$dump"
fi

if [ "$stage" -le 1 ] && [ "$stop_stage" -ge 1 ]; then
  python train.py --data-root "$dump" --output-dir "$exp"
fi

if [ "$stage" -le 2 ] && [ "$stop_stage" -ge 2 ]; then
  ckpt=$(ls -t "$exp"/checkpoints/*.npz | head -1)
  python inference.py --checkpoint "$ckpt" --input "$dump" \
    --output "${EMBED_OUT:-dump/ge2e_embeds}"
fi
