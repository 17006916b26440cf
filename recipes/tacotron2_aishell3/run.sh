#!/usr/bin/env bash
# Voice-cloning pipeline (reference: examples/tacotron2_aishell3/).
# Stages: 0 mel extraction, 1 GE2E embeddings, 2 transcript G2P,
# 3 conditioned training, 4 voice cloning.
set -euo pipefail

stage=${1:-0}
stop_stage=${2:-100}
wavroot=${WAVROOT:-data_aishell3/train/wav}
label=${LABEL:-data_aishell3/train/label_train-set.txt}
dump=${DUMP:-dump}
exp=${EXP:-exp/vc}
ge2e_ckpt=${GE2E_CKPT:?set GE2E_CKPT to a trained GE2E checkpoint}

if [ "$stage" -le 0 ] && [ "$stop_stage" -ge 0 ]; then
  python extract_mel.py --input "$wavroot" --output "$dump/mel"
fi

if [ "$stage" -le 1 ] && [ "$stop_stage" -ge 1 ]; then
  python ../ge2e/inference.py --checkpoint "$ge2e_ckpt" \
    --input "$dump/mel" --output "$dump/embed"
fi

if [ "$stage" -le 2 ] && [ "$stop_stage" -ge 2 ]; then
  python chinese_g2p.py --transcription "$label" --mel-root "$dump/mel" \
    --embed-root "$dump/embed" --output-dir "$dump"
  head -100 "$dump/metadata.jsonl" > "$dump/metadata_dev.jsonl"
  tail -n +101 "$dump/metadata.jsonl" > "$dump/metadata_train.jsonl"
fi

if [ "$stage" -le 3 ] && [ "$stop_stage" -ge 3 ]; then
  python train.py --config conf/default.yaml \
    --train-metadata "$dump/metadata_train.jsonl" \
    --dev-metadata "$dump/metadata_dev.jsonl" \
    --phones-dict "$dump/phone_id_map.txt" --output-dir "$exp"
fi

if [ "$stage" -le 4 ] && [ "$stop_stage" -ge 4 ]; then
  ckpt=$(ls -t "$exp"/checkpoints/*.npz | head -1)
  python voice_cloning.py --config conf/default.yaml --checkpoint "$ckpt" \
    --ge2e-checkpoint "$ge2e_ckpt" --ref-wav "${REF_WAV:?set REF_WAV}" \
    --phones-dict "$dump/phone_id_map.txt" \
    --text "${TEXT:-sentences_pinyin.txt}" --output-dir "$exp/cloned"
fi
