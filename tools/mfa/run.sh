#!/usr/bin/env bash
# MFA alignment pipeline for the Baker corpus (reference:
# examples/use_mfa/run.sh): generate a lexicon, reorganize the corpus,
# check for OOVs, then train + align with the Montreal Forced Aligner
# (install MFA separately: https://montreal-forced-aligner.readthedocs.io).
set -e

EXP_DIR=${EXP_DIR:-exp}
BAKER_ROOT=${BAKER_ROOT:-~/datasets/BZNSYP}
LEXICON_NAME=simple

mkdir -p "$EXP_DIR"

if [ ! -f "$EXP_DIR/$LEXICON_NAME.lexicon" ]; then
    echo "generating lexicon..."
    python tools/mfa/generate_lexicon.py "$EXP_DIR/$LEXICON_NAME" --with-r
fi

if [ ! -d "$EXP_DIR/baker_corpus" ]; then
    echo "reorganizing baker corpus..."
    python tools/mfa/reorganize_baker.py --root-dir="$BAKER_ROOT" \
        --output-dir="$EXP_DIR/baker_corpus" --resample-audio
fi

echo "detecting oov..."
python tools/mfa/detect_oov.py "$EXP_DIR/baker_corpus" \
    "$EXP_DIR/$LEXICON_NAME.lexicon" --pattern '*.lab'

if [ ! -d "$EXP_DIR/baker_alignment" ]; then
    echo "Training MFA and aligning (requires mfa on PATH)..."
    mfa_train_and_align "$EXP_DIR/baker_corpus" \
        "$EXP_DIR/$LEXICON_NAME.lexicon" "$EXP_DIR/baker_alignment" \
        -o "$EXP_DIR/baker_model" --clean --verbose --temp_directory \
        "$EXP_DIR/.mfa_train_and_align"
fi

echo "done. TextGrids at $EXP_DIR/baker_alignment; next:"
echo "  python tools/gen_duration_from_textgrid.py --inputdir \\"
echo "      $EXP_DIR/baker_alignment --output durations.txt"
