#!/usr/bin/env python
"""CLI: MFA TextGrid alignments -> durations file for preprocess.py.

Equivalent of the reference tool (reference:
utils/gen_duration_from_textgrid.py:25): walks
``<inputdir>/<speaker>/*.TextGrid`` and writes ``utt|spk|phn dur ...``
lines whose per-utterance duration sum matches the mel frame count for
the given fs/n_shift.

Usage:
  python tools/gen_duration_from_textgrid.py \
      --inputdir aligned_textgrids/ --output durations.txt \
      --fs 24000 --n-shift 300
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from parakeet_tpu.data.textgrid import gen_duration_from_textgrid  # noqa


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--inputdir", type=Path, required=True)
    parser.add_argument("--output", type=Path, required=True)
    parser.add_argument("--fs", type=int, default=24000)
    parser.add_argument("--n-shift", type=int, default=300)
    args = parser.parse_args()
    n = gen_duration_from_textgrid(args.inputdir, args.output,
                                   sample_rate=args.fs,
                                   n_shift=args.n_shift)
    print(f"wrote {n} utterances to {args.output}")


if __name__ == "__main__":
    main()
