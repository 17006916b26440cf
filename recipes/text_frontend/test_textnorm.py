#!/usr/bin/env python
"""Text-normalization accuracy harness.

Equivalent of the reference harness (reference:
examples/text_frontend/test_textnorm.py): each line of --data is
``<utt_id><TAB><raw sentence><TAB><normalized reference>``; the
character error rate of TextNormalizer output against the reference is
reported with parakeet_tpu.utils.error_rate.
"""
import argparse
from pathlib import Path

from parakeet_tpu.frontend.zh_normalization.text_normlization import \
    TextNormalizer
from parakeet_tpu.utils.error_rate import cer


def parse_line(line: str):
    parts = [p for p in line.rstrip("\n").split("\t") if p]
    if len(parts) < 3:
        parts = [p for p in line.split("  ") if p.strip()]
    if len(parts) < 3:
        return None
    return parts[0].strip(), parts[1].strip(), parts[2].strip()


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--data", type=Path, required=True,
                        help="labeled file: utt_id\\traw\\tnormalized")
    parser.add_argument("--max-lines", type=int, default=0)
    args = parser.parse_args()

    tn = TextNormalizer()
    total_cer, n = 0.0, 0
    for i, line in enumerate(open(args.data, encoding="utf-8")):
        if args.max_lines and i >= args.max_lines:
            break
        parsed = parse_line(line)
        if parsed is None:
            continue
        utt_id, raw, ref = parsed
        hyp = "".join(tn.normalize(raw))
        ref = ref.replace(" ", "")
        hyp = hyp.replace(" ", "")
        if not ref:
            continue
        total_cer += cer(ref, hyp)
        n += 1
    if n == 0:
        raise SystemExit("no scorable lines found")
    print(f"sentences: {n}")
    print(f"avg CER: {total_cer / n:.4f}")


if __name__ == "__main__":
    main()
