#!/usr/bin/env python
"""G2P accuracy harness: score the Chinese frontend against labeled data.

Equivalent of the reference harness (reference:
examples/text_frontend/test_g2p.py:33-57): each line of --data is
``<utt_id><TAB or two spaces><hanzi sentence><TAB><reference pinyin>``;
the frontend phoneticizes the sentence and the word error rate of the
produced phone string against the reference phones (via the same
lexicon) is reported with parakeet_tpu.utils.error_rate.
"""
import argparse
from pathlib import Path

from parakeet_tpu.frontend.generate_lexicon import generate_lexicon
from parakeet_tpu.frontend.zh_frontend import Frontend
from parakeet_tpu.utils.error_rate import wer


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
                        help="labeled file: utt_id\\tsentence\\tpinyin")
    parser.add_argument("--max-lines", type=int, default=0)
    args = parser.parse_args()

    frontend = Frontend()
    lexicon = generate_lexicon(with_tone=True, with_erhua=True)

    total_wer, n = 0.0, 0
    for i, line in enumerate(open(args.data, encoding="utf-8")):
        if args.max_lines and i >= args.max_lines:
            break
        parsed = parse_line(line)
        if parsed is None:
            continue
        utt_id, sentence, ref_pinyin = parsed
        hyp = [p for p in frontend.get_phonemes(sentence)[0] if p != "sp"]
        ref = []
        for syll in ref_pinyin.split():
            ref.extend(lexicon.get(syll, syll).split())
        if not ref:
            continue
        total_wer += wer(" ".join(ref), " ".join(hyp))
        n += 1
    if n == 0:
        raise SystemExit("no scorable lines found")
    print(f"sentences: {n}")
    print(f"avg WER: {total_wer / n:.4f}")


if __name__ == "__main__":
    main()
