#!/usr/bin/env python
"""English text-normalization accuracy harness.

Counterpart of test_textnorm.py (zh) for the English normalizer
(frontend/normalizer: numbers, money, ordinals, years, abbreviations).
The reference relies on ``inflect`` for this expansion; the
self-contained reimplementation here needs its accuracy measured.
Metric: corpus word-level WER =
``sum(edit distances) / sum(reference word counts)`` over
``raw|normalized`` labeled lines ('#' comments).
"""
import argparse
import re
from pathlib import Path

from parakeet_tpu.frontend.normalizer import normalize
from parakeet_tpu.utils.error_rate import word_errors

DEFAULT_DATA = Path(__file__).parent / "data" / "en_textnorm_test_cases.txt"


def corpus_wer(data_path: Path, verbose: bool = False):
    tot_edits, tot_len, n = 0.0, 0, 0
    for line in open(data_path, encoding="utf-8"):
        line = line.rstrip("\n")
        if not line or line.startswith("#") or "|" not in line:
            continue
        raw, ref = line.split("|")[:2]
        # normalize() keeps sentence punctuation for the frontends'
        # prosody tokens; labels carry the spoken words only
        hyp = re.sub(r"[.,?!]", " ", normalize(raw))
        hyp = " ".join(hyp.split())
        edits, ref_len = word_errors(ref, hyp)
        if ref_len == 0:
            continue
        tot_edits += edits
        tot_len += ref_len
        n += 1
        if verbose and edits:
            print(f"  [{edits:.0f} edits] {raw}\n"
                  f"    ref {ref}\n    hyp {hyp}")
    if n == 0:
        raise SystemExit("no scorable lines found")
    return tot_edits / tot_len, n


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--data", type=Path, default=DEFAULT_DATA)
    parser.add_argument("--verbose", action="store_true")
    args = parser.parse_args()
    wer_val, n = corpus_wer(args.data, args.verbose)
    print(f"sentences: {n}")
    print(f"corpus word WER: {wer_val:.4f}")


if __name__ == "__main__":
    main()
