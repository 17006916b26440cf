#!/usr/bin/env python
"""Text-normalization accuracy harness.

Equivalent of the reference harness (reference:
examples/text_frontend/test_textnorm.py:31-51): score TextNormalizer
output against labeled data with corpus-level CER
(sum of edit distances / sum of reference lengths, English letters
deleted and whitespace ignored — the reference's ``del_en_add_space``
convention).

Supported --data formats, auto-detected per line:
- ``raw|normalized``            (the reference's textnorm_test_cases.txt)
- ``utt_id<TAB>raw<TAB>normalized``
"""
import argparse
import re
from pathlib import Path

from parakeet_tpu.frontend.zh_normalization.text_normlization import \
    TextNormalizer
from parakeet_tpu.utils.error_rate import char_errors

DEFAULT_DATA = Path(__file__).parent / "data" / "textnorm_test_cases.txt"


def parse_line(line: str):
    line = line.rstrip("\n")
    if "|" in line:
        parts = line.split("|")
        if len(parts) >= 2 and parts[0].strip() and parts[1].strip():
            return parts[0].strip(), parts[1].strip()
    parts = [p for p in line.split("\t") if p]
    if len(parts) >= 3:
        return parts[1].strip(), parts[2].strip()
    return None


def _strippable(text: str) -> str:
    # delete English letters + whitespace before scoring (reference
    # test_textnorm.py:24-29)
    return re.sub(r"[a-zA-Z\s]", "", text)


def corpus_cer(data_path: Path, max_lines: int = 0, verbose: bool = False):
    tn = TextNormalizer()
    tot_edits, tot_len, n = 0.0, 0, 0
    for i, line in enumerate(open(data_path, encoding="utf-8")):
        if max_lines and i >= max_lines:
            break
        parsed = parse_line(line)
        if parsed is None:
            continue
        raw, ref = parsed
        hyp = "".join(tn.normalize(raw))
        ref, hyp = _strippable(ref), _strippable(hyp)
        if not ref:
            continue
        edits, ref_len = char_errors(ref, hyp)
        tot_edits += edits
        tot_len += ref_len
        n += 1
        if verbose and edits:
            print(f"  [{edits:.0f} edits] {raw!r}\n    ref {ref}\n    hyp {hyp}")
    if n == 0:
        raise SystemExit("no scorable lines found")
    return tot_edits / tot_len, n


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--data", type=Path, default=DEFAULT_DATA,
                        help="labeled file (raw|normalized or "
                             "utt_id\\traw\\tnormalized)")
    parser.add_argument("--max-lines", type=int, default=0)
    parser.add_argument("--verbose", action="store_true")
    args = parser.parse_args()
    cer_val, n = corpus_cer(args.data, args.max_lines, args.verbose)
    print(f"sentences: {n}")
    print(f"corpus CER: {cer_val:.4f}")


if __name__ == "__main__":
    main()
