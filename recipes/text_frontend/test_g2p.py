#!/usr/bin/env python
"""G2P accuracy harness: score the Chinese frontend against labeled data.

Equivalent of the reference harness (reference:
examples/text_frontend/test_g2p.py:33-57, which scores frontend phones
against Baker corpus phone labels with WER).  Here the unit is the toned
pinyin syllable (same granularity: one syllable = one initial+final
pair) and the corpus-level WER is
``sum(edit distances) / sum(reference lengths)``.

Supported --data formats, auto-detected per line:
- ``sentence|py1 py2 ...``   (this repo's hand-labeled g2p_test_cases.txt)
- ``utt_id<TAB>sentence<TAB>py1 py2 ...``
Lines starting with ``#`` are comments.
"""
import argparse
from pathlib import Path

from parakeet_tpu.frontend.zh_frontend import Frontend
from parakeet_tpu.utils.error_rate import word_errors

DEFAULT_DATA = Path(__file__).parent / "data" / "g2p_test_cases.txt"


def parse_line(line: str):
    line = line.rstrip("\n")
    if not line or line.startswith("#"):
        return None
    if "|" in line:
        sent, ref = line.split("|")[:2]
        if sent.strip() and ref.strip():
            return sent.strip(), ref.strip()
    parts = [p for p in line.split("\t") if p]
    if len(parts) >= 3:
        return parts[1].strip(), parts[2].strip()
    return None


def corpus_wer(data_path: Path, max_lines: int = 0, verbose: bool = False):
    frontend = Frontend(strict=False)
    tot_edits, tot_len, n = 0.0, 0, 0
    for i, line in enumerate(open(data_path, encoding="utf-8")):
        if max_lines and i >= max_lines:
            break
        parsed = parse_line(line)
        if parsed is None:
            continue
        sentence, ref_pinyin = parsed
        hyp = frontend.get_syllables(sentence)
        edits, ref_len = word_errors(ref_pinyin, " ".join(hyp))
        if ref_len == 0:
            continue
        tot_edits += edits
        tot_len += ref_len
        n += 1
        if verbose and edits:
            print(f"  [{edits:.0f} edits] {sentence}\n"
                  f"    ref {ref_pinyin}\n    hyp {' '.join(hyp)}")
    if n == 0:
        raise SystemExit("no scorable lines found")
    return tot_edits / tot_len, n


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--data", type=Path, default=DEFAULT_DATA)
    parser.add_argument("--max-lines", type=int, default=0)
    parser.add_argument("--verbose", action="store_true")
    args = parser.parse_args()
    wer_val, n = corpus_wer(args.data, args.max_lines, args.verbose)
    print(f"sentences: {n}")
    print(f"corpus syllable WER: {wer_val:.4f}")


if __name__ == "__main__":
    main()
