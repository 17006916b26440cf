#!/usr/bin/env python
"""English G2P accuracy harness: score the ARPABET frontend against
labeled data.

Counterpart of test_g2p.py for the English pipeline (the reference has
no English accuracy harness — its English G2P is g2p_en itself; this
repo's self-contained fallback chain needs its accuracy measured).
Unit: ARPABET phone; corpus-level phone WER =
``sum(edit distances) / sum(reference lengths)``.

Scores both frontends from one stressed label file:
- ARPABETWithStress vs the labels as-is (stress digits count);
- ARPABET vs the labels with stress digits stripped.

Data format: ``sentence|PH1 PH2 ...`` per line (stressed, CMUdict
conventions; '#' comments).  Labels carry no punctuation; hypothesis
punctuation tokens are dropped before scoring.
"""
import argparse
import re
from pathlib import Path

from parakeet_tpu.frontend.arpabet import ARPABET, ARPABETWithStress
from parakeet_tpu.utils.error_rate import word_errors

DEFAULT_DATA = Path(__file__).parent / "data" / "en_g2p_test_cases.txt"
_PUNCT = {",", ".", "?", "!"}


def corpus_wer(data_path: Path, stressed: bool, verbose: bool = False):
    frontend = ARPABETWithStress() if stressed else ARPABET()
    tot_edits, tot_len, n = 0.0, 0, 0
    for line in open(data_path, encoding="utf-8"):
        line = line.rstrip("\n")
        if not line or line.startswith("#") or "|" not in line:
            continue
        sentence, ref = line.split("|")[:2]
        if not stressed:
            ref = re.sub(r"\d", "", ref)
        hyp = [p for p in frontend.phoneticize(sentence)
               if p not in _PUNCT]
        edits, ref_len = word_errors(ref, " ".join(hyp))
        if ref_len == 0:
            continue
        tot_edits += edits
        tot_len += ref_len
        n += 1
        if verbose and edits:
            print(f"  [{edits:.0f} edits] {sentence}\n"
                  f"    ref {ref}\n    hyp {' '.join(hyp)}")
    if n == 0:
        raise SystemExit("no scorable lines found")
    return tot_edits / tot_len, n


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--data", type=Path, default=DEFAULT_DATA)
    parser.add_argument("--verbose", action="store_true")
    args = parser.parse_args()
    for stressed, name in ((False, "ARPABET (no stress)"),
                           (True, "ARPABETWithStress")):
        wer_val, n = corpus_wer(args.data, stressed, args.verbose)
        print(f"{name}: sentences {n}, corpus phone WER {wer_val:.4f}")


if __name__ == "__main__":
    main()
