#!/usr/bin/env python
"""English G2P accuracy vs CMUdict ground truth (non-circular labels).

Companion to test_en_g2p.py whose sentence labels were authored
alongside the lexicon (circularity acknowledged in
docs/frontend_accuracy.md).  Here the ground truth is the reference's
carried cmudict-0.7b, sampled by tools/make_cmudict_eval.py into three
strata: ``lexicon`` (direct built-in entries), ``morph`` (regular
derived forms), ``oov`` (letter-to-sound fallback).  Protocol:
word-level ARPABET phone WER, min edit distance over CMUdict variant
pronunciations (standard multi-reference G2P scoring), corpus-level
per stratum.
"""
import argparse
import re
from collections import defaultdict
from pathlib import Path

from parakeet_tpu.frontend.arpabet import ARPABET, ARPABETWithStress
from parakeet_tpu.utils.error_rate import word_errors

DEFAULT_DATA = Path(__file__).parent / "data" / "en_g2p_cmudict_cases.txt"
STRATA = ("lexicon", "morph", "oov")


def corpus_wer(data_path: Path, stressed: bool, verbose: bool = False):
    frontend = ARPABETWithStress() if stressed else ARPABET()
    edits = defaultdict(float)
    lens = defaultdict(int)
    counts = defaultdict(int)
    for line in open(data_path, encoding="utf-8"):
        line = line.rstrip("\n")
        if not line or line.startswith("#"):
            continue
        stratum, word, variants = line.split("|")[:3]
        hyp = " ".join(frontend.phoneticize(word))
        best_e, best_n = None, None
        for ref in variants.split(";"):
            if not stressed:
                ref = re.sub(r"\d", "", ref)
            e, n = word_errors(ref, hyp)
            if n and (best_e is None or e / n < best_e / best_n):
                best_e, best_n = e, n
        if best_n is None:
            continue
        edits[stratum] += best_e
        lens[stratum] += best_n
        counts[stratum] += 1
        if verbose and best_e:
            print(f"  [{stratum}] {word}: hyp {hyp} | refs {variants}")
    return {s: (edits[s] / lens[s] if lens[s] else 0.0, counts[s])
            for s in STRATA}


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--data", type=Path, default=DEFAULT_DATA)
    parser.add_argument("--verbose", action="store_true")
    args = parser.parse_args()
    for stressed, name in ((False, "ARPABET (no stress)"),
                           (True, "ARPABETWithStress")):
        res = corpus_wer(args.data, stressed, args.verbose)
        parts = ", ".join(f"{s} {wer:.4f} (n={n})"
                          for s, (wer, n) in res.items())
        print(f"{name}: {parts}")


if __name__ == "__main__":
    main()
