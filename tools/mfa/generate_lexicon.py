#!/usr/bin/env python
"""Write a rule-generated pinyin -> phones lexicon for MFA training
(reference: examples/use_mfa/local/generate_lexicon.py:39-199, backed by
parakeet_tpu.frontend.generate_lexicon).

  python tools/mfa/generate_lexicon.py exp/simple --with-r
writes ``exp/simple.lexicon`` with one "syllable phone phone..." row per
pinyin syllable.
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))

from parakeet_tpu.frontend.generate_lexicon import generate_lexicon  # noqa


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("output", type=Path,
                        help="output path stem (suffix .lexicon is added)")
    parser.add_argument("--with-tone", action="store_true",
                        help="tone-numbered syllables and finals")
    parser.add_argument("--with-r", action="store_true",
                        help="include erhua (r-coloured) syllables")
    args = parser.parse_args()

    lex = generate_lexicon(with_tone=args.with_tone,
                           with_erhua=args.with_r)
    out = args.output.with_suffix(".lexicon")
    out.parent.mkdir(parents=True, exist_ok=True)
    with open(out, "wt", encoding="utf-8") as f:
        for syllable, phones in lex.items():
            f.write(f"{syllable} {phones}\n")
    print(f"wrote {len(lex)} entries to {out}")


if __name__ == "__main__":
    main()
