#!/usr/bin/env python
"""Report transcription tokens missing from an MFA lexicon (reference:
examples/use_mfa/local/detect_oov.py:14-48).  Run after reorganizing a
corpus to decide whether the lexicon needs regeneration.
"""
import argparse
from pathlib import Path


def detect_oov(corpus_dir: Path, lexicon_path: Path,
               pattern: str = "**/*.lab") -> int:
    lexicon = set()
    with open(lexicon_path, encoding="utf-8") as f:
        for line in f:
            if line.strip():
                lexicon.add(line.split(maxsplit=1)[0])
    n_oov = 0
    for fp in sorted(corpus_dir.glob(pattern)):
        for token in fp.read_text(encoding="utf-8").strip().split():
            if token not in lexicon:
                print(f"OOV: {fp.relative_to(corpus_dir)}: {token}")
                n_oov += 1
    return n_oov


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("corpus_dir", type=Path)
    parser.add_argument("lexicon_path", type=Path)
    parser.add_argument("--pattern", default="**/*.lab")
    args = parser.parse_args()
    n = detect_oov(args.corpus_dir, args.lexicon_path, args.pattern)
    print(f"{n} OOV token occurrences")


if __name__ == "__main__":
    main()
