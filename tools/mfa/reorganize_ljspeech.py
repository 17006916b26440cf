#!/usr/bin/env python
"""Reorganize LJSpeech-1.1 into the flat wav+.lab layout the Montreal
Forced Aligner expects (reference: examples/use_mfa/local/
reorganize_ljspeech.py:14-72): symlink the wav tree and write one
``<utt>.lab`` transcription (the raw-text column of metadata.csv) per
utterance.
"""
import argparse
import os
from pathlib import Path


def reorganize_ljspeech(root_dir: Path, output_dir: Path) -> None:
    wav_dir = root_dir / "wavs"
    for entry in sorted(os.listdir(wav_dir)):
        dst = output_dir / entry
        if not dst.exists():
            os.symlink(wav_dir / entry, dst)
    with open(root_dir / "metadata.csv", encoding="utf-8") as f:
        for line in f:
            fields = line.strip().split("|")
            utt, raw_text = fields[0], fields[-1]
            (output_dir / f"{utt}.lab").write_text(raw_text + "\n",
                                                   encoding="utf-8")


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--root-dir", type=Path, required=True,
                        help="path to LJSpeech-1.1")
    parser.add_argument("--output-dir", type=Path, required=True)
    args = parser.parse_args()
    out = args.output_dir.expanduser()
    out.mkdir(parents=True, exist_ok=True)
    reorganize_ljspeech(args.root_dir.expanduser(), out)
    print(f"Done. MFA corpus at {out}")


if __name__ == "__main__":
    main()
