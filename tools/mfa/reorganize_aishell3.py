#!/usr/bin/env python
"""Reorganize AISHELL-3 for the Montreal Forced Aligner (reference:
examples/use_mfa/local/reorganize_aishell3.py:14-94): symlink the
per-speaker wav directories of the train/test splits and write one
``<utt>.lab`` per utterance from content.txt, as either pinyin
syllables or space-separated characters.
"""
import argparse
import os
from pathlib import Path


def link_wav(root_dir: Path, output_dir: Path) -> None:
    for sub_set in ("train", "test"):
        wav_dir = root_dir / sub_set / "wav"
        new_dir = output_dir / sub_set
        new_dir.mkdir(parents=True, exist_ok=True)
        for spk_dir in sorted(os.listdir(wav_dir)):
            dst = new_dir / spk_dir
            if not dst.exists():
                os.symlink(wav_dir / spk_dir, dst)


def write_lab(root_dir: Path, output_dir: Path, script_type: str) -> None:
    for sub_set in ("train", "test"):
        text_path = root_dir / sub_set / "content.txt"
        new_dir = output_dir / sub_set
        with open(text_path, encoding="utf-8") as f:
            for line in f:
                wav_id, content = line.strip().split("\t")
                spk_id = wav_id[:7]
                items = content.split()
                # content.txt interleaves characters and pinyin
                words, pinyins = items[0:-1:2], items[1::2]
                text = " ".join(words if script_type == "word" else pinyins)
                lab = new_dir / spk_id / (wav_id.split(".")[0] + ".lab")
                lab.write_text(text + "\n", encoding="utf-8")


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--root-dir", type=Path, required=True,
                        help="path to AISHELL-3")
    parser.add_argument("--output-dir", type=Path, required=True)
    parser.add_argument("--script-type", choices=("pinyin", "word"),
                        default="pinyin")
    args = parser.parse_args()
    root, out = args.root_dir.expanduser(), args.output_dir.expanduser()
    out.mkdir(parents=True, exist_ok=True)
    link_wav(root, out)
    write_lab(root, out, args.script_type)
    print(f"Done. MFA corpus at {out}")


if __name__ == "__main__":
    main()
