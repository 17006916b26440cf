#!/usr/bin/env python
"""Reorganize VCTK-0.92 for the Montreal Forced Aligner (reference:
examples/use_mfa/local/reorganize_vctk.py:14-121): keep only the mic2
takes (mic1 has low-frequency noise), skip speakers without text (p315)
or without mic2 (p280, p362), resample flac/wav to 16 kHz PCM, and copy
the per-speaker transcription .txt files to .lab.
"""
import argparse
import os
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import sys

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))

from parakeet_tpu.audio.codec import load_wav, save_wav  # noqa: E402

SKIP_SPEAKERS = {"log.txt", "p315", "p280", "p362"}


def _resample(src: Path, dst: Path, sr: int = 16000) -> None:
    wav, _ = load_wav(src, sr=sr)
    save_wav(dst, wav, sr)


def write_wav(root_dir: Path, output_dir: Path) -> None:
    wav_dir = root_dir / "wav48_silence_trimmed"
    jobs = []
    for spk in sorted(os.listdir(wav_dir)):
        if spk in SKIP_SPEAKERS:
            continue
        sub_dir = wav_dir / spk
        new_sub = output_dir / spk
        new_sub.mkdir(parents=True, exist_ok=True)
        for name in sorted(os.listdir(sub_dir)):
            if "mic2" not in name:
                continue
            utt = "_".join(name.split("_")[:2])
            jobs.append((sub_dir / name, new_sub / f"{utt}.wav"))
    with ThreadPoolExecutor() as pool:
        list(pool.map(lambda j: _resample(*j), jobs))


def write_label(root_dir: Path, output_dir: Path) -> None:
    txt_dir = root_dir / "txt"
    for spk in sorted(os.listdir(txt_dir)):
        if spk in SKIP_SPEAKERS:
            continue
        new_sub = output_dir / spk
        new_sub.mkdir(parents=True, exist_ok=True)
        for txt in sorted((txt_dir / spk).glob("*.txt")):
            (new_sub / (txt.stem + ".lab")).write_text(
                txt.read_text(encoding="utf-8").strip() + "\n",
                encoding="utf-8")


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--root-dir", type=Path, required=True,
                        help="path to VCTK-Corpus-0.92")
    parser.add_argument("--output-dir", type=Path, required=True)
    args = parser.parse_args()
    root, out = args.root_dir.expanduser(), args.output_dir.expanduser()
    out.mkdir(parents=True, exist_ok=True)
    write_wav(root, out)
    write_label(root, out)
    print(f"Done. MFA corpus at {out}")


if __name__ == "__main__":
    main()
