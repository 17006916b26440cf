#!/usr/bin/env python
"""GE2E preprocessing: speaker wav trees -> per-speaker mel partials.

Equivalent of the reference pipeline (reference:
examples/ge2e/audio_processor.py:110-173 + preprocess.py): resample,
loudness-normalize, voice-activity trim, then write one (T, n_mels)
log-mel .npy per utterance under <output>/<speaker>/.

The reference trims silence with webrtcvad (a C extension); this uses a
moving-average energy gate with the same window/hop geometry — pure
numpy, no native dependency, equivalent behavior on clean corpora.

Usage:
  python preprocess.py --input datasets/LibriSpeech/train-clean-100 \
      --output dump/ge2e_mels --pattern "*.flac|*.wav"
  python preprocess.py --dataset librispeech_other \
      --datasets-root ~/datasets --output dump/ge2e_mels

``--dataset`` selects a corpus layout adapter (speaker-directory
discovery, glob pattern, "dataset_speaker" naming, VoxCeleb1's
anglophone filter) mirroring the reference dataset processors
(reference: examples/ge2e/dataset_processors.py:106-175).
"""
import argparse
from pathlib import Path

import numpy as np

from parakeet_tpu.audio.codec import load_wav
from parakeet_tpu.audio.features import LogMelFBank
from parakeet_tpu.utils.mp_tools import thread_map

INT16_MAX = 32767


def normalize_volume(wav, target_dbfs=-30.0):
    rms = np.sqrt(np.mean(wav ** 2) + 1e-12)
    dbfs = 20 * np.log10(rms + 1e-12)
    return wav * (10 ** ((target_dbfs - dbfs) / 20))


def energy_vad(wav, fs, window_ms=30, smooth_windows=8,
               threshold_db=-40.0):
    """Boolean sample mask: moving-average energy gate (stands in for the
    reference's webrtcvad trim, audio_processor.py:110-145)."""
    win = max(1, int(fs * window_ms / 1000))
    n = len(wav) // win
    if n == 0:
        return np.ones(len(wav), bool)
    frames = wav[:n * win].reshape(n, win)
    db = 10 * np.log10(np.mean(frames ** 2, axis=1) + 1e-12)
    voiced = db > threshold_db
    kernel = np.ones(smooth_windows) / smooth_windows
    voiced = np.convolve(voiced.astype(np.float32), kernel,
                         mode="same") > 0.25
    mask = np.repeat(voiced, win)
    return np.pad(mask, (0, len(wav) - len(mask)), constant_values=False)


_ANGLOPHONE = ["australia", "canada", "ireland", "uk", "usa"]


def collect_speaker_dirs(dataset: str, root: Path):
    """Corpus layout adapters (reference dataset_processors.py:106-175).

    Returns (list of (speaker_name, dir), glob pattern); speaker_name
    joins the path parts below ``root`` so mixed corpora stay disjoint.
    """
    def named(dirs):
        return [("_".join(d.relative_to(root).parts), d)
                for d in sorted(dirs) if d.is_dir()]

    if dataset == "librispeech_other":
        return named((root / "LibriSpeech" / "train-other-500").glob("*")), \
            "*.flac"
    if dataset == "voxceleb1":
        base = root / "VoxCeleb1"
        with (base / "vox1_meta.csv").open() as f:
            meta = [line.strip().split("\t") for line in f][1:]
        keep = {row[0] for row in meta
                if row[-1] == "dev" and row[3].lower() in _ANGLOPHONE}
        dirs = [d for d in (base / "wav").glob("*") if d.name in keep]
        print(f"VoxCeleb1: {len(dirs)} anglophone dev speakers kept")
        return named(dirs), "*.wav"
    if dataset == "voxceleb2":
        return named((root / "VoxCeleb2" / "wav").glob("*")), "*.wav"
    if dataset == "aidatatang_200zh":
        return named((root / "aidatatang_200zh" / "corpus" /
                      "train").glob("*")), "*.wav"
    if dataset == "magicdata":
        return named((root / "magicdata" / "train").glob("*")), "*.wav"
    raise ValueError(f"unknown dataset {dataset!r}")


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--input", type=Path, default=None,
                        help="root with one subdirectory per speaker "
                             "(generic layout)")
    parser.add_argument("--dataset", default=None,
                        choices=("librispeech_other", "voxceleb1",
                                 "voxceleb2", "aidatatang_200zh",
                                 "magicdata"),
                        help="use a corpus layout adapter instead of "
                             "--input")
    parser.add_argument("--datasets-root", type=Path, default=None,
                        help="root containing the --dataset corpus")
    parser.add_argument("--output", type=Path, required=True)
    parser.add_argument("--pattern", default=None,
                        help="'|'-separated glob patterns (default: the "
                             "--dataset adapter's pattern, else *.wav)")
    parser.add_argument("--fs", type=int, default=16000)
    parser.add_argument("--n-mels", type=int, default=40)
    parser.add_argument("--window-ms", type=float, default=25.0)
    parser.add_argument("--hop-ms", type=float, default=10.0)
    parser.add_argument("--min-frames", type=int, default=160,
                        help="skip utterances shorter than this many "
                             "frames (partials_n_frames in the reference)")
    parser.add_argument("--num-workers", type=int, default=8)
    args = parser.parse_args()

    win = int(args.fs * args.window_ms / 1000)
    hop = int(args.fs * args.hop_ms / 1000)
    mel = LogMelFBank(sr=args.fs, n_fft=512, hop_length=hop,
                      win_length=win, n_mels=args.n_mels, fmin=0,
                      fmax=args.fs // 2)

    if args.dataset is not None:
        if args.datasets_root is None:
            parser.error("--dataset requires --datasets-root")
        speakers, pattern = collect_speaker_dirs(args.dataset,
                                                 args.datasets_root)
        if args.pattern is None:
            args.pattern = pattern
    elif args.input is not None:
        speakers = [(d.name, d) for d in sorted(args.input.iterdir())
                    if d.is_dir()]
        if args.pattern is None:
            args.pattern = "*.wav"
    else:
        parser.error("one of --input / --dataset is required")

    def process_speaker(spk):
        spk_name, spk_dir = spk
        out_dir = args.output / spk_name
        out_dir.mkdir(parents=True, exist_ok=True)
        count = 0
        for pattern in args.pattern.split("|"):
            for path in sorted(spk_dir.rglob(pattern)):
                wav, _ = load_wav(path, sr=args.fs)
                wav = normalize_volume(wav)
                mask = energy_vad(wav, args.fs)
                wav = wav[mask]
                feats = mel.get_log_mel_fbank(wav, base="e")
                if feats.shape[0] < args.min_frames:
                    continue
                np.save(out_dir / f"{path.stem}.npy",
                        feats.astype(np.float32))
                count += 1
        return f"{spk_name}: {count} utterances"

    for msg in thread_map(process_speaker, speakers, args.num_workers):
        print(msg)


if __name__ == "__main__":
    main()
