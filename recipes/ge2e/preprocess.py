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


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--input", type=Path, required=True,
                        help="root with one subdirectory per speaker")
    parser.add_argument("--output", type=Path, required=True)
    parser.add_argument("--pattern", default="*.wav",
                        help="'|'-separated glob patterns")
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

    speakers = [d for d in sorted(args.input.iterdir()) if d.is_dir()]

    def process_speaker(spk_dir):
        out_dir = args.output / spk_dir.name
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
        return f"{spk_dir.name}: {count} utterances"

    for msg in thread_map(process_speaker, speakers, args.num_workers):
        print(msg)


if __name__ == "__main__":
    main()
