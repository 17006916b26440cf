#!/usr/bin/env python
"""PWGAN preprocessing: wavs -> (wave, log-mel) pairs + metadata.

Equivalent of the reference vocoder preprocessing (reference:
examples/parallelwave_gan/baker/preprocess.py): per-utterance log-mel,
stored with the raw waveform for the random-window GAN collator.

Usage:
  python preprocess.py --rootdir <wavs/> --dumpdir dump \
      --config conf/default.yaml [--dev-size 100]
"""
import argparse
from pathlib import Path

import numpy as np

from parakeet_tpu.audio.codec import load_wav
from parakeet_tpu.audio.features import LogMelFBank
from parakeet_tpu.data.datatable import write_jsonl
from parakeet_tpu.training.config import Config


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--rootdir", type=Path, required=True)
    parser.add_argument("--dumpdir", type=Path, default=Path("dump"))
    parser.add_argument("--config", type=Path, required=True)
    parser.add_argument("--dev-size", type=int, default=100)
    args = parser.parse_args()

    cfg = Config.from_yaml(args.config)
    mel_extractor = LogMelFBank(sr=cfg.fs, n_fft=cfg.n_fft,
                                hop_length=cfg.n_shift,
                                win_length=cfg.win_length,
                                fmin=cfg.fmin, fmax=cfg.fmax,
                                n_mels=cfg.n_mels)
    args.dumpdir.mkdir(parents=True, exist_ok=True)
    records = []
    for wav_path in sorted(args.rootdir.glob("*.wav")):
        utt = wav_path.stem
        wav, _ = load_wav(wav_path, sr=cfg.fs)
        mel = mel_extractor.get_log_mel_fbank(wav)
        np.save(args.dumpdir / f"{utt}_wave.npy", wav.astype(np.float32))
        np.save(args.dumpdir / f"{utt}_feats.npy", mel.astype(np.float32))
        records.append({
            "utt_id": utt,
            "num_samples": int(len(wav)),
            "num_frames": int(mel.shape[0]),
            "wave": str(args.dumpdir / f"{utt}_wave.npy"),
            "feats": str(args.dumpdir / f"{utt}_feats.npy"),
        })
    write_jsonl(args.dumpdir / "metadata_dev.jsonl",
                records[:args.dev_size])
    write_jsonl(args.dumpdir / "metadata_train.jsonl",
                records[args.dev_size:])
    print(f"wrote {len(records)} utterances to {args.dumpdir}")


if __name__ == "__main__":
    main()
