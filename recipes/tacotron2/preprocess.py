#!/usr/bin/env python
"""Tacotron2 preprocessing: LJSpeech -> (chars/phones, log-mel) + metadata.

Equivalent of the reference dataset creation (reference:
examples/tacotron2/preprocess.py:30-70, which pairs an EnglishCharacter
frontend with mel extraction): tokenize the normalized text
(``--frontend char`` characters, the reference default, or
``--frontend phone`` ARPABET), extract per-utterance log-mel, build the
token id map, split train/dev/test.  Output schema matches the
fastspeech2/transformer_tts dumps (text tokens + speech .npy), so the
shared normalize stage and train CLI consume it directly.

Usage:
  python preprocess.py --rootdir ~/datasets/LJSpeech-1.1 \
      --dumpdir dump --config conf/default.yaml [--frontend char]
"""
import argparse
from pathlib import Path

import numpy as np

from parakeet_tpu.audio.codec import load_wav
from parakeet_tpu.audio.features import LogMelFBank
from parakeet_tpu.data.datasets import LJSpeechMetaData
from parakeet_tpu.data.datatable import write_jsonl
from parakeet_tpu.frontend import English, EnglishCharacter
from parakeet_tpu.training.config import Config


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--rootdir", type=Path, required=True,
                        help="LJSpeech-1.1 root (metadata.csv + wavs/)")
    parser.add_argument("--dumpdir", type=Path, default=Path("dump"))
    parser.add_argument("--config", type=Path, required=True)
    parser.add_argument("--frontend", default="char",
                        choices=("char", "phone"))
    parser.add_argument("--dev-size", type=int, default=100)
    parser.add_argument("--test-size", type=int, default=100)
    args = parser.parse_args()

    cfg = Config.from_yaml(args.config)
    frontend = EnglishCharacter() if args.frontend == "char" else English()
    mel_extractor = LogMelFBank(sr=cfg.fs, n_fft=cfg.n_fft,
                                hop_length=cfg.n_shift,
                                win_length=cfg.win_length,
                                fmin=cfg.fmin, fmax=cfg.fmax,
                                n_mels=cfg.n_mels)
    meta = LJSpeechMetaData(args.rootdir)

    args.dumpdir.mkdir(parents=True, exist_ok=True)
    sentences = {}
    wav_paths = {}
    for wav_path, normalized, _raw in meta.records:
        utt = Path(wav_path).stem
        tokens = [t for t in frontend.phoneticize(normalized)
                  if not t.isspace()]
        if not tokens:
            continue
        sentences[utt] = tokens
        wav_paths[utt] = wav_path

    token_set = sorted({t for toks in sentences.values() for t in toks})
    table = ["<pad>", "<unk>"] + token_set + ["<eos>"]
    with open(args.dumpdir / "phone_id_map.txt", "w") as f:
        for i, t in enumerate(table):
            f.write(f"{t} {i}\n")

    records = []
    for utt, tokens in sentences.items():
        wav, _ = load_wav(wav_paths[utt], sr=cfg.fs)
        mel = mel_extractor.get_log_mel_fbank(wav)
        np.save(args.dumpdir / f"{utt}_speech.npy", mel.astype(np.float32))
        records.append({
            "utt_id": utt,
            "phones": tokens,
            "text_lengths": len(tokens),
            "speech_lengths": int(mel.shape[0]),
            "speech": str(args.dumpdir / f"{utt}_speech.npy"),
        })

    n_dev, n_test = args.dev_size, args.test_size
    write_jsonl(args.dumpdir / "metadata_dev.jsonl", records[:n_dev])
    write_jsonl(args.dumpdir / "metadata_test.jsonl",
                records[n_dev:n_dev + n_test])
    write_jsonl(args.dumpdir / "metadata_train.jsonl",
                records[n_dev + n_test:])
    print(f"wrote {len(records)} utterances to {args.dumpdir}")


if __name__ == "__main__":
    main()
