#!/usr/bin/env python
"""TransformerTTS preprocessing: LJSpeech -> (phones, log-mel) + metadata.

Equivalent of the reference AR-model preprocessing (reference:
examples/transformer_tts/preprocess.py:33-260): phoneticize the raw text
with the English frontend, extract per-utterance log-mel, build the
phone id map (<pad>/<unk> + sorted phone set + <eos>), and split
train/dev/test.  No durations — the model aligns via attention.

Usage:
  python preprocess.py --rootdir ~/datasets/LJSpeech-1.1 \
      --dumpdir dump --config conf/default.yaml \
      [--dev-size 100 --test-size 100] [--num-cpu 8]
"""
import argparse
from concurrent.futures import ProcessPoolExecutor
from pathlib import Path

import numpy as np

from parakeet_tpu.audio.codec import load_wav
from parakeet_tpu.audio.features import cached_extractors
from parakeet_tpu.data.datasets import LJSpeechMetaData
from parakeet_tpu.data.datatable import write_jsonl
from parakeet_tpu.frontend import English, EnglishCharacter
from parakeet_tpu.training.config import Config


def build_phone_id_map(sentences, output_path):
    """<pad>/<unk> + sorted phone set + <eos> (reference
    preprocess.py:61-83)."""
    phones = sorted({p for phns, _ in sentences.values() for p in phns})
    tokens = ["<pad>", "<unk>"] + phones + ["<eos>"]
    with open(output_path, "w") as f:
        for i, p in enumerate(tokens):
            f.write(f"{p} {i}\n")
    return {p: i for i, p in enumerate(tokens)}


def process_utterance(utt, wav_path, phones, speaker, cfg, dumpdir):
    mel_extractor, _, _ = cached_extractors(
        cfg.fs, cfg.n_fft, cfg.n_shift, cfg.win_length, cfg.fmin,
        cfg.fmax, cfg.n_mels)
    wav, _ = load_wav(wav_path, sr=cfg.fs)
    mel = mel_extractor.get_log_mel_fbank(wav)
    np.save(dumpdir / f"{utt}_speech.npy", mel.astype(np.float32))
    return {
        "utt_id": utt,
        "phones": phones,
        "text_lengths": len(phones),
        "speech_lengths": int(mel.shape[0]),
        "speech": str(dumpdir / f"{utt}_speech.npy"),
        "speaker": speaker,
    }


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--rootdir", type=Path, required=True,
                        help="LJSpeech-1.1 root (metadata.csv + wavs/)")
    parser.add_argument("--dumpdir", type=Path, default=Path("dump"))
    parser.add_argument("--config", type=Path, required=True)
    parser.add_argument("--num-cpu", type=int, default=1)
    parser.add_argument("--frontend", default="phone",
                        choices=("phone", "char"),
                        help="ARPABET phones (TransformerTTS) or raw "
                             "characters (the Tacotron2 convention, "
                             "reference examples/tacotron2/preprocess.py)")
    parser.add_argument("--dev-size", type=int, default=100)
    parser.add_argument("--test-size", type=int, default=100)
    args = parser.parse_args()

    cfg = Config.from_yaml(args.config)
    frontend = (English() if args.frontend == "phone"
                else EnglishCharacter())
    meta = LJSpeechMetaData(args.rootdir)
    sentences = {}
    wav_paths = {}
    for wav_path, normalized, _raw in meta.records:
        utt = Path(wav_path).stem
        phones = frontend.phoneticize(normalized)
        if args.frontend == "phone":
            # ARPABET emits word-separator spaces; drop them
            phones = [p for p in phones if not p.isspace()]
        else:
            # characters keep word boundaries (the reference character
            # vocab includes " "), encoded map-safely as <sp>
            phones = ["<sp>" if p.isspace() else p for p in phones]
        if not phones:
            continue
        sentences[utt] = (phones, utt[:2])  # speaker = LJ prefix
        wav_paths[utt] = wav_path

    args.dumpdir.mkdir(parents=True, exist_ok=True)
    build_phone_id_map(sentences, args.dumpdir / "phone_id_map.txt")

    jobs = [(utt, wav_paths[utt], phones, speaker)
            for utt, (phones, speaker) in sentences.items()]
    if args.num_cpu > 1:
        with ProcessPoolExecutor(args.num_cpu) as ex:
            futures = [ex.submit(process_utterance, *j, cfg, args.dumpdir)
                       for j in jobs]
            records = [f.result() for f in futures]
    else:
        records = [process_utterance(*j, cfg, args.dumpdir) for j in jobs]

    n_dev, n_test = args.dev_size, args.test_size
    write_jsonl(args.dumpdir / "metadata_dev.jsonl", records[:n_dev])
    write_jsonl(args.dumpdir / "metadata_test.jsonl",
                records[n_dev:n_dev + n_test])
    write_jsonl(args.dumpdir / "metadata_train.jsonl",
                records[n_dev + n_test:])
    print(f"wrote {len(records)} utterances to {args.dumpdir}")


if __name__ == "__main__":
    main()
