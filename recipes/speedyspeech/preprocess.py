#!/usr/bin/env python
"""SpeedySpeech preprocessing: durations + wavs -> mel + phones/tones.

Equivalent of the reference recipe (reference:
examples/speedyspeech/baker/preprocess.py): reads an MFA-derived
duration file, splits tone digits off the pinyin finals (``ang4`` ->
``ang`` + ``4``), extracts log-mel, writes ``.npy`` features,
``metadata_{train,dev,test}.jsonl`` and the phone/tone id maps.

Usage:
  python preprocess.py --rootdir <wavs/> --duration-file durations.txt \
      --dumpdir dump --config conf/default.yaml [--num-cpu 8]
"""
import argparse
import functools
import re
import sys
from concurrent.futures import ProcessPoolExecutor
from pathlib import Path

import numpy as np

from parakeet_tpu.audio.codec import load_wav
from parakeet_tpu.audio.features import LogMelFBank
from parakeet_tpu.data.datatable import write_jsonl
from parakeet_tpu.data.preprocess import (build_phone_tone_id_maps,
                                          merge_silence, read_duration_file,
                                          reconcile_durations)
from parakeet_tpu.training.config import Config

_TONED = re.compile(r"^(\w+)([012345])$")


def split_phone_tone(label: str):
    m = _TONED.match(label)
    if m:
        return m.group(1), m.group(2)
    return label, "0"


@functools.lru_cache(maxsize=4)
def _mel_extractor(fs, n_fft, n_shift, win_length, fmin, fmax, n_mels):
    return LogMelFBank(sr=fs, n_fft=n_fft, hop_length=n_shift,
                       win_length=win_length, fmin=fmin, fmax=fmax,
                       n_mels=n_mels)


def process_utterance(utt, wav_path, phones, durations, cfg, dumpdir,
                      phone_ids, tone_ids):
    wav, _ = load_wav(wav_path, sr=cfg.fs)
    mel_extractor = _mel_extractor(cfg.fs, cfg.n_fft, cfg.n_shift,
                                   cfg.win_length, cfg.fmin, cfg.fmax,
                                   cfg.n_mels)
    mel = mel_extractor.get_log_mel_fbank(wav)
    sent = {utt: [phones, list(durations), "baker"]}
    if not reconcile_durations(sent, utt, mel.shape[0]):
        return None
    durations = [int(d) for d in sent[utt][1]]

    bases, tones = [], []
    for label in phones:
        base, tone = split_phone_tone(label)
        bases.append(phone_ids.get(base, phone_ids.get("<unk>", 1)))
        tones.append(tone_ids.get(tone, 0))

    out = Path(dumpdir)
    np.save(out / f"{utt}_feats.npy", mel.astype(np.float32))
    return {
        "utt_id": utt,
        "phones": bases,
        "tones": tones,
        "num_phones": len(bases),
        "num_frames": int(mel.shape[0]),
        "durations": durations,
        "feats": str(out / f"{utt}_feats.npy"),
    }


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--rootdir", type=Path, required=True)
    parser.add_argument("--duration-file", type=Path, required=True)
    parser.add_argument("--dumpdir", type=Path, default=Path("dump"))
    parser.add_argument("--config", type=Path, required=True)
    parser.add_argument("--num-cpu", type=int, default=1)
    parser.add_argument("--dev-size", type=int, default=100)
    parser.add_argument("--test-size", type=int, default=100)
    args = parser.parse_args()

    cfg = Config.from_yaml(args.config)
    sentences, _speakers = read_duration_file(args.duration_file)
    merge_silence(sentences)

    args.dumpdir.mkdir(parents=True, exist_ok=True)
    phone_table, tone_table = build_phone_tone_id_maps(
        sentences, args.dumpdir / "phone_id_map.txt",
        args.dumpdir / "tone_id_map.txt")
    phone_ids = {p: i for i, p in enumerate(phone_table)}
    tone_ids = {t: i for i, t in enumerate(tone_table)}

    jobs = []
    for utt, (phones, durations, _spk) in sentences.items():
        wav_path = args.rootdir / f"{utt}.wav"
        if not wav_path.exists():
            print(f"skip {utt}: no wav", file=sys.stderr)
            continue
        jobs.append((utt, wav_path, phones, durations))

    if args.num_cpu > 1:
        with ProcessPoolExecutor(args.num_cpu) as ex:
            futures = [ex.submit(process_utterance, *j, cfg, args.dumpdir,
                                 phone_ids, tone_ids) for j in jobs]
            records = [f.result() for f in futures]
    else:
        records = [process_utterance(*j, cfg, args.dumpdir, phone_ids,
                                     tone_ids) for j in jobs]

    records = [r for r in records if r is not None]
    records.sort(key=lambda r: r["utt_id"])
    n_dev, n_test = args.dev_size, args.test_size
    write_jsonl(args.dumpdir / "metadata_dev.jsonl", records[:n_dev])
    write_jsonl(args.dumpdir / "metadata_test.jsonl",
                records[n_dev:n_dev + n_test])
    write_jsonl(args.dumpdir / "metadata_train.jsonl",
                records[n_dev + n_test:])
    print(f"wrote {len(records)} utterances to {args.dumpdir}")


if __name__ == "__main__":
    main()
