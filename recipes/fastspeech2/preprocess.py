#!/usr/bin/env python
"""FastSpeech2 preprocessing: durations + wavs -> mel/pitch/energy + metadata.

Equivalent of the reference recipe (reference:
examples/fastspeech2/preprocess.py:40-220): reads a duration file derived
from MFA TextGrids (``utt|spk|phn dur ...``), extracts log-mel, token-
averaged pitch/energy per utterance, writes ``.npy`` features and
``metadata.jsonl`` train/dev splits, and the phone/speaker id maps.

Usage:
  python preprocess.py --rootdir <wavs/> --duration-file durations.txt \
      --dumpdir dump --config conf/default.yaml [--num-cpu 8]
"""
import argparse
import sys
from concurrent.futures import ProcessPoolExecutor
from pathlib import Path

import numpy as np

from parakeet_tpu.audio.codec import load_wav
from parakeet_tpu.audio.features import cached_extractors
from parakeet_tpu.data.datatable import write_jsonl
from parakeet_tpu.data.preprocess import (build_phone_id_map,
                                          build_spk_id_map,
                                          merge_silence,
                                          read_duration_file,
                                          reconcile_durations)
from parakeet_tpu.training.config import Config


def process_utterance(utt, wav_path, phones, durations, speaker, cfg,
                      dumpdir):
    wav, _ = load_wav(wav_path, sr=cfg.fs)
    mel_extractor, pitch_extractor, energy_extractor = cached_extractors(
        cfg.fs, cfg.n_fft, cfg.n_shift, cfg.win_length, cfg.fmin,
        cfg.fmax, cfg.n_mels, cfg.f0min, cfg.f0max)
    mel = mel_extractor.get_log_mel_fbank(wav)          # (T, n_mels)
    sent = {utt: [phones, list(durations), speaker]}
    if not reconcile_durations(sent, utt, mel.shape[0]):
        return None
    durations = np.asarray(sent[utt][1], dtype=np.int64)
    pitch = pitch_extractor.get_pitch(wav, duration=durations)
    energy = energy_extractor.get_energy(wav, duration=durations)

    out = Path(dumpdir)
    np.save(out / f"{utt}_speech.npy", mel.astype(np.float32))
    np.save(out / f"{utt}_pitch.npy",
            np.asarray(pitch, np.float32).reshape(-1, 1))
    np.save(out / f"{utt}_energy.npy",
            np.asarray(energy, np.float32).reshape(-1, 1))
    return {
        "utt_id": utt,
        "phones": phones,
        "text_lengths": len(phones),
        "speech_lengths": int(mel.shape[0]),
        "durations": [int(d) for d in durations],
        "speech": str(out / f"{utt}_speech.npy"),
        "pitch": str(out / f"{utt}_pitch.npy"),
        "energy": str(out / f"{utt}_energy.npy"),
        "speaker": speaker,
    }


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--rootdir", type=Path, required=True,
                        help="directory containing <utt_id>.wav files")
    parser.add_argument("--duration-file", type=Path, required=True)
    parser.add_argument("--dumpdir", type=Path, default=Path("dump"))
    parser.add_argument("--config", type=Path, required=True)
    parser.add_argument("--num-cpu", type=int, default=1)
    parser.add_argument("--dev-size", type=int, default=100)
    parser.add_argument("--test-size", type=int, default=100)
    args = parser.parse_args()

    cfg = Config.from_yaml(args.config)
    sentences, speakers = read_duration_file(args.duration_file)
    merge_silence(sentences)

    args.dumpdir.mkdir(parents=True, exist_ok=True)
    build_phone_id_map(sentences, args.dumpdir / "phone_id_map.txt")
    build_spk_id_map(sorted(speakers), args.dumpdir / "speaker_id_map.txt")

    jobs = []
    for utt, (phones, durations, speaker) in sentences.items():
        wav_path = args.rootdir / f"{utt}.wav"
        if not wav_path.exists():
            print(f"skip {utt}: no wav", file=sys.stderr)
            continue
        jobs.append((utt, wav_path, phones, durations, speaker))

    records = []
    if args.num_cpu > 1:
        with ProcessPoolExecutor(args.num_cpu) as ex:
            futures = [ex.submit(process_utterance, *j, cfg, args.dumpdir)
                       for j in jobs]
            records = [f.result() for f in futures]
    else:
        records = [process_utterance(*j, cfg, args.dumpdir) for j in jobs]

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
