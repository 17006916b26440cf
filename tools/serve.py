#!/usr/bin/env python
"""Batched TTS serving CLI: text lines -> TTSEngine -> wavs.

The batch-scheduling counterpart of recipes/fastspeech2/synthesize_e2e.py
(which loops one utterance per step, like the reference's
examples/fastspeech2/baker/synthesize_e2e.py:32-90): all requests are
frontended up front, grouped onto the engine's (text, batch) bucket
grid, and synthesized as whole-batch jitted programs — the deployment
shape the serving-throughput numbers in docs/tpu_performance.md plan
for (~670 audio-s/s/chip at bs8-16 bf16).

Usage:
  python tools/serve.py --fastspeech2-config conf/default.yaml \
      --fastspeech2-checkpoint .../snapshot_iter_N.npz \
      --pwg-config .../default.yaml --pwg-checkpoint .../iter_M.npz \
      --phones-dict dump/phone_id_map.txt --text sentences.txt \
      --output-dir wavs/ [--lang zh|en] [--batch-size 8] [--warmup]
"""
import argparse
import sys
import time
import zlib
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--fastspeech2-config", type=Path, required=True)
    parser.add_argument("--fastspeech2-checkpoint", type=Path,
                        required=True)
    parser.add_argument("--fastspeech2-stat", type=Path, default=None)
    parser.add_argument("--pwg-config", type=Path, default=None)
    parser.add_argument("--pwg-checkpoint", type=Path, default=None)
    parser.add_argument("--pwg-stat", type=Path, default=None)
    parser.add_argument("--phones-dict", type=Path, required=True)
    parser.add_argument("--text", type=Path, required=True,
                        help="lines: <utt_id> <sentence>")
    parser.add_argument("--output-dir", type=Path, default=Path("wavs"))
    parser.add_argument("--lang", default="zh",
                        choices=("zh", "en", "en-char"))
    parser.add_argument("--speaker-dict", type=Path, default=None)
    parser.add_argument("--spk-id", type=int, default=0)
    parser.add_argument("--text-buckets", type=int, nargs="+",
                        default=(32, 64, 128))
    parser.add_argument("--batch-size", type=int, default=8,
                        help="largest batch bucket (grid: 1,2,...,N "
                             "powers of two up to this)")
    parser.add_argument("--frames-per-token", type=int, default=8)
    parser.add_argument("--min-duration", type=int, default=1)
    parser.add_argument("--warmup", action="store_true",
                        help="pre-compile the full bucket grid before "
                             "timing (serving deployments do)")
    parser.add_argument("--overflow", default="split",
                        choices=("split", "truncate", "error"),
                        help="requests longer than the largest text "
                             "bucket: split at pause tokens and stitch "
                             "the wavs (default), truncate, or error")
    from parakeet_tpu.utils.device import add_device_arg, set_device
    add_device_arg(parser)
    args = parser.parse_args()
    if (args.pwg_checkpoint is None) != (args.pwg_config is None):
        parser.error("--pwg-config and --pwg-checkpoint go together "
                     "(omit both for the Griffin-Lim fallback)")
    set_device(args.device)

    from parakeet_tpu.audio.codec import save_wav
    from parakeet_tpu.frontend.cli import build_text_to_ids
    from parakeet_tpu.models import FastSpeech2, PWGGenerator
    from parakeet_tpu.ops.normalizer import ZScore
    from parakeet_tpu.serving import Request, TTSEngine
    from parakeet_tpu.training.checkpoint import load_variables
    from parakeet_tpu.training.config import (Config,
                                              inference_model_kwargs)

    am_cfg = Config.from_yaml(args.fastspeech2_config)
    idim = sum(1 for _ in open(args.phones_dict))
    overrides = dict(am_cfg.get("model", {}))
    multi_speaker = args.speaker_dict is not None
    if multi_speaker:
        overrides.setdefault("num_speakers",
                             sum(1 for _ in open(args.speaker_dict)))
        overrides.setdefault("spk_embed_dim", 256)
    am = FastSpeech2(idim=idim, odim=am_cfg.n_mels,
                     **inference_model_kwargs(overrides))
    am_vars = load_variables(args.fastspeech2_checkpoint)
    voc = voc_params = None
    if args.pwg_checkpoint is not None:
        voc_cfg = Config.from_yaml(args.pwg_config)
        voc = PWGGenerator(**inference_model_kwargs(
            voc_cfg.get("generator_params", {})))
        voc_params = load_variables(args.pwg_checkpoint)["params"]

    # pause-token ids from the phone vocabulary: preferred boundaries
    # when a long request must be split across text buckets
    pause_tokens = {"sp", "sil", "<sp>", "sp1", "sil0", "pau"}
    split_ids = [int(i) for p, i in
                 (ln.split() for ln in open(args.phones_dict))
                 if p in pause_tokens]

    batch_buckets = [b for b in (1, 2, 4, 8, 16, 32, 64)
                     if b < args.batch_size] + [args.batch_size]
    engine = TTSEngine(
        am, am_vars, voc=voc, voc_params=voc_params,
        am_norm=(ZScore(*np.load(args.fastspeech2_stat))
                 if args.fastspeech2_stat else None),
        voc_norm=(ZScore(*np.load(args.pwg_stat))
                  if args.pwg_stat else None),
        text_buckets=tuple(args.text_buckets),
        batch_buckets=tuple(sorted(set(batch_buckets))),
        frames_per_token=args.frames_per_token,
        min_duration=args.min_duration, multi_speaker=multi_speaker,
        overflow=args.overflow, split_ids=split_ids)

    get_ids = build_text_to_ids(args.lang, args.phones_dict)
    requests = []
    for line in open(args.text):
        parts = line.strip().split(maxsplit=1)
        if len(parts) != 2:
            continue
        utt_id, sentence = parts
        ids = get_ids(sentence)
        if not ids:
            print(f"skip {utt_id}: empty phone sequence")
            continue
        cap = max(args.text_buckets)
        if len(ids) > cap:
            action = {"split": "splitting at pause tokens",
                      "truncate": "TRUNCATING to the bucket",
                      "error": "will raise"}[args.overflow]
            print(f"warn {utt_id}: {len(ids)} phones exceeds the "
                  f"largest text bucket ({cap}); {action}")
        requests.append(Request(
            ids=ids, utt_id=utt_id,
            seed=zlib.crc32(utt_id.encode()), spk_id=args.spk_id))
    if not requests:
        raise SystemExit("no synthesizable lines in --text")

    if args.warmup:
        tic = time.perf_counter()
        n = engine.warmup()
        print(f"warmup: {n} programs compiled in "
              f"{time.perf_counter() - tic:.1f}s")

    tic = time.perf_counter()
    results = engine.synthesize(requests)
    elapsed = time.perf_counter() - tic

    args.output_dir.mkdir(parents=True, exist_ok=True)
    total_audio = 0.0
    for res in results:
        if res.wav is not None:
            wav = res.wav
        else:  # vocoder-free fallback: mel pinv + fast Griffin-Lim
            from parakeet_tpu.audio.spectrum import logmel_to_wav
            wav = logmel_to_wav(res.mel, am_cfg.fs, am_cfg.n_fft,
                                am_cfg.n_shift, am_cfg.win_length,
                                fmin=am_cfg.fmin, fmax=am_cfg.fmax)
        out_path = args.output_dir / f"{res.utt_id}.wav"
        save_wav(out_path, np.asarray(wav).reshape(-1), am_cfg.fs)
        total_audio += len(wav) / am_cfg.fs
    print(f"{len(results)} utterances, {total_audio:.1f}s audio in "
          f"{elapsed:.2f}s wall ({total_audio / elapsed:.1f} "
          f"audio-s/s; {engine.compiled_programs} compiled programs)")


if __name__ == "__main__":
    main()
