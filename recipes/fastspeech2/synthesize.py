#!/usr/bin/env python
"""Batch synthesis from test metadata: phone ids -> mel -> wav.

Equivalent of the reference batch synthesizer (reference:
examples/fastspeech2/synthesize.py).

Usage:
  python synthesize.py --fastspeech2-config conf/default.yaml \
      --fastspeech2-checkpoint exp/checkpoints/snapshot_iter_N.npz \
      --pwg-config ../pwgan/conf/default.yaml \
      --pwg-checkpoint ../pwgan/exp/checkpoints/snapshot_iter_M.npz \
      --test-metadata dump_norm/test/metadata.jsonl --output-dir wavs/
"""
import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from parakeet_tpu.audio.codec import save_wav
from parakeet_tpu.data.datatable import read_jsonl
from parakeet_tpu.models import FastSpeech2, PWGGenerator, pwg_inference
from parakeet_tpu.ops.normalizer import ZScore
from parakeet_tpu.training.checkpoint import load_variables
from parakeet_tpu.training.config import Config, \
    inference_model_kwargs
from parakeet_tpu.utils.device import add_device_arg, set_device


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--fastspeech2-config", type=Path, required=True)
    parser.add_argument("--fastspeech2-checkpoint", type=Path, required=True)
    parser.add_argument("--fastspeech2-stat", type=Path, default=None)
    parser.add_argument("--pwg-config", type=Path, required=True)
    parser.add_argument("--pwg-checkpoint", type=Path, required=True)
    parser.add_argument("--test-metadata", type=Path, required=True)
    parser.add_argument("--phones-dict", type=Path, required=True)
    parser.add_argument("--speaker-dict", type=Path, default=None,
                        help="speaker_id_map.txt for multi-speaker models"
                             " (aishell3/vctk)")
    parser.add_argument("--output-dir", type=Path, default=Path("wavs"))
    parser.add_argument("--max-text-len", type=int, default=192)
    parser.add_argument("--max-frames", type=int, default=1024)
    add_device_arg(parser)
    args = parser.parse_args()
    set_device(args.device)

    am_cfg = Config.from_yaml(args.fastspeech2_config)
    voc_cfg = Config.from_yaml(args.pwg_config)
    idim = sum(1 for _ in open(args.phones_dict))

    model_kwargs = inference_model_kwargs(am_cfg.get("model", {}))
    if args.speaker_dict is not None:
        model_kwargs.setdefault(
            "num_speakers", sum(1 for _ in open(args.speaker_dict)))
        model_kwargs.setdefault("spk_embed_dim", 256)
    am = FastSpeech2(idim=idim, odim=am_cfg.n_mels, **model_kwargs)
    am_vars = load_variables(args.fastspeech2_checkpoint)
    voc = PWGGenerator(**voc_cfg.get("generator_params", {}))
    voc_params = load_variables(args.pwg_checkpoint)["params"]
    am_norm = (ZScore(*np.load(args.fastspeech2_stat))
               if args.fastspeech2_stat else None)

    @jax.jit
    def am_infer(variables, text, text_lengths, spk_id):
        out = am.apply(variables, text, text_lengths,
                       max_frames=args.max_frames, min_duration=1,
                       spk_id=spk_id, method=FastSpeech2.inference)
        return out["after_outs"], out["frame_lengths"]

    args.output_dir.mkdir(parents=True, exist_ok=True)
    for row in read_jsonl(args.test_metadata):
        ids = row["text"][:args.max_text_len]
        text = jnp.zeros((1, args.max_text_len), jnp.int64).at[
            0, :len(ids)].set(jnp.asarray(ids))
        spk_id = (jnp.asarray([int(row["spk_id"])], jnp.int32)
                  if args.speaker_dict is not None else None)
        mel, frames = am_infer(am_vars, text,
                               jnp.asarray([len(ids)], jnp.int64), spk_id)
        n = int(frames[0])
        if n == 0:
            print(f"skip: model predicted 0 frames")
            continue
        mel = np.asarray(mel)[0, :n]
        if am_norm is not None:
            mel = np.asarray(am_norm.inverse(mel))
        wav = pwg_inference(voc, {"params": voc_params}, jnp.asarray(mel),
                            rng=jax.random.PRNGKey(0))
        out_path = args.output_dir / f"{row['utt_id']}.wav"
        save_wav(out_path, np.asarray(wav).reshape(-1), am_cfg.fs)
        print(f"{row['utt_id']}: {n} frames -> {out_path}")


if __name__ == "__main__":
    main()
