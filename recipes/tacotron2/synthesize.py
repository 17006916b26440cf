#!/usr/bin/env python
"""Tacotron2 batch synthesis: phone/character ids -> mel -> wav.

Equivalent of the reference synthesizer (reference:
examples/tacotron2/synthesize.py): free-running decode with stop-token /
attention-peak termination, optional Parallel WaveGAN vocoder (the
reference pairs Tacotron2 with WaveFlow; pass --waveflow-* instead to do
the same here).

Usage:
  python synthesize.py --config conf/default.yaml \
      --checkpoint exp/checkpoints/snapshot_iter_N.npz \
      --test-metadata dump/norm_test/metadata.jsonl \
      --pwg-config ../pwgan/conf/default.yaml \
      --pwg-checkpoint .../snapshot_iter_M.npz --output-dir wavs/
"""
import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from parakeet_tpu.audio.codec import save_wav
from parakeet_tpu.data.datatable import read_jsonl
from parakeet_tpu.models import (ConditionalWaveFlow, PWGGenerator,
                                 Tacotron2, pwg_inference)
from parakeet_tpu.ops.normalizer import ZScore
from parakeet_tpu.training.checkpoint import load_variables
from parakeet_tpu.training.config import Config, \
    inference_model_kwargs
from parakeet_tpu.utils.device import add_device_arg, set_device


def build_vocoder(args):
    """Returns (fn mel(T,80)->wav np array, sample rate) or None."""
    if args.pwg_checkpoint is not None:
        cfg = Config.from_yaml(args.pwg_config)
        gen = PWGGenerator(**cfg.get("generator_params", {}))
        params = load_variables(args.pwg_checkpoint)["params"]

        def run(mel):
            return np.asarray(pwg_inference(
                gen, {"params": params}, jnp.asarray(mel),
                rng=jax.random.PRNGKey(0)))
        return run, cfg.fs
    if args.waveflow_checkpoint is not None:
        cfg = Config.from_yaml(args.waveflow_config)
        model = ConditionalWaveFlow(**inference_model_kwargs(cfg.get("model", {})))
        params = load_variables(args.waveflow_checkpoint)["params"]
        upsample = int(np.prod(model.upsample_factors))

        @jax.jit
        def infer(mel, rng):
            return model.apply({"params": params}, mel, rng,
                               method=ConditionalWaveFlow.infer)

        def run(mel):
            wav = infer(jnp.asarray(mel)[None], jax.random.PRNGKey(0))
            return np.asarray(wav)[0, :mel.shape[0] * upsample]
        return run, cfg.fs
    return None, None


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", type=Path, required=True)
    parser.add_argument("--checkpoint", type=Path, required=True)
    parser.add_argument("--stat", type=Path, default=None,
                        help="mel z-score stats .npy for denormalization")
    parser.add_argument("--test-metadata", type=Path, required=True)
    parser.add_argument("--phones-dict", type=Path, required=True)
    parser.add_argument("--pwg-config", type=Path, default=None)
    parser.add_argument("--pwg-checkpoint", type=Path, default=None)
    parser.add_argument("--waveflow-config", type=Path, default=None)
    parser.add_argument("--waveflow-checkpoint", type=Path, default=None)
    parser.add_argument("--output-dir", type=Path, default=Path("wavs"))
    parser.add_argument("--max-text-len", type=int, default=192)
    parser.add_argument("--max-decoder-steps", type=int, default=1000)
    add_device_arg(parser)
    args = parser.parse_args()
    set_device(args.device)

    cfg = Config.from_yaml(args.config)
    vocab_size = sum(1 for _ in open(args.phones_dict))
    model = Tacotron2(vocab_size=vocab_size,
                      **inference_model_kwargs(cfg.get("model", {})))
    variables = load_variables(args.checkpoint)
    norm = ZScore(*np.load(args.stat)) if args.stat else None
    vocoder, voc_fs = build_vocoder(args)

    @jax.jit
    def infer(variables, text, text_lengths):
        out = model.apply(variables, text, text_lengths,
                          max_decoder_steps=args.max_decoder_steps,
                          rngs={"dropout": jax.random.PRNGKey(0)},
                          method=Tacotron2.infer)
        return out["mel_outputs_postnet"], out["lengths"]

    args.output_dir.mkdir(parents=True, exist_ok=True)
    for row in read_jsonl(args.test_metadata):
        ids = row["text"][:args.max_text_len]
        text = jnp.zeros((1, args.max_text_len), jnp.int64).at[
            0, :len(ids)].set(jnp.asarray(ids))
        mel, lengths = infer(variables, text,
                             jnp.asarray([len(ids)], jnp.int64))
        n = int(lengths[0])
        if n == 0:
            print(f"{row['utt_id']}: decoded 0 frames, skipping")
            continue
        mel = np.asarray(mel)[0, :n]
        if norm is not None:
            mel = np.asarray(norm.inverse(mel))
        if vocoder is None:
            out = args.output_dir / f"{row['utt_id']}.npy"
            np.save(out, mel)
        else:
            out = args.output_dir / f"{row['utt_id']}.wav"
            save_wav(out, vocoder(mel).reshape(-1), voc_fs)
        print(f"{row['utt_id']}: {n} frames -> {out}")


if __name__ == "__main__":
    main()
