#!/usr/bin/env python
"""End-to-end TransformerTTS synthesis: text -> mel -> wav.

Equivalent of the reference e2e synthesizer (reference:
examples/transformer_tts/ljspeech/synthesize_e2e.py): phoneticize raw
sentences with the English frontend (or the Chinese frontend with
--lang zh), autoregressively decode mel with the KV-cached scan,
denormalize with the training stats, and vocode with WaveFlow (the
reference pairing) or Parallel WaveGAN.

Usage:
  python synthesize_e2e.py --config conf/default.yaml \
      --checkpoint exp/checkpoints/snapshot_iter_N.npz \
      --stat dump/speech_stats.npy --phones-dict dump/phone_id_map.txt \
      --waveflow-config ../waveflow/conf/default.yaml \
      --waveflow-checkpoint .../snapshot_iter_M.npz \
      --text sentences.txt --output-dir wavs/
"""
import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from parakeet_tpu.audio.codec import save_wav
from parakeet_tpu.frontend.cli import build_text_to_ids
from parakeet_tpu.models import (ConditionalWaveFlow, PWGGenerator,
                                 TransformerTTS, pwg_inference)
from parakeet_tpu.ops.normalizer import ZScore
from parakeet_tpu.training.checkpoint import load_variables
from parakeet_tpu.training.config import Config, \
    inference_model_kwargs
from parakeet_tpu.utils.device import add_device_arg, set_device




def build_vocoder(args):
    """Returns (fn mel(T, n_mels) -> wav np array, sample rate) or
    (None, None)."""
    if args.pwg_checkpoint is not None:
        cfg = Config.from_yaml(args.pwg_config)
        gen = PWGGenerator(
            **inference_model_kwargs(cfg.get("generator_params", {})))
        params = load_variables(args.pwg_checkpoint)["params"]

        def run(mel):
            return np.asarray(pwg_inference(
                gen, {"params": params}, jnp.asarray(mel),
                rng=jax.random.PRNGKey(0)))
        return run, cfg.fs
    if args.waveflow_checkpoint is not None:
        cfg = Config.from_yaml(args.waveflow_config)
        model = ConditionalWaveFlow(
            **inference_model_kwargs(cfg.get("model", {})))
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
                        help="speech_stats.npy (mean/std) for denorm")
    parser.add_argument("--phones-dict", type=Path, required=True)
    parser.add_argument("--text", type=Path, required=True,
                        help="lines: <utt_id> <sentence>")
    parser.add_argument("--waveflow-config", type=Path, default=None)
    parser.add_argument("--waveflow-checkpoint", type=Path, default=None)
    parser.add_argument("--pwg-config", type=Path, default=None)
    parser.add_argument("--pwg-checkpoint", type=Path, default=None)
    parser.add_argument("--output-dir", type=Path, default=Path("wavs"))
    parser.add_argument("--lang", default="en", choices=("zh", "en", "en-char"))
    parser.add_argument("--max-text-len", type=int, default=192)
    parser.add_argument("--max-decoder-steps", type=int, default=500)
    add_device_arg(parser)
    args = parser.parse_args()
    for cfg_arg, ckpt_arg, name in (
            (args.pwg_config, args.pwg_checkpoint, "pwg"),
            (args.waveflow_config, args.waveflow_checkpoint, "waveflow")):
        if (cfg_arg is None) != (ckpt_arg is None):
            parser.error(f"--{name}-config and --{name}-checkpoint "
                         "must be given together")
    set_device(args.device)

    cfg = Config.from_yaml(args.config)
    idim = sum(1 for _ in open(args.phones_dict))
    model = TransformerTTS(idim=idim, odim=cfg.n_mels,
                           **inference_model_kwargs(cfg.get("model", {})))
    variables = load_variables(args.checkpoint)
    norm = ZScore(*np.load(args.stat)) if args.stat else None
    get_ids = build_text_to_ids(args.lang, args.phones_dict)
    vocoder, voc_fs = build_vocoder(args)

    @jax.jit
    def infer(variables, text, text_lengths):
        out = model.apply(variables, text, text_lengths,
                          max_decoder_steps=args.max_decoder_steps,
                          rngs={"dropout": jax.random.PRNGKey(0)},
                          method=TransformerTTS.inference)
        return out["mel"], out["lengths"]

    args.output_dir.mkdir(parents=True, exist_ok=True)
    for line in open(args.text):
        line = line.strip()
        if not line:
            continue
        parts = line.split(maxsplit=1)
        if len(parts) != 2:
            print(f"skipping malformed line: {line!r}")
            continue
        utt_id, sentence = parts
        ids = get_ids(sentence)[:args.max_text_len]
        if not ids:
            print(f"{utt_id}: no phones, skipping")
            continue
        text = jnp.zeros((1, args.max_text_len), jnp.int64).at[
            0, :len(ids)].set(jnp.asarray(ids))
        mel, lengths = infer(variables, text,
                             jnp.asarray([len(ids)], jnp.int64))
        n = int(lengths[0])
        if n == 0:
            print(f"{utt_id}: decoded 0 frames, skipping")
            continue
        mel = np.asarray(mel)[0, :n]
        if norm is not None:
            mel = np.asarray(norm.inverse(mel))
        if vocoder is None:
            out = args.output_dir / f"{utt_id}.npy"
            np.save(out, mel)
        else:
            wav = vocoder(mel)
            out = args.output_dir / f"{utt_id}.wav"
            save_wav(out, np.asarray(wav).reshape(-1), voc_fs)
        print(f"{utt_id}: {n} frames -> {out}")


if __name__ == "__main__":
    main()
