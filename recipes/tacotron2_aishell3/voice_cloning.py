#!/usr/bin/env python
"""Voice cloning: reference speech -> GE2E embedding -> Tacotron2 -> wav.

Equivalent of the reference notebook flow (reference:
examples/tacotron2_aishell3/voice_cloning.ipynb): embed a few seconds of
a target speaker with the GE2E encoder, condition the AISHELL-3
Tacotron2 on that embedding, decode the given phone ids, and vocode.

Usage:
  python voice_cloning.py --config conf/default.yaml \
      --checkpoint exp/checkpoints/snapshot_iter_N.npz \
      --ge2e-checkpoint .../ge2e/step-M.npz \
      --ref-wav target_speaker.wav \
      --phones-dict dump/phone_id_map.txt \
      --text sentences_pinyin.txt \
      --waveflow-config ../waveflow/conf/default.yaml \
      --waveflow-checkpoint .../waveflow/step-K.npz --output-dir cloned/
"""
import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from parakeet_tpu.audio.codec import load_wav, save_wav
from parakeet_tpu.audio.features import LogMelFBank
from parakeet_tpu.frontend.generate_lexicon import generate_lexicon
from parakeet_tpu.models import (ConditionalWaveFlow, LSTMSpeakerEncoder,
                                 Tacotron2, embed_utterance)
from parakeet_tpu.ops.normalizer import ZScore
from parakeet_tpu.training.checkpoint import load_variables
from parakeet_tpu.training.config import Config, \
    inference_model_kwargs
from parakeet_tpu.utils.device import add_device_arg, set_device


def embed_reference(args):
    """ref wav -> (256,) GE2E embedding via the shared partial-window
    helper (identical geometry to the training-time exporter)."""
    encoder = LSTMSpeakerEncoder(n_mels=40)
    params = load_variables(args.ge2e_checkpoint)["params"]
    wav, _ = load_wav(args.ref_wav, sr=16000)
    mel = LogMelFBank(sr=16000, n_fft=512, hop_length=160, win_length=400,
                      n_mels=40, fmin=0,
                      fmax=8000).get_log_mel_fbank(wav, base="e")
    return embed_utterance(encoder, params, mel)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", type=Path, required=True)
    parser.add_argument("--checkpoint", type=Path, required=True)
    parser.add_argument("--stat", type=Path, default=None)
    parser.add_argument("--ge2e-checkpoint", type=Path, required=True)
    parser.add_argument("--ref-wav", type=Path, required=True)
    parser.add_argument("--phones-dict", type=Path, required=True)
    parser.add_argument("--text", type=Path, required=True,
                        help="lines: <utt_id> <pinyin syllables>")
    parser.add_argument("--waveflow-config", type=Path, default=None)
    parser.add_argument("--waveflow-checkpoint", type=Path, default=None)
    parser.add_argument("--output-dir", type=Path, default=Path("cloned"))
    parser.add_argument("--max-text-len", type=int, default=128)
    parser.add_argument("--max-decoder-steps", type=int, default=1000)
    add_device_arg(parser)
    args = parser.parse_args()
    set_device(args.device)

    cfg = Config.from_yaml(args.config)
    vocab = {}
    for line in open(args.phones_dict, encoding="utf-8"):
        sym, idx = line.split()
        vocab[sym] = int(idx)
    model_kwargs = inference_model_kwargs(cfg.get("model", {}))
    model_kwargs.setdefault("d_global_condition", 256)
    model = Tacotron2(vocab_size=len(vocab), **model_kwargs)
    variables = load_variables(args.checkpoint)
    norm = ZScore(*np.load(args.stat)) if args.stat else None
    spk_emb = jnp.asarray(embed_reference(args))[None]

    vocoder = None
    if args.waveflow_checkpoint is not None:
        voc_cfg = Config.from_yaml(args.waveflow_config)
        voc = ConditionalWaveFlow(
            **inference_model_kwargs(voc_cfg.get("model", {})))
        voc_params = load_variables(args.waveflow_checkpoint)["params"]
        upsample = int(np.prod(voc.upsample_factors))

        @jax.jit
        def voc_infer(mel, rng):
            return voc.apply({"params": voc_params}, mel, rng,
                             method=ConditionalWaveFlow.infer)

        def vocoder(mel):
            wav = voc_infer(jnp.asarray(mel)[None], jax.random.PRNGKey(0))
            return (np.asarray(wav)[0, :mel.shape[0] * upsample],
                    voc_cfg.get("fs", cfg.fs))

    lexicon = generate_lexicon(with_tone=True, with_erhua=True)

    @jax.jit
    def infer(variables, text, text_lengths, spk_emb):
        out = model.apply(variables, text, text_lengths,
                          global_condition=spk_emb,
                          max_decoder_steps=args.max_decoder_steps,
                          rngs={"dropout": jax.random.PRNGKey(0)},
                          method=Tacotron2.infer)
        return out["mel_outputs_postnet"], out["lengths"]

    args.output_dir.mkdir(parents=True, exist_ok=True)
    for line in open(args.text, encoding="utf-8"):
        utt_id, pinyin = line.strip().split(maxsplit=1)
        ids = []
        for syll in pinyin.split():
            for p in lexicon.get(syll, "").split():
                if p in vocab:
                    ids.append(vocab[p])
        ids = ids[:args.max_text_len]
        text = jnp.zeros((1, args.max_text_len), jnp.int64).at[
            0, :len(ids)].set(jnp.asarray(ids))
        mel, lengths = infer(variables, text,
                             jnp.asarray([len(ids)], jnp.int64), spk_emb)
        n = int(lengths[0])
        if n == 0:
            print(f"{utt_id}: decoded 0 frames, skipping")
            continue
        mel_np = np.asarray(mel)[0, :n]
        if norm is not None:
            mel_np = np.asarray(norm.inverse(mel_np))
        if vocoder is None:
            out = args.output_dir / f"{utt_id}.npy"
            np.save(out, mel_np)
        else:
            wav, fs = vocoder(mel_np)
            out = args.output_dir / f"{utt_id}.wav"
            save_wav(out, wav, fs)
        print(f"{utt_id}: {n} frames -> {out}")


if __name__ == "__main__":
    main()
