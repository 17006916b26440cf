#!/usr/bin/env python
"""Run SpeedySpeech + PWG from serialized graphs (no model code).

Equivalent of the reference deployment path (reference:
examples/speedyspeech/baker/inference.py:39-52, which loads the
``paddle.jit.save``d static graphs through paddle.inference).  Here the
artifacts are ``jax.export`` StableHLO functions produced by
``synthesize_e2e.py --export-dir``; parameters are already baked in.

Usage:
  python inference.py --export-dir exported/ \
      --phones-dict dump/phone_id_map.txt --tones-dict dump/tone_id_map.txt \
      --text sentences.txt --output-dir wavs/
"""
import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jexport

from parakeet_tpu.audio.codec import save_wav
from parakeet_tpu.frontend.zh_frontend import Frontend
from parakeet_tpu.utils.device import add_device_arg, set_device


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--export-dir", type=Path, required=True)
    parser.add_argument("--phones-dict", type=Path, required=True)
    parser.add_argument("--tones-dict", type=Path, default=None)
    parser.add_argument("--text", type=Path, required=True)
    parser.add_argument("--output-dir", type=Path, default=Path("wavs"))
    parser.add_argument("--fs", type=int, default=24000)
    add_device_arg(parser)
    args = parser.parse_args()
    set_device(args.device)

    am = jexport.deserialize(
        (args.export_dir / "speedyspeech.jaxexport").read_bytes())
    voc = jexport.deserialize(
        (args.export_dir / "pwgan.jaxexport").read_bytes())
    max_text_len = am.in_avals[0].shape[1]
    max_frames, n_mels = voc.in_avals[0].shape[1:3]
    hop = voc.in_avals[1].shape[1] // max_frames

    frontend = Frontend(phone_vocab_path=args.phones_dict,
                        tone_vocab_path=args.tones_dict)
    args.output_dir.mkdir(parents=True, exist_ok=True)
    for line in open(args.text):
        utt_id, sentence = line.strip().split(maxsplit=1)
        ids = frontend.get_input_ids(sentence)
        phone_ids = ids["phone_ids"][0][:max_text_len]
        n_ph = len(phone_ids)
        text = jnp.zeros((1, max_text_len), jnp.int64).at[
            0, :n_ph].set(jnp.asarray(phone_ids))
        tones = jnp.zeros((1, max_text_len), jnp.int64)
        if "tone_ids" in ids:
            tones = tones.at[0, :n_ph].set(
                jnp.asarray(ids["tone_ids"][0][:max_text_len]))
        mel, frames = am.call(text, tones)
        n = int(frames[0])
        if n == 0:
            print(f"{utt_id}: predicted 0 frames, skipping")
            continue
        noise = jax.random.normal(jax.random.PRNGKey(0),
                                  (1, max_frames * hop, 1))
        wav = np.asarray(voc.call(mel, noise))[0, :n * hop]
        out = args.output_dir / f"{utt_id}.wav"
        save_wav(out, wav, args.fs)
        print(f"{utt_id}: {n} frames -> {out}")


if __name__ == "__main__":
    main()
