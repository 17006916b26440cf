#!/usr/bin/env python
"""Run FastSpeech2 + PWG from serialized graphs (no model code).

The deploy path for the flagship pipeline (reference analog:
examples/speedyspeech/baker/inference.py:39-52 loading paddle.jit.save'd
static graphs): ``jax.export`` StableHLO artifacts produced by
``synthesize_e2e.py --export-dir``, parameters and normalization stats
baked in — only the text frontend runs in Python.

Usage:
  python inference.py --export-dir exported/ \
      --phones-dict dump/phone_id_map.txt --lang zh \
      --text sentences.txt --output-dir wavs/
"""
import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jexport

from parakeet_tpu.audio.codec import save_wav
from parakeet_tpu.frontend.cli import build_text_to_ids
from parakeet_tpu.utils.device import add_device_arg, set_device




def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--export-dir", type=Path, required=True)
    parser.add_argument("--phones-dict", type=Path, required=True)
    parser.add_argument("--text", type=Path, required=True)
    parser.add_argument("--output-dir", type=Path, default=Path("wavs"))
    parser.add_argument("--lang", default="zh", choices=("zh", "en", "en-char"))
    parser.add_argument("--fs", type=int, default=24000)
    add_device_arg(parser)
    args = parser.parse_args()
    set_device(args.device)

    am = jexport.deserialize(
        (args.export_dir / "fastspeech2.jaxexport").read_bytes())
    voc = jexport.deserialize(
        (args.export_dir / "pwgan.jaxexport").read_bytes())
    max_text_len = am.in_avals[0].shape[1]
    max_frames = voc.in_avals[0].shape[1]
    hop = voc.in_avals[1].shape[1] // max_frames

    get_ids = build_text_to_ids(args.lang, args.phones_dict)
    args.output_dir.mkdir(parents=True, exist_ok=True)
    # constant key + constant shape: draw the vocoder noise once
    noise = jax.random.normal(jax.random.PRNGKey(0),
                              (1, max_frames * hop, 1))
    for line in open(args.text):
        parts = line.strip().split(maxsplit=1)
        if len(parts) != 2:
            continue
        utt_id, sentence = parts
        ids = get_ids(sentence)[:max_text_len]
        if not ids:
            print(f"{utt_id}: empty phone sequence, skipping")
            continue
        text = jnp.zeros((1, max_text_len), jnp.int64).at[
            0, :len(ids)].set(jnp.asarray(ids))
        mel, frames = am.call(text, jnp.asarray([len(ids)], jnp.int64))
        n = int(frames[0])
        if n == 0:
            print(f"{utt_id}: predicted 0 frames, skipping")
            continue
        wav = np.asarray(voc.call(mel, noise))[0, :n * hop]
        out = args.output_dir / f"{utt_id}.wav"
        save_wav(out, wav, args.fs)
        print(f"{utt_id}: {n} frames -> {out}")


if __name__ == "__main__":
    main()
