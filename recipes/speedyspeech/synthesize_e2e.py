#!/usr/bin/env python
"""SpeedySpeech end-to-end synthesis: text -> frontend -> mel -> PWG -> wav,
with optional serialized-graph export.

Equivalent of the reference e2e synthesizer + static-graph export
(reference: examples/speedyspeech/baker/synthesize_e2e.py:32-101, which
runs the zh frontend, the acoustic model and the vocoder, then exports
``paddle.jit.to_static`` programs).  The TPU analog of the static export
is ``jax.export``: --export-dir serializes the jitted acoustic-model and
vocoder computations (StableHLO) for inference.py to load without model
code.

Usage:
  python synthesize_e2e.py --config conf/default.yaml \
      --checkpoint exp/checkpoints/snapshot_iter_N.npz \
      --pwg-config ../pwgan/conf/default.yaml \
      --pwg-checkpoint .../snapshot_iter_M.npz \
      --phones-dict dump/phone_id_map.txt --tones-dict dump/tone_id_map.txt \
      --text sentences.txt --output-dir wavs/ [--export-dir exported/]
"""
import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from parakeet_tpu.audio.codec import save_wav
from parakeet_tpu.frontend.zh_frontend import Frontend
from parakeet_tpu.models import PWGGenerator, SpeedySpeech
from parakeet_tpu.ops.normalizer import ZScore
from parakeet_tpu.training.checkpoint import load_variables
from parakeet_tpu.training.config import Config, \
    inference_model_kwargs
from parakeet_tpu.utils.device import add_device_arg, set_device


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", type=Path, required=True)
    parser.add_argument("--checkpoint", type=Path, required=True)
    parser.add_argument("--stat", type=Path, default=None)
    parser.add_argument("--pwg-config", type=Path, required=True)
    parser.add_argument("--pwg-checkpoint", type=Path, required=True)
    parser.add_argument("--phones-dict", type=Path, required=True)
    parser.add_argument("--tones-dict", type=Path, default=None)
    parser.add_argument("--text", type=Path, required=True,
                        help="lines: <utt_id> <sentence>")
    parser.add_argument("--output-dir", type=Path, default=Path("wavs"))
    parser.add_argument("--export-dir", type=Path, default=None,
                        help="serialize jitted AM/vocoder (jax.export)")
    parser.add_argument("--max-text-len", type=int, default=128)
    parser.add_argument("--max-frames", type=int, default=1024)
    add_device_arg(parser)
    args = parser.parse_args()
    set_device(args.device)

    cfg = Config.from_yaml(args.config)
    voc_cfg = Config.from_yaml(args.pwg_config)
    vocab_size = sum(1 for _ in open(args.phones_dict))
    tone_size = (sum(1 for _ in open(args.tones_dict))
                 if args.tones_dict else None)
    am = SpeedySpeech(vocab_size=vocab_size, tone_size=tone_size,
                      **inference_model_kwargs(cfg.get("model", {})))
    am_variables = load_variables(args.checkpoint)
    gen = PWGGenerator(**voc_cfg.get("generator_params", {}))
    voc_params = load_variables(args.pwg_checkpoint)["params"]
    norm = ZScore(*np.load(args.stat)) if args.stat else None
    frontend = Frontend(phone_vocab_path=args.phones_dict,
                        tone_vocab_path=args.tones_dict)

    hop = gen.upsample_factor
    w = gen.aux_context_window

    def am_fn(variables, text, tones):
        out = am.apply(variables, text, tones,
                       max_frames=args.max_frames,
                       method=SpeedySpeech.inference)
        mel = out["mel"]
        if norm is not None:
            # denormalization must live INSIDE the function so the
            # jax.export graphs emit vocoder-domain mels (inference.py
            # has no access to --stat)
            mel = norm.inverse(mel)
        return mel, out["frame_lengths"]

    def voc_fn(params, mel, noise):
        mel = jnp.pad(mel, ((0, 0), (w, w), (0, 0)), mode="edge")
        return gen.apply({"params": params}, noise, mel)[..., 0]

    am_jit, voc_jit = jax.jit(am_fn), jax.jit(voc_fn)

    if args.export_dir is not None:
        from jax import export as jexport
        args.export_dir.mkdir(parents=True, exist_ok=True)
        text_spec = jax.ShapeDtypeStruct((1, args.max_text_len), jnp.int64)
        mel_spec = jax.ShapeDtypeStruct((1, args.max_frames, cfg.n_mels),
                                        jnp.float32)
        noise_spec = jax.ShapeDtypeStruct((1, args.max_frames * hop, 1),
                                          jnp.float32)
        exp_am = jexport.export(jax.jit(
            lambda t, tn: am_fn(am_variables, t, tn)))(text_spec, text_spec)
        exp_voc = jexport.export(jax.jit(
            lambda m, n: voc_fn(voc_params, m, n)))(mel_spec, noise_spec)
        (args.export_dir / "speedyspeech.jaxexport").write_bytes(
            exp_am.serialize())
        (args.export_dir / "pwgan.jaxexport").write_bytes(
            exp_voc.serialize())
        print(f"exported serialized graphs to {args.export_dir}")

    args.output_dir.mkdir(parents=True, exist_ok=True)
    for line in open(args.text):
        utt_id, sentence = line.strip().split(maxsplit=1)
        ids = frontend.get_input_ids(sentence)
        phone_ids = ids["phone_ids"][0][:args.max_text_len]
        tone_ids = (ids["tone_ids"][0][:args.max_text_len]
                    if "tone_ids" in ids else None)
        n_ph = len(phone_ids)
        text = jnp.zeros((1, args.max_text_len), jnp.int64).at[
            0, :n_ph].set(jnp.asarray(phone_ids))
        tones = None
        if tone_ids is not None:
            tones = jnp.zeros((1, args.max_text_len), jnp.int64).at[
                0, :n_ph].set(jnp.asarray(tone_ids))
        mel, frames = am_jit(am_variables, text, tones)
        n = int(frames[0])
        if n == 0:
            print(f"{utt_id}: predicted 0 frames, skipping")
            continue
        mel_np = np.asarray(mel)[:, :args.max_frames]
        noise = jax.random.normal(jax.random.PRNGKey(0),
                                  (1, args.max_frames * hop, 1))
        wav = voc_jit(voc_params, jnp.asarray(mel_np), noise)
        wav = np.asarray(wav)[0, :n * hop]
        out = args.output_dir / f"{utt_id}.wav"
        save_wav(out, wav, voc_cfg.fs)
        print(f"{utt_id}: {n} frames -> {out}")


if __name__ == "__main__":
    main()
