#!/usr/bin/env python
"""End-to-end synthesis: text -> frontend -> FastSpeech2 -> PWGAN -> wav.

Equivalent of the reference e2e script (reference:
examples/fastspeech2/baker/synthesize_e2e.py:32-90), TPU-native: both the
acoustic model inference and the vocoder run as jit-compiled XLA programs
with bucketed static shapes.

Without --pwg-checkpoint the mel is inverted vocoder-free via the
mel pseudo-inverse + fast Griffin-Lim (audio/spectrum.py).

Usage:
  python synthesize_e2e.py --fastspeech2-config conf/default.yaml \
      --fastspeech2-checkpoint exp/default/checkpoints/snapshot_iter_N.npz \
      --pwg-config ../pwgan/conf/default.yaml \
      --pwg-checkpoint ../pwgan/exp/checkpoints/snapshot_iter_M.npz \
      --phones-dict dump/phone_id_map.txt --text sentences.txt \
      --output-dir wavs/ [--lang zh|en]
"""
import argparse
import zlib
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from parakeet_tpu.audio.codec import save_wav
from parakeet_tpu.frontend.cli import build_text_to_ids
from parakeet_tpu.models import FastSpeech2, PWGGenerator, pwg_inference
from parakeet_tpu.models.parallel_wavegan import pwg_streaming_inference
from parakeet_tpu.ops.normalizer import ZScore
from parakeet_tpu.training.checkpoint import load_variables
from parakeet_tpu.training.config import Config, \
    inference_model_kwargs
from parakeet_tpu.utils.device import add_device_arg, set_device


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--fastspeech2-config", type=Path, required=True)
    parser.add_argument("--fastspeech2-checkpoint", type=Path, required=True)
    parser.add_argument("--fastspeech2-stat", type=Path, default=None,
                        help="speech_stats.npy (mean/std) for denorm")
    parser.add_argument("--pwg-config", type=Path, default=None)
    parser.add_argument("--pwg-checkpoint", type=Path, default=None)
    parser.add_argument("--pwg-stat", type=Path, default=None)
    parser.add_argument("--phones-dict", type=Path, required=True)
    parser.add_argument("--text", type=Path, required=True,
                        help="lines: <utt_id> <sentence>")
    parser.add_argument("--output-dir", type=Path, default=Path("wavs"))
    parser.add_argument("--lang", default="zh", choices=("zh", "en", "en-char"))
    parser.add_argument("--speaker-dict", type=Path, default=None,
                        help="speaker_id_map.txt for multi-speaker "
                             "models (aishell3/vctk; reference: examples/"
                             "fastspeech2/aishell3/synthesize_e2e.py:47-56)")
    parser.add_argument("--spk-id", type=int, default=0,
                        help="speaker id to synthesize with "
                             "(multi-speaker models)")
    parser.add_argument("--max-text-len", type=int, default=128)
    parser.add_argument("--max-frames", type=int, default=1024,
                        help="decoder frame capacity; raise for "
                             "paragraph-scale long-form synthesis "
                             "(e.g. 6144 = 76.8 s at hop 300; the "
                             "decoder attention auto-switches to the "
                             "flash kernel above T=1024)")
    parser.add_argument("--min-duration", type=int, default=1,
                        help="floor each token's predicted duration "
                             "(robustness for under-trained "
                             "checkpoints; also the lever long-form "
                             "demos use to force a target length)")
    parser.add_argument("--export-dir", type=Path, default=None,
                        help="serialize the jitted AM + vocoder as "
                             "jax.export StableHLO (deploy via "
                             "inference.py; requires --pwg-checkpoint)")
    parser.add_argument("--streaming-chunk-frames", type=int, default=0,
                        help="vocode in fixed-size chunks (bit-exact, "
                             "O(chunk) memory, one compile for any "
                             "length); 0 = one-shot")
    parser.add_argument("--sp", type=int, default=1,
                        help="sequence parallelism: shard the decoder "
                             "frame axis over N devices with ring "
                             "attention (long-form synthesis; "
                             "--max-frames must be divisible by N; "
                             "output is identical to --sp 1)")
    add_device_arg(parser)
    args = parser.parse_args()
    if (args.pwg_checkpoint is None) != (args.pwg_config is None):
        parser.error("--pwg-config and --pwg-checkpoint must be given "
                     "together (omit both for the Griffin-Lim "
                     "vocoder-free fallback)")
    set_device(args.device)

    am_cfg = Config.from_yaml(args.fastspeech2_config)
    idim = sum(1 for _ in open(args.phones_dict))
    model_overrides = dict(am_cfg.get("model", {}))
    if args.speaker_dict is not None:
        model_overrides.setdefault(
            "num_speakers", sum(1 for _ in open(args.speaker_dict)))
        model_overrides.setdefault("spk_embed_dim", 256)

    sp_mesh = None
    decoder_attn_core = None
    if args.sp > 1:
        from parakeet_tpu.parallel import make_mesh, make_ring_attn_core
        if args.max_frames % args.sp:
            parser.error(f"--max-frames {args.max_frames} not divisible "
                         f"by --sp {args.sp}")
        sp_mesh = make_mesh(data=1, model=args.sp)
        decoder_attn_core = make_ring_attn_core(sp_mesh, "model")

    am = FastSpeech2(idim=idim, odim=am_cfg.n_mels,
                     decoder_attn_core=decoder_attn_core,
                     **inference_model_kwargs(model_overrides))
    am_vars = load_variables(args.fastspeech2_checkpoint)
    voc = voc_params = None
    if args.pwg_checkpoint is not None:
        voc_cfg = Config.from_yaml(args.pwg_config)
        voc = PWGGenerator(**inference_model_kwargs(
            voc_cfg.get("generator_params", {})))
        voc_params = load_variables(args.pwg_checkpoint)["params"]

    am_norm = (ZScore(*np.load(args.fastspeech2_stat))
               if args.fastspeech2_stat else None)
    voc_norm = (ZScore(*np.load(args.pwg_stat)) if args.pwg_stat else None)

    get_ids = build_text_to_ids(args.lang, args.phones_dict)
    spk_id = (jnp.asarray([args.spk_id], jnp.int32)
              if args.speaker_dict is not None else None)

    if args.export_dir is not None:
        # static-graph deploy artifacts (reference: paddle.jit.save of the
        # speedyspeech example; here StableHLO via jax.export).  The AM
        # graph emits vocoder-domain mel (am denorm + voc z-norm baked
        # in) so inference.py needs no stats files.
        if voc is None:
            raise SystemExit("--export-dir requires --pwg-checkpoint")
        from jax import export as jexport

        def am_export(text, text_lengths):
            out = am.apply(am_vars, text, text_lengths,
                           max_frames=args.max_frames,
                           min_duration=args.min_duration,
                           spk_id=spk_id, method=FastSpeech2.inference)
            mel = out["after_outs"]
            if am_norm is not None:
                mel = am_norm.inverse(mel)
            if voc_norm is not None:
                mel = voc_norm.transform(mel)
            return mel, out["frame_lengths"]

        w = voc.aux_context_window

        def voc_export(mel, noise):
            mel = jnp.pad(mel, ((0, 0), (w, w), (0, 0)), mode="edge")
            return voc.apply({"params": voc_params}, noise, mel)[..., 0]

        args.export_dir.mkdir(parents=True, exist_ok=True)
        text_spec = jax.ShapeDtypeStruct((1, args.max_text_len), jnp.int64)
        len_spec = jax.ShapeDtypeStruct((1,), jnp.int64)
        mel_spec = jax.ShapeDtypeStruct(
            (1, args.max_frames, am_cfg.n_mels), jnp.float32)
        noise_spec = jax.ShapeDtypeStruct(
            (1, args.max_frames * voc.upsample_factor, 1), jnp.float32)
        exp_am = jexport.export(jax.jit(am_export))(text_spec, len_spec)
        exp_voc = jexport.export(jax.jit(voc_export))(mel_spec, noise_spec)
        (args.export_dir / "fastspeech2.jaxexport").write_bytes(
            exp_am.serialize())
        (args.export_dir / "pwgan.jaxexport").write_bytes(
            exp_voc.serialize())
        print(f"exported serialized graphs to {args.export_dir}")

    @jax.jit
    def am_infer(variables, text, text_lengths):
        out = am.apply(variables, text, text_lengths,
                       max_frames=args.max_frames,
                       min_duration=args.min_duration,
                       spk_id=spk_id, method=FastSpeech2.inference)
        return out["after_outs"], out["frame_lengths"]

    if sp_mesh is not None:
        from parakeet_tpu.parallel import replicate
        am_vars = replicate(am_vars, sp_mesh)

    args.output_dir.mkdir(parents=True, exist_ok=True)
    for line in open(args.text):
        parts = line.strip().split(maxsplit=1)
        if len(parts) != 2:
            continue
        utt_id, sentence = parts
        ids = get_ids(sentence)[:args.max_text_len]
        if not ids:
            print(f"skip {utt_id}: empty phone sequence")
            continue
        text = jnp.zeros((1, args.max_text_len), jnp.int64).at[
            0, :len(ids)].set(jnp.asarray(ids))
        lengths = jnp.asarray([len(ids)], jnp.int64)
        mel, frames = am_infer(am_vars, text, lengths)
        n = int(frames[0])
        if n == 0:
            print(f"skip: model predicted 0 frames")
            continue
        mel = np.asarray(mel)[0, :n]
        if am_norm is not None:
            mel = np.asarray(am_norm.inverse(mel))
        if voc is None:
            # vocoder-free fallback: mel pinv + fast Griffin-Lim
            from parakeet_tpu.audio.spectrum import logmel_to_wav
            wav = logmel_to_wav(mel, am_cfg.fs, am_cfg.n_fft,
                                am_cfg.n_shift, am_cfg.win_length,
                                fmin=am_cfg.fmin, fmax=am_cfg.fmax)
        else:
            voc_in = mel
            if voc_norm is not None:
                voc_in = np.asarray(voc_norm.transform(voc_in))
            # deterministic per-utterance seed (python hash() is salted
            # per process, which would make runs non-reproducible)
            rng = jax.random.PRNGKey(zlib.crc32(utt_id.encode()))
            if args.streaming_chunk_frames > 0:
                wav = pwg_streaming_inference(
                    voc, {"params": voc_params}, jnp.asarray(voc_in),
                    rng=rng, chunk_frames=args.streaming_chunk_frames)
            else:
                wav = pwg_inference(voc, {"params": voc_params},
                                    jnp.asarray(voc_in), rng=rng)
        wav = np.asarray(wav).reshape(-1)
        out_path = args.output_dir / f"{utt_id}.wav"
        save_wav(out_path, wav, am_cfg.fs)
        print(f"{utt_id}: {len(wav) / am_cfg.fs:.2f}s -> {out_path}")


if __name__ == "__main__":
    main()
