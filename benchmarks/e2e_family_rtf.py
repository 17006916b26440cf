#!/usr/bin/env python
"""Per-family end-to-end synthesis RTF: acoustic model -> Parallel WaveGAN.

`bench.py` measures the flagship FastSpeech2+PWGAN pipeline; this bench
closes the perf story for the other acoustic-model families by timing
the SAME deployment shape — batch 1, one jitted text->wav program per
family (the reference's synthesize_e2e granularity, reference:
examples/fastspeech2/baker/synthesize_e2e.py:32-86):

  - Tacotron2 (1000-step AR scan decode, the reference's
    max_decoder_steps bound) + PWG
  - TransformerTTS at reduction_factor 1 AND 2 (the reference's
    frame-thinning mode, reference transformer_tts.py:462-510) + PWG
  - SpeedySpeech (duration-expanded parallel decode) + PWG

All LJSpeech-config families synthesize the same 1000-frame capacity
(22.05 kHz, hop 256 -> 11.6 s); SpeedySpeech uses its Baker config
(24 kHz, hop 300 -> 12.5 s).  RTF = wall / audio-capacity seconds with
chained iterations and one final fetch (CLAUDE.md timing protocol);
a data dependency threads each iteration's PWG noise through the
previous wav so the chain cannot be elided.

Usage: PYTHONPATH=.:/root/.axon_site python benchmarks/e2e_family_rtf.py \
           [--families tacotron2 transformer_tts_r1 transformer_tts_r2 \
            speedyspeech] [--iters 10] [--dtype bfloat16]
"""
import argparse
import json
import time

import numpy as np


def _pwg(upsample_scales, dt):
    from parakeet_tpu.models import PWGGenerator
    return PWGGenerator(layers=30, stacks=3, residual_channels=64,
                        gate_channels=128, skip_channels=64,
                        upsample_scales=upsample_scales,
                        aux_context_window=2, dtype=dt)


def bench_family(family, iters, dtype):
    import jax
    import jax.numpy as jnp
    from parakeet_tpu.training.config import resolve_model_kwargs

    dt = resolve_model_kwargs({"dtype": dtype})["dtype"]
    text_len = 96
    rng = np.random.default_rng(0)
    text = jnp.asarray(rng.integers(1, 80, (1, text_len)).astype(np.int64))
    tl = jnp.asarray(np.array([text_len], np.int64))
    key, dkey = jax.random.PRNGKey(0), jax.random.PRNGKey(1)

    if family == "speedyspeech":
        sr, hop, frames = 24000, 300, 1000
        from parakeet_tpu.models import SpeedySpeech
        am = SpeedySpeech(vocab_size=80, tone_size=8, dtype=dt)
        tones = jnp.asarray(rng.integers(0, 8, (1, text_len)).astype(
            np.int64))
        am_vars = jax.jit(lambda k: am.init(
            {"params": k}, text, tones, max_frames=8,
            method=SpeedySpeech.inference))(key)

        def am_mel(v, t):
            out = am.apply(v, t, tones, max_frames=frames,
                           method=SpeedySpeech.inference)
            return out["mel"]
    elif family == "tacotron2":
        sr, hop, frames = 22050, 256, 1000
        from parakeet_tpu.models import Tacotron2
        am = Tacotron2(vocab_size=80, dtype=dt)
        am_vars = jax.jit(lambda k, d: am.init(
            {"params": k, "dropout": d}, text, tl, max_decoder_steps=8,
            method=Tacotron2.infer))(key, dkey)

        def am_mel(v, t):
            # prenet dropout stays ON at inference (the Tacotron2
            # convention, reference tacotron2.py:378-419)
            out = am.apply(v, t, tl, max_decoder_steps=frames,
                           rngs={"dropout": jax.random.PRNGKey(2)},
                           method=Tacotron2.infer)
            return out["mel_outputs_postnet"]
    elif family.startswith("transformer_tts_r"):
        sr, hop, frames = 22050, 256, 1000
        r = int(family.rsplit("r", 1)[1])
        from parakeet_tpu.models import TransformerTTS
        am = TransformerTTS(idim=80, odim=80, dtype=dt,
                            reduction_factor=r)
        am_vars = jax.jit(lambda k, d: am.init(
            {"params": k, "dropout": d}, text, tl, max_decoder_steps=8,
            method=TransformerTTS.inference))(key, dkey)

        def am_mel(v, t):
            out = am.apply(v, t, tl, max_decoder_steps=frames // r,
                           rngs={"dropout": jax.random.PRNGKey(2)},
                           method=TransformerTTS.inference)
            return out["mel"]
    else:
        raise ValueError(family)

    scales = {256: (4, 4, 4, 4), 300: (5, 6, 10)}[hop]
    pwg = _pwg(scales, dt)
    noise = jnp.zeros((1, frames * hop, 1), jnp.float32)
    mel_probe = jnp.zeros((1, frames + 4, 80), jnp.float32)
    pwg_vars = jax.jit(pwg.init)(jax.random.PRNGKey(3), noise, mel_probe)

    @jax.jit
    def synthesize(am_v, pwg_p, t, noise):
        mel = am_mel(am_v, t)
        mel = jnp.pad(mel, ((0, 0), (2, 2), (0, 0)), mode="edge")
        wav = pwg.apply({"params": pwg_p}, noise, mel)
        # thread a data dependency into the next iteration's noise so
        # chained timing cannot be elided (bench.py pattern)
        next_noise = noise * (1.0 + 0.0 * jnp.mean(wav))
        return wav[..., 0], next_noise

    noise0 = jax.random.normal(jax.random.PRNGKey(4), noise.shape)
    wav, nz = synthesize(am_vars, pwg_vars["params"], text, noise0)
    assert bool(np.isfinite(np.asarray(wav)).all()), "non-finite output"
    # throwaway chained reps after compile (one-time device cost)
    for _ in range(3):
        wav, nz = synthesize(am_vars, pwg_vars["params"], text, nz)
    np.asarray(wav)

    tic = time.perf_counter()
    for _ in range(iters):
        wav, nz = synthesize(am_vars, pwg_vars["params"], text, nz)
    np.asarray(wav)
    elapsed = (time.perf_counter() - tic) / iters
    audio_seconds = wav.shape[-1] / sr
    return elapsed / audio_seconds, audio_seconds


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--families", nargs="+",
                        default=["tacotron2", "transformer_tts_r1",
                                 "transformer_tts_r2", "speedyspeech"])
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--dtype", default="bfloat16",
                        help="compute dtype (float32 | bfloat16); "
                             "params stay fp32")
    args = parser.parse_args()

    for family in args.families:
        rtf, audio_s = bench_family(family, args.iters, args.dtype)
        print(json.dumps({"metric": f"{family}_pwgan_e2e_rtf",
                          "value": round(rtf, 6), "unit": "rtf",
                          "audio_seconds": round(audio_s, 2),
                          "vs_baseline": round(0.01 / rtf, 3),
                          "dtype": args.dtype}), flush=True)


if __name__ == "__main__":
    main()
