#!/usr/bin/env python
"""Long-form (paragraph-scale) e2e synthesis RTF: one program, >=60 s.

The sequence-parallel/flash machinery exists for long-form synthesis
(SURVEY §5.7); this benchmark measures that regime on one chip: a
512-phone paragraph expanded to 6144 decoder frames (76.8 s of 24 kHz
audio) through reference-default FastSpeech2 (dense vs auto/flash
decoder attention — at T=6144 auto picks the flash kernel) and
one-shot reference-default PWGAN vocoding, all inside a single jitted
program per stage chain.  The recipe spelling of the same run:

  recipes/fastspeech2/synthesize_e2e.py --max-text-len 512 \
      --max-frames 6144 --min-duration 12 ...

Usage:  python benchmarks/longform_rtf.py [--iters 5]
        [--frames 6144] [--attn-impls dense auto]
"""
import argparse
import json
import time

import numpy as np


def bench(attn_impl: str, frames: int, iters: int):
    import jax
    import jax.numpy as jnp
    from parakeet_tpu.models import FastSpeech2, PWGGenerator
    from parakeet_tpu.utils.flops import fs2_pwg_synthesis_flops, mfu_stats

    sr, hop = 24000, 300
    text_len = 512
    min_dur = frames // text_len

    fs2 = FastSpeech2(idim=80, odim=80, adim=384, aheads=4, elayers=4,
                      eunits=1536, dlayers=4, dunits=1536,
                      attn_impl=attn_impl)
    pwg = PWGGenerator(layers=30, stacks=3, residual_channels=64,
                       gate_channels=128, skip_channels=64,
                       upsample_scales=(5, 6, 10),
                       aux_context_window=2)
    rng = np.random.default_rng(0)
    text = jnp.asarray(rng.integers(1, 80, (1, text_len)).astype(np.int64))
    text_lengths = jnp.asarray(np.array([text_len], np.int64))
    key = jax.random.PRNGKey(0)
    fs2_vars = jax.jit(lambda k, t, l: fs2.init(
        {"params": k}, t, l, max_frames=frames, min_duration=min_dur,
        method=FastSpeech2.inference))(key, text, text_lengths)
    noise = jnp.zeros((1, frames * hop, 1), jnp.float32)
    mel_probe = jnp.zeros((1, frames + 4, 80), jnp.float32)
    pwg_vars = jax.jit(pwg.init)(jax.random.PRNGKey(1), noise, mel_probe)

    @jax.jit
    def synthesize(fs2_variables, pwg_params, text, text_lengths, noise):
        out = fs2.apply(fs2_variables, text, text_lengths,
                        max_frames=frames, min_duration=min_dur,
                        method=FastSpeech2.inference)
        mel = jnp.pad(out["after_outs"], ((0, 0), (2, 2), (0, 0)),
                      mode="edge")
        wav = pwg.apply({"params": pwg_params}, noise, mel)
        next_noise = noise * (1.0 + 0.0 * jnp.mean(wav))
        return wav[..., 0], out["frame_lengths"], next_noise

    noise0 = jax.random.normal(jax.random.PRNGKey(2), noise.shape)
    # FLOPs denominator from the dense lowering (flash is a custom
    # call, 0 FLOPs to XLA's cost model)
    fs2_dense = fs2.clone(attn_impl="dense")
    flops = fs2_pwg_synthesis_flops(
        fs2_dense, pwg, fs2_vars, pwg_vars["params"], text, text_lengths,
        noise0, max_frames=frames)
    wav, frame_lengths, nz = synthesize(
        fs2_vars, pwg_vars["params"], text, text_lengths, noise0)
    assert int(frame_lengths[0]) == frames, int(frame_lengths[0])
    assert bool(np.isfinite(np.asarray(wav)).all()), "non-finite output"
    for _ in range(2):                       # one-time-cost warmup rep
        wav, frame_lengths, nz = synthesize(
            fs2_vars, pwg_vars["params"], text, text_lengths, nz)
    np.asarray(wav)
    tic = time.perf_counter()
    for _ in range(iters):
        wav, frame_lengths, nz = synthesize(
            fs2_vars, pwg_vars["params"], text, text_lengths, nz)
    np.asarray(wav)
    elapsed = (time.perf_counter() - tic) / iters
    audio_seconds = frames * hop / sr
    return elapsed / audio_seconds, audio_seconds, mfu_stats(
        flops, elapsed, "float32")


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--iters", type=int, default=5)
    parser.add_argument("--frames", type=int, default=6144)
    parser.add_argument("--attn-impls", nargs="+",
                        default=["dense", "auto"])
    args = parser.parse_args()
    for impl in args.attn_impls:
        rtf, secs, mfu = bench(impl, args.frames, args.iters)
        print(json.dumps({"metric": "fastspeech2_pwgan_longform_rtf",
                          "value": round(rtf, 6), "unit": "rtf",
                          "audio_seconds": secs,
                          "frames": args.frames,
                          "attn_impl": impl, **mfu}), flush=True)


if __name__ == "__main__":
    main()
