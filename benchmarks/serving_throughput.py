#!/usr/bin/env python
"""Batched end-to-end serving throughput: FastSpeech2 + Parallel WaveGAN.

The repo-root bench.py measures batch-1 latency (RTF); production
serving batches concurrent requests instead. This benchmark synthesizes
a batch of utterances per step (reference-default model sizes, 24 kHz
hop 300) and reports generated audio-seconds per wall-clock second —
the capacity number a serving deployment plans against.

Usage:  python benchmarks/serving_throughput.py [--batch-size 8]
"""
import argparse
import json
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--text-len", type=int, default=128)
    parser.add_argument("--max-frames", type=int, default=896)
    parser.add_argument("--dtype", default="float32",
                        help="compute dtype (float32 | bfloat16)")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from parakeet_tpu.models import FastSpeech2, PWGGenerator

    sr, hop = 24000, 300
    b, max_frames, text_len = (args.batch_size, args.max_frames,
                               args.text_len)

    from parakeet_tpu.training.config import resolve_model_kwargs
    dt = resolve_model_kwargs({"dtype": args.dtype})["dtype"]
    fs2 = FastSpeech2(idim=80, odim=80, adim=384, aheads=4, elayers=4,
                      eunits=1536, dlayers=4, dunits=1536, dtype=dt)
    pwg = PWGGenerator(layers=30, stacks=3, residual_channels=64,
                       gate_channels=128, skip_channels=64,
                       upsample_scales=(5, 6, 10), aux_context_window=2,
                       dtype=dt)

    rng = np.random.default_rng(0)
    text = jnp.asarray(rng.integers(1, 80, (b, text_len)).astype(np.int64))
    text_lengths = jnp.asarray(np.full(b, text_len, np.int64))
    fs2_vars = jax.jit(lambda k, t, l: fs2.init(
        {"params": k}, t, l, max_frames=max_frames,
        method=FastSpeech2.inference))(jax.random.PRNGKey(0), text,
                                       text_lengths)
    noise = jnp.zeros((b, max_frames * hop, 1), jnp.float32)
    mel_probe = jnp.zeros((b, max_frames + 4, 80), jnp.float32)
    pwg_vars = jax.jit(pwg.init)(jax.random.PRNGKey(1), noise, mel_probe)

    @jax.jit
    def synthesize(fs2_variables, pwg_params, text, text_lengths, noise):
        out = fs2.apply(fs2_variables, text, text_lengths,
                        max_frames=max_frames, method=FastSpeech2.inference)
        mel = jnp.pad(out["after_outs"], ((0, 0), (2, 2), (0, 0)),
                      mode="edge")
        wav = pwg.apply({"params": pwg_params}, noise, mel)
        next_noise = noise * (1.0 + 0.0 * jnp.mean(wav))
        return wav[..., 0], next_noise

    noise0 = jax.random.normal(jax.random.PRNGKey(2), noise.shape)
    from parakeet_tpu.utils.flops import (fs2_pwg_synthesis_flops,
                                          mfu_stats)
    flops = fs2_pwg_synthesis_flops(fs2, pwg, fs2_vars,
                                    pwg_vars["params"], text,
                                    text_lengths, noise0,
                                    max_frames=max_frames)
    wav, nz = synthesize(fs2_vars, pwg_vars["params"], text, text_lengths,
                         noise0)
    assert bool(np.isfinite(np.asarray(wav)).all())

    tic = time.perf_counter()
    for _ in range(args.iters):
        wav, nz = synthesize(fs2_vars, pwg_vars["params"], text,
                             text_lengths, nz)
    np.asarray(wav)
    elapsed = (time.perf_counter() - tic) / args.iters

    audio_seconds = b * wav.shape[-1] / sr
    print(json.dumps({
        "metric": "fastspeech2_pwgan_serving_throughput",
        "batch_size": b,
        "value": round(audio_seconds / elapsed, 2),
        "unit": "audio_seconds/sec",
        "per_stream_rtf": round(elapsed / (wav.shape[-1] / sr), 6),
        "dtype": args.dtype,
        **mfu_stats(flops, elapsed, args.dtype),
    }))


if __name__ == "__main__":
    main()
