#!/usr/bin/env python
"""WaveFlow synthesis speed benchmark.

The reference's headline number is ~40x faster than real time at
22.05 kHz on a V100 with no engineered kernels (reference:
docs/src/released_models.md:275); RTF 0.025.  This measures the
jit-compiled lax.scan row sampler end to end (mel -> waveform), chained
iterations with one final host fetch.

Usage: python benchmarks/waveflow_rtf.py [--frames 256] [--iters 10]
"""
import argparse
import json
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--frames", type=int, default=344,
                        help="mel frames (~4 s at 22.05 kHz hop 256)")
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--dtype", default="float32",
                        help="sampling-scan activation dtype (float32 | "
                             "bfloat16); params, skip/logs accumulation "
                             "and the affine inversion stay fp32")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from parakeet_tpu.models import ConditionalWaveFlow

    fs, hop = 22050, 256
    adt = jnp.bfloat16 if args.dtype == "bfloat16" else None
    model = ConditionalWaveFlow(upsample_factors=(16, 16), n_flows=8,
                                n_layers=8, n_group=16, channels=128,
                                n_mels=80, sample_act_dtype=adt)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal(
        (1, args.frames, 80)).astype(np.float32))
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, args.frames * hop), jnp.float32), mel)["params"]

    @jax.jit
    def infer(params, mel, key):
        wav = model.apply({"params": params}, mel, key,
                          method=ConditionalWaveFlow.infer)
        return wav, jax.random.fold_in(key, jnp.int32(wav[0, 0] == 0))

    key = jax.random.PRNGKey(1)
    from parakeet_tpu.utils.flops import (mfu_stats,
                                          waveflow_sampler_flops)
    # AOT-compile once; reuse the executable (avoids a second compile)
    infer = infer.lower(params, mel, key).compile()
    # analytic count: XLA's cost model counts the row-scan body once
    # instead of 15 x 8 times (utils/flops.py caveat; the old number
    # under-reported MFU 15x)
    flops = waveflow_sampler_flops(
        args.frames * hop, n_flows=model.n_flows,
        n_layers=model.n_layers, n_group=model.n_group,
        channels=model.channels, mel_bands=model.n_mels,
        kernel_size=model.kernel_size)
    wav, key = infer(params, mel, key)
    assert bool(np.isfinite(np.asarray(wav)).all()), "non-finite output"

    # warmup rep: the first chained run after compile carries ~10x
    # one-time device cost (see docs/tpu_performance.md checklist)
    for _ in range(args.iters):
        wav, key = infer(params, mel, key)
    np.asarray(wav)

    tic = time.perf_counter()
    for _ in range(args.iters):
        wav, key = infer(params, mel, key)
    np.asarray(wav)
    elapsed = (time.perf_counter() - tic) / args.iters
    audio_seconds = wav.shape[-1] / fs
    rtf = elapsed / audio_seconds
    # MFU denominator: bf16 peak even for --dtype float32 — JAX
    # default-precision fp32 matmuls run single-pass bf16 multiplies on
    # the MXU, so the half-peak fp32 convention over-reports (>100%)
    print(json.dumps({"metric": "waveflow_synthesis_rtf",
                      "value": round(rtf, 6), "unit": "rtf",
                      "dtype": args.dtype,
                      "vs_baseline": round(0.025 / rtf, 3),
                      **mfu_stats(flops, elapsed, "bfloat16")}))


if __name__ == "__main__":
    main()
