#!/usr/bin/env python
"""TTSEngine throughput on a mixed-length workload.

`serving_throughput.py` measures the fixed-shape capacity ceiling (all
requests the same length, one compiled program). Real traffic is
mixed-length; this bench runs the actual engine (`parakeet_tpu/
serving.py`) on a skewed length distribution and reports end-to-end
audio-s/s INCLUDING host-side scheduling, padding waste, and per-chunk
fetches — and contrasts the bucket grid against the pad-everything-
to-max single-bucket policy to quantify what bucketing buys.

Usage:  python benchmarks/serving_engine.py [--requests 64]
        [--dtype bfloat16] [--buckets 32 64 128] [--batch-size 8]
"""
import argparse
import json
import time

import numpy as np


def build_engine(text_buckets, batch_size, dtype, frames_per_token):
    import jax
    import jax.numpy as jnp
    from parakeet_tpu.models import FastSpeech2, PWGGenerator
    from parakeet_tpu.serving import TTSEngine
    from parakeet_tpu.training.config import resolve_model_kwargs

    dt = resolve_model_kwargs({"dtype": dtype})["dtype"]
    fs2 = FastSpeech2(idim=80, odim=80, adim=384, aheads=4, elayers=4,
                      eunits=1536, dlayers=4, dunits=1536, dtype=dt)
    pwg = PWGGenerator(layers=30, stacks=3, residual_channels=64,
                       gate_channels=128, skip_channels=64,
                       upsample_scales=(5, 6, 10), aux_context_window=2,
                       dtype=dt)
    text = jnp.ones((1, 16), jnp.int64)
    tlen = jnp.asarray([16], jnp.int64)
    fs2_vars = jax.jit(lambda k, t, l: fs2.init(
        {"params": k}, t, l, max_frames=256,
        method=FastSpeech2.inference))(jax.random.PRNGKey(0), text, tlen)
    pwg_params = jax.jit(pwg.init)(
        jax.random.PRNGKey(1), jnp.zeros((1, 16 * 300, 1)),
        jnp.zeros((1, 20, 80)))["params"]
    batch_buckets = tuple(sorted({1, 2, 4, batch_size}))
    return TTSEngine(fs2, fs2_vars, voc=pwg, voc_params=pwg_params,
                     text_buckets=tuple(text_buckets),
                     batch_buckets=batch_buckets,
                     frames_per_token=frames_per_token, min_duration=1)


def workload(n, lo, hi, seed=0):
    """Skewed mixed-length traffic: mostly short, a long tail."""
    from parakeet_tpu.serving import Request
    rng = np.random.default_rng(seed)
    lengths = np.clip((lo + rng.exponential((hi - lo) / 3, n)).astype(int),
                      lo, hi)
    return [Request(ids=rng.integers(1, 80, k).tolist(), utt_id=f"u{i}",
                    seed=i) for i, k in enumerate(lengths)]


def run(engine, reqs, sr, hop, repeats):
    results = engine.synthesize(reqs)        # compiles + warms the grid
    engine.synthesize(reqs)                  # throwaway warm rep
    tic = time.perf_counter()
    for _ in range(repeats):
        results = engine.synthesize(reqs)
    elapsed = (time.perf_counter() - tic) / repeats
    audio = sum(r.wav.shape[0] for r in results) / sr
    return audio, elapsed, results


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--requests", type=int, default=64)
    parser.add_argument("--min-len", type=int, default=20)
    parser.add_argument("--buckets", type=int, nargs="+",
                        default=(32, 64, 128))
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--frames-per-token", type=int, default=7)
    parser.add_argument("--repeats", type=int, default=3)
    parser.add_argument("--dtype", default="bfloat16")
    args = parser.parse_args()
    sr, hop = 24000, 300
    max_len = max(args.buckets)

    reqs = workload(args.requests, args.min_len, max_len)
    eng = build_engine(args.buckets, args.batch_size, args.dtype,
                       args.frames_per_token)
    audio, elapsed, _ = run(eng, reqs, sr, hop, args.repeats)

    # the naive policy: one bucket, everything padded to max_len
    flat = build_engine((max_len,), args.batch_size, args.dtype,
                        args.frames_per_token)
    f_audio, f_elapsed, _ = run(flat, reqs, sr, hop, args.repeats)

    print(json.dumps({
        "metric": "tts_engine_mixed_workload_throughput",
        "value": round(audio / elapsed, 2),
        "unit": "audio_seconds/sec",
        "requests": args.requests,
        "audio_seconds": round(audio, 2),
        "wall_sec": round(elapsed, 3),
        "programs": eng.compiled_programs,
        "pad_to_max_value": round(f_audio / f_elapsed, 2),
        "bucketing_speedup": round((audio / elapsed)
                                   / (f_audio / f_elapsed), 3),
        "dtype": args.dtype,
    }))


if __name__ == "__main__":
    main()
