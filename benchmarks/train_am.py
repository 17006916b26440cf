#!/usr/bin/env python
"""Per-family training throughput: Tacotron2 / TransformerTTS /
SpeedySpeech / WaveFlow.

Completes the per-family training perf story (FastSpeech2/PWGAN/GE2E
have dedicated benches): N jitted train steps at reference-like shapes
(batch 32, 96 tokens, 640 frames; WaveFlow at its reference bs8 /
65-frame clips), reporting the trainer's avg_ips metric (reference:
parakeet/training/trainer.py:160-168).

The AR models run dropout inside their teacher-forced decoders, so
the device RNG algorithm matters for them (--rng; measured defaults
per family in docs/tpu_performance.md round 5: rbg wins large parallel
draws, threefry wins tiny per-scan-step draws).

Usage: PYTHONPATH=.:/root/.axon_site python benchmarks/train_am.py \
           [--models tacotron2 transformer_tts speedyspeech waveflow] \
           [--iters 20] [--dtype bfloat16] [--rng rbg]
"""
import argparse
import json
import time

import numpy as np


def make_batch(rng, b, t, frames, odim=80):
    import jax.numpy as jnp
    return {
        "text": jnp.asarray(rng.integers(1, 80, (b, t)).astype(np.int64)),
        "text_lengths": jnp.asarray(np.full(b, t, np.int64)),
        "speech": jnp.asarray(rng.standard_normal(
            (b, frames, odim)).astype(np.float32)),
        "speech_lengths": jnp.asarray(np.full(b, frames, np.int64)),
    }


def bench_model(name, iters, dtype):
    import jax
    from parakeet_tpu.training.config import resolve_model_kwargs
    from parakeet_tpu.training.optimizer import build_optimizer

    dt = resolve_model_kwargs({"dtype": dtype})["dtype"]
    b, t, frames = 32, 96, 640
    rng = np.random.default_rng(0)
    batch = make_batch(rng, b, t, frames)

    if name == "tacotron2":
        from parakeet_tpu.models import (Tacotron2,
                                         init_tacotron2_train_state,
                                         make_tacotron2_train_step)
        model = Tacotron2(vocab_size=80, dtype=dt)
        tx = build_optimizer("adam", 1e-3)
        state = init_tacotron2_train_state(model, tx,
                                           jax.random.PRNGKey(0), batch)
        step = make_tacotron2_train_step(model, tx)
    elif name == "transformer_tts":
        from parakeet_tpu.models import (TransformerTTS,
                                         init_transformer_tts_train_state,
                                         make_transformer_tts_train_step)
        model = TransformerTTS(idim=80, odim=80, dtype=dt)
        tx = build_optimizer("adam", 1e-3)
        state = init_transformer_tts_train_state(
            model, tx, jax.random.PRNGKey(0), batch)
        step = make_transformer_tts_train_step(model, tx)
    elif name == "waveflow":
        # vocoder, not an AM, but benched here for the per-family
        # training table: reference protocol bs8, 65-frame mel clips
        # (recipes/waveflow/conf/default.yaml; upsample 16*16=256)
        import jax.numpy as jnp
        from parakeet_tpu.models import (ConditionalWaveFlow,
                                         init_waveflow_train_state,
                                         make_waveflow_train_step)
        b, frames, hop = 8, 65, 256
        batch = {
            "wav": jnp.asarray(rng.standard_normal(
                (b, frames * hop)).astype(np.float32) * 0.1),
            "mel": jnp.asarray(rng.standard_normal(
                (b, frames, 80)).astype(np.float32)),
        }
        model = ConditionalWaveFlow(dtype=dt)
        tx = build_optimizer("adam", 2e-4)
        state = init_waveflow_train_state(model, tx,
                                          jax.random.PRNGKey(0), batch)
        step = make_waveflow_train_step(model, tx)
    elif name == "speedyspeech":
        import jax.numpy as jnp
        from parakeet_tpu.models import (SpeedySpeech,
                                         init_speedyspeech_train_state,
                                         make_speedyspeech_train_step)
        b, t, frames = 32, 96, 640
        durations = np.full((b, t), frames // t, np.int64)
        durations[:, -1] += frames - durations[0].sum()
        batch = {
            "phones": jnp.asarray(rng.integers(
                1, 80, (b, t)).astype(np.int64)),
            "tones": jnp.asarray(rng.integers(
                0, 8, (b, t)).astype(np.int64)),
            "durations": jnp.asarray(durations),
            "feats": jnp.asarray(rng.standard_normal(
                (b, frames, 80)).astype(np.float32)),
            "num_phones": jnp.asarray(np.full(b, t, np.int64)),
            "num_frames": jnp.asarray(np.full(b, frames, np.int64)),
        }
        model = SpeedySpeech(vocab_size=80, tone_size=8, dtype=dt)
        tx = build_optimizer("adam", 1e-3)
        state = init_speedyspeech_train_state(model, tx,
                                              jax.random.PRNGKey(0), batch)
        step = make_speedyspeech_train_step(model, tx)
    else:
        raise ValueError(name)

    # no MFU column: the teacher-forced decoders are lax.scans, whose
    # FLOPs XLA's cost model counts once per loop (utils/flops.py
    # caveat) — avg_ips is the honest axis here
    state, metrics = step(state, batch)
    np.asarray(metrics["loss"])
    for _ in range(3):                 # throwaway chained reps (CLAUDE.md)
        state, metrics = step(state, batch)
    np.asarray(metrics["loss"])

    tic = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, batch)
    np.asarray(metrics["loss"])
    avg = (time.perf_counter() - tic) / iters
    return {"metric": f"{name}_train_avg_ips", "batch_size": b,
            "value": round(b / avg, 3), "unit": "sequences/sec",
            "dtype": dtype}


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--models", nargs="+",
                        default=["tacotron2", "transformer_tts"])
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--dtype", default="float32")
    parser.add_argument("--rng", default="threefry",
                        choices=("threefry", "rbg"))
    args = parser.parse_args()

    from parakeet_tpu.training.seeding import configure_rng_impl
    configure_rng_impl(args.rng)

    for name in args.models:
        out = bench_model(name, args.iters, args.dtype)
        out["rng"] = args.rng
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
