#!/usr/bin/env python
"""FastSpeech2 training-throughput benchmark (avg_ips, sequences/sec).

Counterpart of the reference's trainer `avg_ips` log-line metric
(reference: parakeet/training/trainer.py:160-168) for the acoustic
model: N jitted train steps of the default-config FastSpeech2
(384-dim, 4+4 layers) on synthetic bucketed batches.

Usage:  python benchmarks/train_fastspeech2.py [--iters 20] [--batch-size 32]
"""
import argparse
import json
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--text-len", type=int, default=96)
    parser.add_argument("--frames", type=int, default=640)
    parser.add_argument("--dtype", default="float32",
                        help="compute dtype (float32 | bfloat16)")
    parser.add_argument("--attn-impl", default="dense",
                        choices=("dense", "flash", "auto"),
                        help="attention core; 'flash' fuses softmax in "
                             "VMEM (nn/flash.py) and skips attention-"
                             "weight dropout, so the attn dropout rates "
                             "are set to 0 for that run")
    parser.add_argument("--profile", default=None, metavar="DIR",
                        help="capture a jax.profiler trace of 3 steps "
                             "into DIR (feed the xplane.pb to "
                             "tools/op_table.py)")
    parser.add_argument("--rng", default="threefry",
                        choices=("threefry", "rbg"),
                        help="device RNG algorithm; 'rbg' lifts this "
                             "dropout-heavy step 644 -> 1078 seq/s bf16 "
                             "(+67%%; docs/tpu_performance.md round 5, "
                             "recipe knob: rng_impl)")
    args = parser.parse_args()

    from parakeet_tpu.training.seeding import configure_rng_impl
    configure_rng_impl(args.rng)
    import jax
    import jax.numpy as jnp
    from parakeet_tpu.models import (FastSpeech2, init_fs2_train_state,
                                     make_fs2_train_step)
    from parakeet_tpu.training.optimizer import build_optimizer

    b, t, frames, odim = (args.batch_size, args.text_len, args.frames, 80)
    from parakeet_tpu.training.config import resolve_model_kwargs
    dtype = resolve_model_kwargs({"dtype": args.dtype})["dtype"]
    attn_kwargs = {"attn_impl": args.attn_impl}
    if args.attn_impl in ("flash", "auto"):
        attn_kwargs.update(transformer_enc_attn_dropout_rate=0.0,
                           transformer_dec_attn_dropout_rate=0.0)
    model = FastSpeech2(idim=80, odim=odim, adim=384, aheads=4, elayers=4,
                        eunits=1536, dlayers=4, dunits=1536, dtype=dtype,
                        **attn_kwargs)
    rng = np.random.default_rng(0)
    durations = np.full((b, t), frames // t, np.int64)
    durations[:, -1] += frames - durations[0].sum()
    batch = {
        "text": jnp.asarray(rng.integers(1, 80, (b, t))),
        "text_lengths": jnp.asarray(np.full(b, t)),
        "speech": jnp.asarray(rng.standard_normal(
            (b, frames, odim)).astype(np.float32)),
        "speech_lengths": jnp.asarray(np.full(b, frames)),
        "durations": jnp.asarray(durations),
        "pitch": jnp.asarray(rng.standard_normal(
            (b, t, 1)).astype(np.float32)),
        "energy": jnp.asarray(rng.standard_normal(
            (b, t, 1)).astype(np.float32)),
    }
    tx = build_optimizer("adam", 1e-4)
    state = init_fs2_train_state(model, tx, jax.random.PRNGKey(0), batch)
    step = make_fs2_train_step(model, tx)

    from parakeet_tpu.utils.flops import compiled_flops, mfu_stats
    # AOT-compile once; reuse the executable (avoids a second compile)
    step = step.lower(state, batch).compile()
    flops = compiled_flops(step)
    if args.attn_impl in ("flash", "auto"):
        # the flash kernel is a custom call (0 FLOPs to XLA's cost
        # model); take the denominator from the dense lowering of the
        # same program, as the pwgan bench does for its fused stack
        dense_model = model.clone(attn_impl="dense")
        step_dense = make_fs2_train_step(dense_model, tx)
        flops = compiled_flops(step_dense.lower(state, batch).compile())
    state, metrics = step(state, batch)
    np.asarray(metrics["loss"])

    if args.profile:
        jax.profiler.start_trace(args.profile)
        for _ in range(3):
            state, metrics = step(state, batch)
        np.asarray(metrics["loss"])
        jax.profiler.stop_trace()

    tic = time.perf_counter()
    for _ in range(args.iters):
        state, metrics = step(state, batch)
    np.asarray(metrics["loss"])
    avg_batch_cost = (time.perf_counter() - tic) / args.iters
    print(json.dumps({"metric": "fastspeech2_train_avg_ips",
                      "batch_size": b,
                      "value": round(b / avg_batch_cost, 3),
                      "unit": "sequences/sec",
                      "dtype": args.dtype,
                      "attn_impl": args.attn_impl,
                      **mfu_stats(flops, avg_batch_cost, args.dtype)}))


if __name__ == "__main__":
    main()
