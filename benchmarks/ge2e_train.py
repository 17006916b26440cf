#!/usr/bin/env python
"""GE2E speaker-encoder training-throughput benchmark.

Counterpart of the reference's GE2E training loop timing (reference:
examples/ge2e/train.py:48 — one optimizer step per N x M batch): N
jitted train steps of the 3-layer LSTM encoder on a synthetic
(N_speakers*M_utts, frames, n_mels) batch, reporting utterances/sec
(= the reference's effective sample rate; one "iteration" = one batch).

The LSTM runs as a lax.scan over frames — per-step (B, 40+256) x
(296, 1024) matmuls — so the relevant axis is utterances/sec, not MFU
(reported anyway, from XLA's cost model).

Usage: python benchmarks/ge2e_train.py [--iters 20] [--speakers 64]
           [--utts 10] [--dtype bfloat16]
"""
import argparse
import json
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--speakers", type=int, default=64)
    parser.add_argument("--utts", type=int, default=10)
    parser.add_argument("--frames", type=int, default=160)
    parser.add_argument("--n-mels", type=int, default=40)
    parser.add_argument("--dtype", default="float32",
                        help="compute dtype (float32 | bfloat16); loss "
                             "and params stay fp32")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from parakeet_tpu.models import LSTMSpeakerEncoder
    from parakeet_tpu.models.ge2e_updater import (init_ge2e_train_state,
                                                  make_ge2e_train_step)
    from parakeet_tpu.training.config import resolve_model_kwargs
    from parakeet_tpu.training.optimizer import build_optimizer
    from parakeet_tpu.utils.flops import compiled_flops, mfu_stats

    dt = resolve_model_kwargs({"dtype": args.dtype})["dtype"]
    n, m = args.speakers, args.utts
    rng = np.random.default_rng(0)
    batch = {"utterances": jnp.asarray(rng.standard_normal(
        (n * m, args.frames, args.n_mels)).astype(np.float32))}

    model = LSTMSpeakerEncoder(n_mels=args.n_mels, dtype=dt)
    tx = build_optimizer("adam", 1e-4)
    state = init_ge2e_train_state(model, tx, jax.random.PRNGKey(0),
                                  batch, n)
    step = make_ge2e_train_step(model, tx, n)

    # AOT-compile once; reuse the executable
    step = step.lower(state, batch).compile()
    flops = compiled_flops(step)
    state, metrics = step(state, batch)            # first real execution
    np.asarray(metrics["loss"])
    for _ in range(3):                 # throwaway chained reps (CLAUDE.md:
        state, metrics = step(state, batch)        # first chained rep after
    np.asarray(metrics["loss"])                    # compile is ~10x cost)

    tic = time.perf_counter()
    for _ in range(args.iters):
        state, metrics = step(state, batch)
    np.asarray(metrics["loss"])
    avg_batch_cost = (time.perf_counter() - tic) / args.iters
    print(json.dumps({"metric": "ge2e_train_avg_ips",
                      "speakers": n, "utts_per_speaker": m,
                      "value": round(n * m / avg_batch_cost, 3),
                      "unit": "utterances/sec",
                      "dtype": args.dtype,
                      **mfu_stats(flops, avg_batch_cost, args.dtype)}))


if __name__ == "__main__":
    main()
