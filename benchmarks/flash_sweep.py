#!/usr/bin/env python
"""Dense vs flash attention across decoder sequence lengths.

The flash core (nn/flash.py) LOSES at the reference FastSpeech2 shapes
(T=640: 511.6 vs 591 seq/s fp32 — docs/benchmarks.md); its motivating
regime is long frame sequences where the dense path's (B, H, T, T)
score tensors dominate HBM traffic (and eventually HBM capacity).
This sweep finds the crossover: FastSpeech2 train steps at T_dec 512 ->
8192 with total tokens held constant (batch = TOKENS / T), dense vs
flash, reporting tokens/sec.  The result drives the ``attn_impl:
auto`` selection rule in models/fastspeech2.py and the crossover table
in docs/tpu_performance.md.

Usage:  python benchmarks/flash_sweep.py [--iters 10] [--tokens 16384]
        [--frames 512 1024 2048 4096 8192] [--dtype float32]
"""
import argparse
import json
import time
from pathlib import Path

import numpy as np


def bench_point(frames: int, batch: int, iters: int, attn_impl: str,
                dtype: str):
    import jax
    import jax.numpy as jnp
    from parakeet_tpu.models import (FastSpeech2, init_fs2_train_state,
                                     make_fs2_train_step)
    from parakeet_tpu.training.config import resolve_model_kwargs
    from parakeet_tpu.training.optimizer import build_optimizer

    t = 96 if frames % 96 == 0 else 64
    odim = 80
    dt = resolve_model_kwargs({"dtype": dtype})["dtype"]
    # attention dropout must be 0 for flash; zero it for BOTH impls so
    # the comparison is apples-to-apples
    model = FastSpeech2(idim=80, odim=odim, adim=384, aheads=4, elayers=4,
                        eunits=1536, dlayers=4, dunits=1536, dtype=dt,
                        attn_impl=attn_impl,
                        transformer_enc_attn_dropout_rate=0.0,
                        transformer_dec_attn_dropout_rate=0.0)
    rng = np.random.default_rng(0)
    durations = np.full((batch, t), frames // t, np.int64)
    durations[:, -1] += frames - durations[0].sum()
    batch_data = {
        "text": jnp.asarray(rng.integers(1, 80, (batch, t))),
        "text_lengths": jnp.asarray(np.full(batch, t)),
        "speech": jnp.asarray(rng.standard_normal(
            (batch, frames, odim)).astype(np.float32)),
        "speech_lengths": jnp.asarray(np.full(batch, frames)),
        "durations": jnp.asarray(durations),
        "pitch": jnp.asarray(rng.standard_normal(
            (batch, t, 1)).astype(np.float32)),
        "energy": jnp.asarray(rng.standard_normal(
            (batch, t, 1)).astype(np.float32)),
    }
    tx = build_optimizer("adam", 1e-4)
    state = init_fs2_train_state(model, tx, jax.random.PRNGKey(0),
                                 batch_data)
    step = make_fs2_train_step(model, tx).lower(state, batch_data).compile()
    state, metrics = step(state, batch_data)
    np.asarray(metrics["loss"])                    # warm + sync
    tic = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, batch_data)
    np.asarray(metrics["loss"])
    dt_s = (time.perf_counter() - tic) / iters
    return batch * frames / dt_s


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--tokens", type=int, default=16384,
                        help="frame tokens per step (batch = tokens/T)")
    parser.add_argument("--frames", type=int, nargs="+",
                        default=[512, 1024, 2048, 4096, 8192])
    parser.add_argument("--dtype", default="float32")
    parser.add_argument("--impls", nargs="+",
                        default=["dense", "flash"])
    args = parser.parse_args()

    import subprocess
    import sys

    for frames in args.frames:
        batch = max(1, args.tokens // frames)
        row = {"metric": "fastspeech2_train_tokens_per_sec",
               "frames": frames, "batch_size": batch,
               "dtype": args.dtype}
        for impl in args.impls:
            # each point runs in its own process: a RESOURCE_EXHAUSTED
            # at long T (a legitimate result for dense) would otherwise
            # poison subsequent allocations in this process
            try:
                proc = subprocess.run(
                    [sys.executable, "-c",
                     "import sys; sys.path.insert(0, "
                     f"{str(Path(__file__).parent)!r}); "
                     "from flash_sweep import bench_point; "
                     f"print('RESULT', bench_point({frames}, {batch}, "
                     f"{args.iters}, {impl!r}, {args.dtype!r}))"],
                    capture_output=True, text=True, timeout=3000)
            except subprocess.TimeoutExpired:
                # a hung tunnel / over-long Pallas compile is a result
                # for this point, not a reason to abort the sweep
                row[impl] = "failed: timeout after 3000s"
                continue
            out = [ln for ln in proc.stdout.splitlines()
                   if ln.startswith("RESULT ")]
            if proc.returncode == 0 and out:
                row[impl] = round(float(out[0].split()[1]), 1)
            else:
                err = (proc.stderr.strip().splitlines() or ["?"])[-1]
                row[impl] = f"failed: {err[:80]}"
        if all(isinstance(row.get(i), float) for i in ("dense", "flash")):
            row["flash_speedup"] = round(row["flash"] / row["dense"], 3)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
