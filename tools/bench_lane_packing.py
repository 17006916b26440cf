#!/usr/bin/env python
"""MXU K-width microbenchmark: the fused disc's 64-lane dots vs
128-lane packing (round-5 autopsy, VERDICT item 1 variant 2).

The fused discriminator kernel (ops/pallas/pwg_disc.py) issues
(W, 64) @ (64, 64) per-tap dots — half the MXU's 128 K lanes.  A
"two-row 128-lane packing" would process two batch rows per grid
step as one (W, 128) @ (128, 128) block-diagonal dot: 2x the nominal
FLOPs (the off-diagonal zeros are multiplied anyway) but full lane
occupancy.  Whether that wins depends on whether a K=64 dot costs the
same MXU passes as a K=128 dot of equal output shape.

This measures exactly that, with the timing-pitfall protocol
(docs/tpu_performance.md): N unrolled dots with perturbed inputs
inside ONE jitted program, divided by N — per-execute dispatch
overhead stays out of the numbers.

Shapes mirror the kernel's per-block work: W = 4160 (block 4096 +
halo 64), 24 dots per block-row (8 layers x 3 taps).

Usage: PYTHONPATH=.:/root/.axon_site python tools/bench_lane_packing.py
"""
import argparse
import json
import time

import numpy as np


def unrolled_ms(make_step, x0, n, reps):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def prog(x):
        for i in range(n):
            x = make_step(x, i)
        return jnp.sum(x.astype(jnp.float32))

    out = prog(x0)
    jax.block_until_ready(out)
    acc = None
    for _ in range(3):                      # throwaway chained reps
        acc = prog(x0)
    np.asarray(acc)
    tic = time.perf_counter()
    for _ in range(reps):
        acc = acc + prog(x0)
    np.asarray(acc)
    return (time.perf_counter() - tic) / (reps * n) * 1e3


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--w", type=int, default=4160)
    parser.add_argument("--n", type=int, default=24,
                        help="unrolled dots per program (8 layers x 3 "
                             "taps of one kernel block)")
    parser.add_argument("--reps", type=int, default=50)
    args = parser.parse_args()

    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    w = args.w
    w64 = jnp.asarray(rng.normal(size=(64, 64)) / 8, jnp.bfloat16)
    w128 = jnp.asarray(rng.normal(size=(128, 128)) / 8, jnp.bfloat16)
    x64 = jnp.asarray(rng.normal(size=(w, 64)), jnp.bfloat16)
    x128 = jnp.asarray(rng.normal(size=(w, 128)), jnp.bfloat16)

    def step64(x, i):
        y = jnp.dot(x, w64, preferred_element_type=jnp.float32)
        return (y * (1.0 + 1e-6 * i)).astype(jnp.bfloat16)

    def step128(x, i):
        y = jnp.dot(x, w128, preferred_element_type=jnp.float32)
        return (y * (1.0 + 1e-6 * i)).astype(jnp.bfloat16)

    ms64 = unrolled_ms(step64, x64, args.n, args.reps)
    ms128 = unrolled_ms(step128, x128, args.n, args.reps)

    # one 128-dot carries TWO rows' work (block-diagonal packing):
    # packed per-row cost = ms128 / 2
    print(json.dumps({
        "metric": "disc_lane_packing_ms_per_dot",
        "w": w, "dots_per_prog": args.n,
        "k64_ms": round(ms64, 5),
        "k128_ms": round(ms128, 5),
        "packed_per_row_ms": round(ms128 / 2, 5),
        "packing_speedup": round(ms64 / (ms128 / 2), 3)}))


if __name__ == "__main__":
    main()
