#!/usr/bin/env python
"""Isolated A/B timing of the PWG discriminator tail (round-5 autopsy).

Locates where the bf16 fused-disc regression lives by timing, at the
training shape (bs6, T=25500), each disc-tail configuration alone:

  - XLA shifted-matmul tail, fwd and fwd+bwd, fp32 and bf16 operands
  - fused Pallas tail fwd, and fwd+bwd under both VJP designs

Timing protocol: chained iterations with one final fetch (CLAUDE.md),
one throwaway chained rep after compile.

Usage: PYTHONPATH=.:/root/.axon_site python tools/bench_disc_tail.py
           [--batch-size 6] [--t 25500] [--iters 50]
"""
import argparse
import json
import time

import numpy as np


def chain_time(fn, args, iters):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    # throwaway chained reps (the first chained rep after compile
    # carries ~10x one-time device cost — CLAUDE.md lore)
    o = None
    for _ in range(3):
        o = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[0])
    tic = time.perf_counter()
    acc = None
    for _ in range(iters):
        o = fn(*args)
        leaf = jax.tree_util.tree_leaves(o)[0]
        acc = leaf.ravel()[0] if acc is None else acc + leaf.ravel()[0]
    np.asarray(acc)
    return (time.perf_counter() - tic) / iters * 1e3


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--batch-size", type=int, default=6)
    parser.add_argument("--t", type=int, default=25500)
    parser.add_argument("--iters", type=int, default=50)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from parakeet_tpu.models.parallel_wavegan import conv1d_taps
    from parakeet_tpu.ops.pallas.pwg_disc import (DISC_TAIL_DILS,
                                                  fused_disc_tail)

    rng = np.random.default_rng(0)
    b, t = args.batch_size, args.t
    h = jnp.asarray(rng.normal(size=(b, t, 64)) * 0.3, jnp.float32)
    ct = jnp.asarray(rng.normal(size=(b, t, 1)), jnp.float32)
    kernels = [jnp.asarray(rng.normal(size=(3, 64, 1 if j == 8 else 64))
                           / np.sqrt(192), jnp.float32)
               for j in range(9)]
    biases = [jnp.asarray(rng.normal(size=(1 if j == 8 else 64,)) * 0.05,
                          jnp.float32) for j in range(9)]

    def xla_tail(h, kernels, biases, dt):
        x = h.astype(dt)
        for j, d in enumerate(DISC_TAIL_DILS):
            x = conv1d_taps(x, kernels[j].astype(dt), d, "SAME") \
                + biases[j].astype(dt)
            if j < len(DISC_TAIL_DILS) - 1:
                x = jnp.where(x > 0, x, 0.2 * x)
        return x.astype(jnp.float32)

    results = {}
    for dt, name in ((jnp.float32, "xla_fp32"), (jnp.bfloat16, "xla_bf16")):
        fwd = jax.jit(lambda h: xla_tail(h, kernels, biases, dt))
        results[f"{name}_fwd_ms"] = round(chain_time(fwd, (h,), args.iters), 3)
        g = jax.jit(jax.grad(
            lambda h, ks, bs: jnp.sum(xla_tail(h, ks, bs, dt) * ct),
            argnums=(0, 1, 2)))
        results[f"{name}_fwdbwd_ms"] = round(
            chain_time(g, (h, kernels, biases), args.iters), 3)

    fwd_p = jax.jit(lambda h: fused_disc_tail(h, kernels, biases))
    results["pallas_fwd_ms"] = round(chain_time(fwd_p, (h,), args.iters), 3)
    for mode in ("recompute", "save"):
        g = jax.jit(jax.grad(
            lambda h, ks, bs: jnp.sum(fused_disc_tail(
                h, ks, bs, vjp_mode=mode) * ct), argnums=(0, 1, 2)))
        results[f"pallas_{mode}_fwdbwd_ms"] = round(
            chain_time(g, (h, kernels, biases), args.iters), 3)

    print(json.dumps({"metric": "disc_tail_ab_ms", "batch_size": b,
                      "t": t, **results}))


if __name__ == "__main__":
    main()
