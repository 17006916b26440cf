#!/usr/bin/env python
"""PWGAN training-throughput benchmark (avg_ips, sequences/sec).

Equivalent of the reference benchmark protocol (reference:
tests/benchmark/PWGAN/run_benchmark.sh:24-36 + run_all.sh:34-50): run N
training iterations of the default-config Parallel WaveGAN at batch size
6 and 26 on synthetic data and report ``avg_ips = batch_size /
avg_batch_cost`` as parsed from the trainer log in the reference.

Timing is chained-with-final-fetch (the train step is donated/jitted;
per-iteration host sync would measure tunnel latency, not the device).

Usage:  python benchmarks/train_pwgan.py [--iters 100] [--batch-sizes 6 26]
"""
import argparse
import json
import time

import numpy as np


def bench_batch_size(batch_size: int, iters: int, dtype='float32',
                     stack_impl='auto', disc_impl='policy',
                     disc_vjp='save', profile=None):
    import jax
    import jax.numpy as jnp
    from parakeet_tpu.models import (PWGDiscriminator, PWGGenerator,
                                     init_pwg_train_state,
                                     make_pwg_train_step)
    from parakeet_tpu.training.optimizer import build_optimizer

    from parakeet_tpu.training.config import resolve_model_kwargs
    dt = resolve_model_kwargs({"dtype": dtype})["dtype"]
    gen = PWGGenerator(layers=30, stacks=3, residual_channels=64,
                       gate_channels=128, skip_channels=64,
                       upsample_scales=(4, 5, 3, 5), aux_context_window=2,
                       dtype=dt, stack_impl=stack_impl)
    # disc_impl='policy' reproduces the measured default routing
    # (docs/tpu_performance.md): fused kernel on the pallas path,
    # XLA otherwise.  Explicit 'pallas'/'xla' force one side for A/B
    # runs; disc_vjp selects the fused kernel's VJP design ('save'
    # streams per-layer inputs to HBM in the forward, 'recompute'
    # rebuilds them in the backward's VMEM — wins isolated, loses ~1%
    # at step level; both measured in docs/tpu_performance.md r5).
    if disc_impl == "policy":
        # defer to the Module's dtype-aware routing (fused kernel on
        # TPU+fp32+supported only; 'pallas'/'xla' below FORCE one side)
        disc_impl = "auto"
    disc = PWGDiscriminator(layers=10, conv_channels=64, dtype=dt,
                            impl=disc_impl, vjp_mode=disc_vjp)
    hop = gen.upsample_factor                      # 300
    batch_max_steps = 25500                        # reference config
    frames = batch_max_steps // hop
    rng = np.random.default_rng(0)
    batch = {
        "wav": jnp.asarray(rng.standard_normal(
            (batch_size, batch_max_steps)).astype(np.float32)),
        "mel": jnp.asarray(rng.standard_normal(
            (batch_size, frames + 4, 80)).astype(np.float32)),
    }

    key = jax.random.PRNGKey(0)
    noise = jnp.zeros((batch_size, batch_max_steps, 1))
    gv = jax.jit(gen.init)(key, noise, batch["mel"])
    dv = jax.jit(disc.init)(jax.random.PRNGKey(1), batch["wav"][..., None])
    gen_tx = build_optimizer("adam", 1e-4)
    disc_tx = build_optimizer("adam", 5e-5)
    state = init_pwg_train_state(gv["params"], dv["params"], gen_tx,
                                 disc_tx, jax.random.PRNGKey(2))
    step = make_pwg_train_step(gen, disc, gen_tx, disc_tx, lambda_adv=4.0,
                               discriminator_train_start_steps=0)

    from parakeet_tpu.utils.flops import compiled_flops, mfu_stats
    # AOT-compile once; reuse the executable (a plain step() call after
    # .lower().compile() would recompile — the jit dispatch cache is not
    # populated by AOT compilation)
    step = step.lower(state, batch).compile()
    flops = compiled_flops(step)
    if stack_impl == "pallas":
        # the fused stack is a custom call (0 FLOPs to XLA's cost
        # model); take the denominator from the algorithmically
        # identical pure-XLA lowering, as bench.py does
        step_xla = make_pwg_train_step(
            gen.clone(stack_impl="xla"), disc.clone(impl="xla"),
            gen_tx, disc_tx,
            lambda_adv=4.0, discriminator_train_start_steps=0)
        flops = compiled_flops(step_xla.lower(state, batch).compile())
    state, metrics = step(state, batch)            # first real execution
    np.asarray(metrics["generator_loss"])

    if profile:
        jax.profiler.start_trace(profile)
        for _ in range(3):
            state, metrics = step(state, batch)
        np.asarray(metrics["generator_loss"])
        jax.profiler.stop_trace()

    tic = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, batch)
    np.asarray(metrics["generator_loss"])
    avg_batch_cost = (time.perf_counter() - tic) / iters
    return batch_size / avg_batch_cost, mfu_stats(flops, avg_batch_cost,
                                                  dtype)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--batch-sizes", type=int, nargs="+",
                        default=[6, 26])
    parser.add_argument("--dtype", default="float32",
                        help="compute dtype (float32 | bfloat16); params "
                             "and loss stay fp32")
    parser.add_argument("--stack-impl", default="auto",
                        choices=("auto", "xla", "pallas"),
                        help="generator residual-stack implementation; "
                             "'pallas' trains through the fused custom-"
                             "VJP kernel (ops/pallas/pwg_stack_train.py)")
    parser.add_argument("--disc-impl", default="policy",
                        choices=("policy", "xla", "pallas"),
                        help="discriminator implementation; 'policy' "
                             "follows the measured default routing")
    parser.add_argument("--disc-vjp", default="save",
                        choices=("recompute", "save"),
                        help="fused-disc VJP design (A/B measurement; "
                             "'save' wins ~1% at step level, see "
                             "docs/tpu_performance.md round 5)")
    parser.add_argument("--profile", default=None, metavar="DIR",
                        help="capture a jax.profiler trace of 3 steps "
                             "into DIR (feed to tools/op_table.py)")
    parser.add_argument("--rng", default="threefry",
                        choices=("threefry", "rbg"),
                        help="device RNG algorithm (recipe knob: "
                             "rng_impl; see docs/tpu_performance.md r5)")
    args = parser.parse_args()

    from parakeet_tpu.training.seeding import configure_rng_impl
    configure_rng_impl(args.rng)

    for bs in args.batch_sizes:
        ips, mfu = bench_batch_size(bs, args.iters, args.dtype,
                                    args.stack_impl, args.disc_impl,
                                    args.disc_vjp, args.profile)
        print(json.dumps({"metric": "pwgan_train_avg_ips",
                          "batch_size": bs,
                          "value": round(ips, 3),
                          "unit": "sequences/sec",
                          "dtype": args.dtype,
                          "stack_impl": args.stack_impl,
                          "disc_impl": args.disc_impl,
                          "disc_vjp": args.disc_vjp, **mfu}))


if __name__ == "__main__":
    main()
