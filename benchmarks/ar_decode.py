#!/usr/bin/env python
"""Autoregressive acoustic-model decode benchmarks.

The reference bounds Tacotron2 at max_decoder_steps=1000 AR steps per
utterance (reference: parakeet/models/tacotron2.py:474) and
TransformerTTS at 500 x reduction_factor.  This measures full
fixed-length scans (the jit-compiled decode programs) and reports
milliseconds per decoder step — the latency-critical inner loop of
interactive TTS.

Usage: python benchmarks/ar_decode.py [--steps 500] [--iters 3]
"""
import argparse
import json
import time

import numpy as np


def bench_tacotron2(steps, iters, dtype):
    import jax
    import jax.numpy as jnp
    from parakeet_tpu.models import Tacotron2

    from parakeet_tpu.training.config import resolve_model_kwargs
    dt = resolve_model_kwargs({"dtype": dtype})["dtype"]
    model = Tacotron2(vocab_size=80, dtype=dt)
    text = jnp.asarray(np.random.default_rng(0).integers(
        1, 80, (1, 96)).astype(np.int64))
    tl = jnp.asarray(np.array([96], np.int64))
    v = jax.jit(lambda k, d: model.init(
        {"params": k, "dropout": d}, text, tl, max_decoder_steps=8,
        method=Tacotron2.infer))(jax.random.PRNGKey(0),
                                 jax.random.PRNGKey(1))

    @jax.jit
    def infer(v, text, tl):
        # prenet dropout stays ON at inference (the Tacotron2 convention,
        # reference tacotron2.py:378-419)
        out = model.apply(v, text, tl, max_decoder_steps=steps,
                          rngs={"dropout": jax.random.PRNGKey(2)},
                          method=Tacotron2.infer)
        return out["mel_outputs_postnet"], out["lengths"]

    from parakeet_tpu.utils.flops import ar_decode_step_flops, mfu_stats
    # AOT-compile once; reuse the executable (avoids a second compile)
    infer = infer.lower(v, text, tl).compile()
    # analytic per-step count (XLA's model counts the scan body once,
    # utils/flops.py caveat); the LSA context term is 4*T_enc*d_att-ish
    # and negligible next to the 1024-wide LSTMs
    pp = v["params"]
    step_flops = ar_decode_step_flops(
        {k: pp[k] for k in ("cell", "prenet") if k in pp},
        attn_context_flops=4.0 * text.shape[1] * 128)
    flops = step_flops * steps
    mel, lengths = infer(v, text, tl)
    assert bool(np.isfinite(np.asarray(mel)).all())
    t = text
    # warmup rep: the first chained run after compile carries residual
    # one-time costs (device caches, tunnel) worth ~10x of steady state
    for i in range(iters):
        mel, lengths = infer(v, (t + i) % 79 + 1, tl)
    np.asarray(mel)
    tic = time.perf_counter()
    for i in range(iters):
        mel, lengths = infer(v, (t + i) % 79 + 1, tl)
    np.asarray(mel)
    elapsed = (time.perf_counter() - tic) / iters
    return elapsed / steps * 1000, mfu_stats(flops, elapsed, dtype)


def bench_transformer_tts(steps, iters, dtype, reduction_factor=1):
    import jax
    import jax.numpy as jnp
    from parakeet_tpu.models import TransformerTTS

    from parakeet_tpu.training.config import resolve_model_kwargs
    dt = resolve_model_kwargs({"dtype": dtype})["dtype"]
    model = TransformerTTS(idim=80, odim=80, dtype=dt,
                           reduction_factor=reduction_factor)
    text = jnp.asarray(np.random.default_rng(0).integers(
        1, 80, (1, 96)).astype(np.int64))
    tl = jnp.asarray(np.array([96], np.int64))
    v = jax.jit(lambda k, d: model.init(
        {"params": k, "dropout": d}, text, tl, max_decoder_steps=8,
        method=TransformerTTS.inference))(jax.random.PRNGKey(0),
                                          jax.random.PRNGKey(1))

    @jax.jit
    def infer(v, text, tl):
        out = model.apply(v, text, tl, max_decoder_steps=steps,
                          rngs={"dropout": jax.random.PRNGKey(2)},
                          method=TransformerTTS.inference)
        return out["mel"], out["lengths"]

    from parakeet_tpu.utils.flops import ar_decode_step_flops, mfu_stats
    # AOT-compile once; reuse the executable (avoids a second compile)
    infer = infer.lower(v, text, tl).compile()
    # analytic per-step count (utils/flops.py caveat): decode-loop
    # modules' params + the attention context terms over the KV cache
    # (t_max) and encoder memory (t_enc) per layer
    p = v["params"]
    step_tree = {k: p[k] for k in
                 ("decoder", "decoder_prenet", "decoder_prenet_proj",
                  "feat_out", "prob_out") if k in p}
    attn = model.dlayers * 4.0 * model.adim * (steps + text.shape[1])
    flops = ar_decode_step_flops(step_tree, attn) * steps
    mel, lengths = infer(v, text, tl)
    assert bool(np.isfinite(np.asarray(mel)).all())
    t = text
    # warmup rep: the first chained run after compile carries residual
    # one-time costs (device caches, tunnel) worth ~10x of steady state
    for i in range(iters):
        mel, lengths = infer(v, (t + i) % 79 + 1, tl)
    np.asarray(mel)
    tic = time.perf_counter()
    for i in range(iters):
        mel, lengths = infer(v, (t + i) % 79 + 1, tl)
    np.asarray(mel)
    elapsed = (time.perf_counter() - tic) / iters
    return elapsed / steps * 1000, mfu_stats(flops, elapsed, dtype)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--steps", type=int, default=500)
    parser.add_argument("--iters", type=int, default=3)
    parser.add_argument("--dtype", default="float32",
                        help="compute dtype (float32 | bfloat16); params "
                             "stay fp32")
    parser.add_argument("--models", nargs="+",
                        default=["tacotron2", "transformer_tts"])
    parser.add_argument("--reduction-factor", type=int, default=1,
                        help="transformer_tts frames per decode step "
                             "(reference transformer_tts.py:462-510 "
                             "thins the teacher frames by r)")
    args = parser.parse_args()

    # frames/s at the ljspeech config (22050 Hz, hop 256): the
    # acoustic-model-only RTF each step rate implies
    frame_rate = 22050 / 256

    for name in args.models:
        if name == "transformer_tts":
            ms, mfu = bench_transformer_tts(
                args.steps, args.iters, args.dtype,
                args.reduction_factor)
            r = args.reduction_factor
        else:
            ms, mfu = bench_tacotron2(args.steps, args.iters, args.dtype)
            r = 1
        am_rtf = (ms / 1000.0) * frame_rate / r
        print(json.dumps({"metric": f"{name}_decode_ms_per_step",
                          "value": round(ms, 4), "unit": "ms/step",
                          "dtype": args.dtype, "reduction_factor": r,
                          "am_only_rtf": round(am_rtf, 5), **mfu}))


if __name__ == "__main__":
    main()
