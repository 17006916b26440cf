"""End-to-end synthesis benchmark: FastSpeech2 -> Parallel WaveGAN.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric of record (BASELINE.md): end-to-end synthesis real-time factor
(RTF = synthesis_time / audio_duration) for the reference-default
FastSpeech2 (384-dim, text -> 80-mel @ 24 kHz hop 300) followed by the
reference-default PWGGenerator (30 layers, x300 upsampling).  Baseline
target is RTF 0.01 (BASELINE.json, v4-8); vs_baseline = 0.01 / measured
(>1 means better than the target).
"""
import argparse
import json
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--dtype", default="bfloat16",
                        choices=("float32", "bfloat16"),
                        help="compute dtype (params/losses stay fp32). "
                             "bfloat16 is the blessed TPU serving dtype "
                             "(wav parity vs fp32 pinned by "
                             "tests/test_e2e_bf16.py); measured RTF "
                             "0.00172 vs 0.00191 fp32 (same session; "
                             "fp32 run-to-run 0.00179-0.00191)")
    cli = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from parakeet_tpu.models import FastSpeech2, PWGGenerator
    from parakeet_tpu.models.fastspeech2 import FastSpeech2 as FS2

    dt = jnp.bfloat16 if cli.dtype == "bfloat16" else jnp.float32
    sr, hop = 24000, 300
    max_frames = 896  # ~11.2 s of audio capacity
    text_len = 128

    fs2 = FastSpeech2(idim=80, odim=80, adim=384, aheads=4, elayers=4,
                      eunits=1536, dlayers=4, dunits=1536, dtype=dt)
    pwg = PWGGenerator(layers=30, stacks=3, residual_channels=64,
                       gate_channels=128, skip_channels=64,
                       upsample_scales=(5, 6, 10),  # 300x for hop 300
                       aux_context_window=2, dtype=dt)

    rng = np.random.default_rng(0)
    text = jnp.asarray(rng.integers(1, 80, (1, text_len)).astype(np.int64))
    text_lengths = jnp.asarray(np.array([text_len], np.int64))
    key = jax.random.PRNGKey(0)
    # jit the inits: uncompiled tracing executes op-by-op on the device
    # (~100 s over the axon tunnel); one compiled program takes seconds
    fs2_vars = jax.jit(lambda k, t, l: fs2.init(
        {"params": k}, t, l, max_frames=max_frames,
        method=FS2.inference))(key, text, text_lengths)
    noise = jnp.zeros((1, max_frames * hop, 1), jnp.float32)
    mel_probe = jnp.zeros((1, max_frames + 4, 80), jnp.float32)
    pwg_vars = jax.jit(pwg.init)(jax.random.PRNGKey(1), noise, mel_probe)

    @jax.jit
    def synthesize(fs2_variables, pwg_params, text, text_lengths, noise):
        out = fs2.apply(fs2_variables, text, text_lengths,
                        max_frames=max_frames, method=FS2.inference)
        mel = out["after_outs"]
        mel = jnp.pad(mel, ((0, 0), (2, 2), (0, 0)), mode="edge")
        wav = pwg.apply({"params": pwg_params}, noise, mel)
        # next-iteration noise carrying a data dependency on wav, so
        # chained timing loops cannot be elided (computed in-graph: eager
        # glue between iterations costs ~15 ms/op on the remote backend)
        next_noise = noise * (1.0 + 0.0 * jnp.mean(wav))
        return wav[..., 0], out["frame_lengths"], next_noise

    noise0 = jax.random.normal(jax.random.PRNGKey(2), noise.shape)
    args = (fs2_vars, pwg_vars["params"], text, text_lengths, noise0)
    from parakeet_tpu.utils.flops import (fs2_pwg_synthesis_flops,
                                          mfu_stats)
    flops = fs2_pwg_synthesis_flops(fs2, pwg, fs2_vars,
                                    pwg_vars["params"], text,
                                    text_lengths, noise0,
                                    max_frames=max_frames)
    # warmup / compile; the host fetch also forces real execution (on the
    # axon remote backend block_until_ready alone does not synchronize
    # until the process has fetched at least once)
    wav, frame_lengths, nz = synthesize(*args)
    assert bool(np.isfinite(np.asarray(wav)).all()), "non-finite output"

    # warmup rep: the first chained run after compile still carries
    # one-time device cost (docs/tpu_performance.md checklist item 4)
    for _ in range(3):
        wav, frame_lengths, nz = synthesize(fs2_vars, pwg_vars["params"],
                                            text, text_lengths, nz)
    np.asarray(wav)

    # chained timing: each iteration's noise depends on the previous wav
    # (prevents elision), with ONE host fetch at the end — measures true
    # device throughput without per-call tunnel-sync overhead
    iters = 10
    tic = time.perf_counter()
    for _ in range(iters):
        wav, frame_lengths, nz = synthesize(fs2_vars, pwg_vars["params"],
                                            text, text_lengths, nz)
    np.asarray(wav)
    elapsed = (time.perf_counter() - tic) / iters

    audio_seconds = wav.shape[-1] / sr
    rtf = elapsed / audio_seconds
    baseline_rtf = 0.01
    print(json.dumps({
        "metric": "fastspeech2_pwgan_e2e_rtf",
        "value": round(rtf, 6),
        "unit": "rtf",
        "vs_baseline": round(baseline_rtf / rtf, 3),
        "dtype": cli.dtype,
        **mfu_stats(flops, elapsed, cli.dtype),
    }))


if __name__ == "__main__":
    main()
