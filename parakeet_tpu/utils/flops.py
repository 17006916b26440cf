"""FLOPs / MFU accounting for benchmarks.

FLOP counts come from XLA's own cost model on the compiled executable
(``jax.stages.Compiled.cost_analysis()['flops']``) — no hand-derived
formulas to drift out of sync with the model code.  Peak figures are
the published TPU v5e numbers; fp32 peak is approximated as half the
bf16 figure (fp32 matmul runs as multi-pass bf16 on the MXU).

CAVEAT (measured, round 4): XLA's cost model counts a while-loop BODY
ONCE, not multiplied by the trip count, so ``compiled_flops`` badly
under-reports any ``lax.scan``-dominated program — the WaveFlow sampler
(15 rows x 8 flows) reported 6.7% "MFU" while a hand count of the scan
bodies puts it at ~106 (fp32) / ~119 (bf16) achieved TF/s (54-61% of
bf16 peak; JAX default-precision fp32 matmuls run bf16 multiplies on
the MXU, so bf16 peak is the honest denominator either way).
Scan-dominated benchmarks must use the analytic counters below
(``waveflow_sampler_flops``, ``ar_decode_step_flops``) for their MFU
denominator.

The reference's own throughput protocol (avg_ips,
tests/benchmark/PWGAN/run_benchmark.sh:24-36) has no FLOPs denominator;
MFU is what lets "is it actually fast" be answered per benchmark.
"""
from __future__ import annotations

from typing import Optional

__all__ = ["compiled_flops", "chip_peak_flops", "mfu_stats",
           "fs2_pwg_synthesis_flops", "waveflow_sampler_flops",
           "ar_decode_step_flops"]

# published bf16 peak per chip
_PEAK_BF16 = {
    "v5 lite": 197e12,        # TPU v5e
    "v5e": 197e12,
    "v4": 275e12,
    "v5p": 459e12,
    "v6 lite": 918e12,        # TPU v6e (Trillium)
}
_DEFAULT_PEAK = 197e12


def compiled_flops(compiled) -> Optional[float]:
    """Total FLOPs of one call of a ``jax.jit(...).lower(...).compile()``
    executable, or None if the backend exposes no cost model."""
    try:
        ca = compiled.cost_analysis()
    except Exception:
        return None
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    flops = ca.get("flops")
    return float(flops) if flops else None


def chip_peak_flops(dtype: str = "bfloat16") -> float:
    """Peak FLOP/s of the current chip for ``dtype`` matmuls."""
    try:
        import jax
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        kind = ""
    peak = next((v for k, v in _PEAK_BF16.items() if k in kind),
                _DEFAULT_PEAK)
    if dtype in ("float32", "fp32"):
        peak = peak / 2.0
    return peak


def mfu_stats(flops_per_call: Optional[float], seconds_per_call: float,
              dtype: str = "float32") -> dict:
    """-> {"achieved_tflops": ..., "mfu_pct": ...} (zeros if unknown)."""
    if not flops_per_call or seconds_per_call <= 0:
        return {"achieved_tflops": 0.0, "mfu_pct": 0.0}
    achieved = flops_per_call / seconds_per_call
    return {
        "achieved_tflops": round(achieved / 1e12, 3),
        "mfu_pct": round(100.0 * achieved / chip_peak_flops(dtype), 2),
    }


def waveflow_sampler_flops(t_samples: int, *, n_flows: int = 8,
                           n_layers: int = 8, n_group: int = 16,
                           channels: int = 128, mel_bands: int = 80,
                           kernel_size=(3, 3)) -> float:
    """Analytic FLOPs of the WaveFlow inverse (sampling) pass.

    The sampler is (n_group - 1) scan steps per flow, each pushing one
    (W, kh*C) row through every layer's kw shifted tap matmuls plus the
    conditioning and output projections (models/waveflow.py
    Flow._inverse_step) — XLA's cost model counts that body once
    instead of 15x8 times, hence this hand count (cross-checked against
    a per-op profile, docs/tpu_performance.md round-4 note).
    """
    w = t_samples // n_group
    kh, kw = kernel_size
    c2 = 2 * channels
    per_layer = (kw * w * (kh * channels) * c2     # tap matmuls
                 + w * mel_bands * c2              # conditioning 1x1
                 + w * channels * c2)              # out projection
    per_row = n_layers * per_layer + w * channels * 2   # + skips@okern
    macs = per_row * (n_group - 1) * n_flows
    return 2.0 * macs


def ar_decode_step_flops(step_params_tree, attn_context_flops: float = 0.0
                         ) -> float:
    """Analytic per-step FLOPs of a batch-1 AR decode loop.

    With batch 1, every weight matrix the step touches is used in
    exactly one matvec, so step FLOPs = 2 x (total parameter elements
    of the step's modules) + the attention context terms (which scale
    with the attended length, passed via ``attn_context_flops``).
    XLA's cost model counts the scan body once (see module caveat).
    """
    import jax
    import numpy as np
    n = sum(int(np.prod(x.shape)) for x in
            jax.tree_util.tree_leaves(step_params_tree))
    return 2.0 * n + attn_context_flops


def fs2_pwg_synthesis_flops(fs2, pwg, fs2_vars, pwg_params, text,
                            text_lengths, noise, *, max_frames: int
                            ) -> Optional[float]:
    """MFU denominator for the FastSpeech2+PWGAN synthesis pipeline.

    XLA's cost model sees 0 FLOPs inside the fused Pallas PWG stack (a
    custom call), so this compiles the algorithmically-identical
    pure-XLA variant of the same program (``stack_impl='xla'``) and
    takes its count.  Shared by bench.py and
    benchmarks/serving_throughput.py so their denominators cannot
    drift apart.
    """
    import jax
    import jax.numpy as jnp

    pwg_xla = pwg.clone(stack_impl="xla")
    w = pwg.aux_context_window

    @jax.jit
    def synthesize_xla(fs2_vars, pwg_params, text, text_lengths, noise):
        out = fs2.apply(fs2_vars, text, text_lengths,
                        max_frames=max_frames,
                        method=type(fs2).inference)
        mel = jnp.pad(out["after_outs"], ((0, 0), (w, w), (0, 0)),
                      mode="edge")
        return pwg_xla.apply({"params": pwg_params}, noise, mel)[..., 0]

    return compiled_flops(synthesize_xla.lower(
        fs2_vars, pwg_params, text, text_lengths, noise).compile())
