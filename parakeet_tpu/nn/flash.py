"""Flash-attention core for training-time self/cross attention.

The dense attention path materializes (B, H, Tq, Tk) score/weight
tensors in HBM (plus an equally sized dropout mask when attention
dropout is on) — for FastSpeech2 frame-rate decoding (T ~ 640-900)
that traffic, not FLOPs, dominates the attention cost of a train step.
This module adapts the Pallas TPU flash-attention kernel (fused online
softmax, custom VJP, scores never leave VMEM) to the ``attn_core``
interface of ``nn.transformer.MultiHeadAttention``:

    core(q, k, v, mask) -> out        # q,k,v: (B, T, H, dk)

Padding masks are converted to the kernel's segment-id form, so any
mask that factorizes into per-row validity (everything the TTS models
use) is exact.  Like every custom core, it skips attention-weight
dropout (MultiHeadAttention raises if a nonzero rate would silently be
lost) and returns no attention weights — use the dense path when you
need alignment plots or guided-attention losses.

Semantics match the dense core: same masking (True = attendable), same
1/sqrt(dk) scaling, fp32 softmax accumulation.  Parity is tested on the
CPU interpreter in tests/test_flash_attention.py.

Reference counterpart: the plain softmax attention of
parakeet/modules/fastspeech2_transformer/attention.py:24-88 (the
reference has no fused-attention path).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

__all__ = ["make_flash_attn_core", "make_auto_attn_core",
           "flash_attention_available"]

# Measured crossover on the TPU v5e (benchmarks/flash_sweep.py, fp32
# FastSpeech2 train steps at constant tokens): dense wins at T=512
# (flash 0.90x), flash wins from T=1024 up (1.15x at 1024, 1.38x at
# 2048, 1.66x at 4096; at 8192 dense OOMs while flash runs).  1024 is
# the first measured-win point, so 'auto' switches there.
AUTO_FLASH_MIN_T = 1024


def flash_attention_available() -> bool:
    try:
        from jax.experimental.pallas.ops.tpu import flash_attention  # noqa
        return True
    except ImportError:  # pragma: no cover - always present on this jax
        return False


def _seq_block(t: int, cap: int = 512) -> int:
    """Largest supported seq block size <= ``cap`` dividing ``t``
    (t % 128 == 0).  The kernel requires block sizes that divide the
    padded sequence length, so a user ``seq_block`` acts as a cap, not
    a hard value."""
    for b in (512, 256, 128):
        if b <= cap and t % b == 0:
            return b
    raise ValueError(
        f"no block size <= {cap} divides padded length {t} "
        "(need seq_block in {128, 256, 512} and length % 128 == 0)")


def _validity(mask, b, tq, tk, dtype=jnp.int32):
    """Factorize a padding mask into per-row q/kv validity (B, T).

    ``mask``: bool, True = attendable, broadcastable to (B, 1, Tq, Tk)
    (ndim 3 means (B, 1, Tk), as MultiHeadAttention accepts).  A
    position is q-valid if it may attend to anything, kv-valid if
    anything may attend to it — exact for padding masks (the only kind
    the TTS models feed self/cross attention).
    """
    if mask is None:
        ones_q = jnp.ones((b, tq), dtype)
        ones_k = jnp.ones((b, tk), dtype)
        return ones_q, ones_k
    if mask.ndim == 3:
        mask = mask[:, None]
    mask = jnp.broadcast_to(mask, (b, 1, tq, tk))[:, 0]
    q_valid = jnp.any(mask, axis=2).astype(dtype)
    kv_valid = jnp.any(mask, axis=1).astype(dtype)
    return q_valid, kv_valid


def make_flash_attn_core(*, seq_block: int | None = None):
    """Build an ``attn_core`` running the Pallas TPU flash kernel.

    ``seq_block``: cap the sequence block size (128/256/512); the kernel
    needs blocks that divide the padded lengths, so the largest
    divisor <= the cap is used.  Off-TPU the
    kernel runs in the Pallas interpreter (tests); on TPU it compiles
    to Mosaic.
    """
    from jax.experimental.pallas import tpu as pltpu
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    def core(q, k, v, mask=None):
        b, tq, h, dk = q.shape
        tk = k.shape[1]
        tq_p = -(-tq // 128) * 128
        tk_p = -(-tk // 128) * 128
        cap = seq_block or 512
        bq = _seq_block(tq_p, cap)
        bk = _seq_block(tk_p, cap)
        blocks = fa.BlockSizes(
            block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
            block_q_major_dkv=bq, block_k_major_dkv=bk, block_k_dkv=bk,
            block_q_dkv=bq, block_k_major_dq=bk, block_k_dq=bk,
            block_q_dq=bq)

        q_valid, kv_valid = _validity(mask, b, tq, tk)
        q_valid = jnp.pad(q_valid, ((0, 0), (0, tq_p - tq)))
        kv_valid = jnp.pad(kv_valid, ((0, 0), (0, tk_p - tk)))
        seg = fa.SegmentIds(q=q_valid, kv=kv_valid)

        def to_heads(x, t_p):
            x = jnp.pad(x, ((0, 0), (0, t_p - x.shape[1]),
                            (0, 0), (0, 0)))
            return jnp.swapaxes(x, 1, 2)            # (B, H, T_p, dk)

        out = fa.flash_attention(
            to_heads(q, tq_p), to_heads(k, tk_p), to_heads(v, tk_p),
            segment_ids=seg, sm_scale=1.0 / math.sqrt(dk),
            block_sizes=blocks)
        return jnp.swapaxes(out, 1, 2)[:, :tq]      # (B, Tq, H, dk)

    def dispatch(q, k, v, mask=None):
        if jax.default_backend() not in ("tpu", "axon"):
            _enable_cpu_interpret(pltpu)
        return core(q, k, v, mask)

    return dispatch


def make_auto_attn_core(*, threshold: int = AUTO_FLASH_MIN_T,
                        seq_block: int | None = None):
    """Crossover-aware ``attn_core``: flash above ``threshold`` (both
    sequence lengths — the measured win regime), dense below (returns
    None, which MultiHeadAttention treats as "use the dense path").

    The returned core sets ``dense_fallback = True`` so
    MultiHeadAttention falls back to dense — instead of raising — for
    the configurations a custom core cannot serve (KV-cached decode,
    training with attention-weight dropout).  Net effect: ``attn_impl:
    'auto'`` never loses to either fixed choice at any reachable
    configuration (docs/tpu_performance.md crossover table).
    """
    flash = make_flash_attn_core(seq_block=seq_block)

    def dispatch(q, k, v, mask=None):
        if q.shape[1] < threshold or k.shape[1] < threshold:
            return None
        return flash(q, k, v, mask)

    dispatch.dense_fallback = True
    return dispatch


_cpu_interpret_stack = None


def _enable_cpu_interpret(pltpu):
    """Turn on Pallas TPU interpret mode for the rest of the process.

    The flash kernel's custom-VJP backward is traced after the forward
    call returns, so a ``with force_tpu_interpret_mode():`` scoped to
    the forward would not cover it — off-TPU (tests, CPU smoke runs)
    the mode is enabled once and left on.  Production TPU runs never
    enter here.
    """
    global _cpu_interpret_stack
    if _cpu_interpret_stack is None:
        import contextlib
        _cpu_interpret_stack = contextlib.ExitStack()
        _cpu_interpret_stack.enter_context(
            pltpu.force_tpu_interpret_mode())
