"""Masked / weighted loss primitives and guided-attention losses.

Functional JAX equivalents of the reference's loss helpers
(reference: parakeet/modules/losses.py:26-125).  All are pure functions over
arrays; masks are float or bool arrays broadcastable to the loss term.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .masking import sequence_mask

__all__ = [
    "weighted_mean", "masked_l1_loss", "masked_l2_loss",
    "masked_softmax_cross_entropy", "attention_guide",
    "guided_attention_loss", "stop_token_bce",
]


def weighted_mean(x: jnp.ndarray, weight: jnp.ndarray) -> jnp.ndarray:
    """sum(x * w) / sum(w), with w broadcast against x.

    When ``weight`` broadcasts over extra axes of ``x`` the denominator is
    scaled accordingly so the result is a true mean over unmasked elements
    (reference: parakeet/modules/losses.py:60-77).
    """
    weight = weight.astype(x.dtype)
    broadcast_ratio = x.size / max(weight.size, 1)
    denom = jnp.sum(weight) * broadcast_ratio
    return jnp.sum(x * weight) / jnp.maximum(denom, 1e-12)


def masked_l1_loss(pred: jnp.ndarray, target: jnp.ndarray,
                   mask: jnp.ndarray) -> jnp.ndarray:
    return weighted_mean(jnp.abs(pred - target), mask)


def masked_l2_loss(pred: jnp.ndarray, target: jnp.ndarray,
                   mask: jnp.ndarray) -> jnp.ndarray:
    return weighted_mean(jnp.square(pred - target), mask)


def masked_softmax_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                                 mask: jnp.ndarray,
                                 axis: int = -1) -> jnp.ndarray:
    """Cross entropy with integer labels, mean over masked positions."""
    logp = jax.nn.log_softmax(logits, axis=axis)
    ce = -jnp.take_along_axis(logp, labels[..., None], axis=axis)[..., 0]
    return weighted_mean(ce, mask)


def stop_token_bce(logits: jnp.ndarray, labels: jnp.ndarray,
                   mask: jnp.ndarray | None = None,
                   pos_weight: float | jnp.ndarray = 1.0) -> jnp.ndarray:
    """Binary cross entropy with logits + positive-class weighting.

    Used for stop-token prediction in AR models (reference:
    parakeet/models/transformer_tts/transformer_tts.py:801 uses
    ``binary_cross_entropy_with_logits`` with ``pos_weight``).
    """
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    per = -(pos_weight * labels * log_p + (1.0 - labels) * log_not_p)
    if mask is None:
        return jnp.mean(per)
    return weighted_mean(per, mask)


def attention_guide(dec_lens: jnp.ndarray, enc_lens: jnp.ndarray,
                    n_dec: int, n_enc: int, g: float,
                    dtype=jnp.float32) -> jnp.ndarray:
    """Guided-attention penalty matrix W, shape (B, n_dec, n_enc).

    W[i, n, t] = 1 - exp(-((n / dec_len_i - t / enc_len_i)^2) / (2 g^2)),
    zeroed outside valid (dec, enc) spans.  Tachibana et al. 2017; reference:
    parakeet/modules/losses.py:26-47.
    """
    dec_pos = jnp.arange(n_dec, dtype=dtype)[None, :] / dec_lens[:, None]
    enc_pos = jnp.arange(n_enc, dtype=dtype)[None, :] / enc_lens[:, None]
    w = 1.0 - jnp.exp(
        -((dec_pos[:, :, None] - enc_pos[:, None, :]) ** 2) / (2 * g * g))
    mask = (sequence_mask(dec_lens, n_dec)[:, :, None]
            & sequence_mask(enc_lens, n_enc)[:, None, :])
    return w * mask.astype(dtype)


def guided_attention_loss(attn: jnp.ndarray, dec_lens: jnp.ndarray,
                          enc_lens: jnp.ndarray, g: float) -> jnp.ndarray:
    """Mean over batch of sum(W * A) / (dec_len * enc_len).

    ``attn``: (B, n_dec, n_enc) attention weights.
    """
    _, n_dec, n_enc = attn.shape
    w = attention_guide(dec_lens, enc_lens, n_dec, n_enc, g, attn.dtype)
    total = (dec_lens * enc_lens).astype(attn.dtype)
    return jnp.mean(jnp.sum(w * attn, axis=(1, 2)) / total)
