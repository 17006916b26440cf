"""Attention modules (flax).

TPU-native equivalents of the reference's attention toolbox (reference:
parakeet/modules/attention.py:22-348): functional scaled dot-product
attention, mono/multi-head wrappers, and the location-sensitive attention
used by the Tacotron2 aligner.

TPU-first notes:
- ``LocationSensitiveAttention`` is a *step* module: it scores one decoder
  query against the full (precomputed) processed keys and is designed to be
  called inside ``lax.scan`` — the location conv over the (B, T_enc, 2)
  previous/cumulative weights is a small depthwise conv that XLA fuses with
  the score matmul.
- keys are projected ONCE per utterance via :meth:`process_keys`, outside
  the scan, so the per-step work is one (B, T, d) elementwise + one
  (B, T) reduction — no repeated key matmuls (the reference recomputes
  the key projection per call, attention.py:307-314).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.masking import masked_fill

__all__ = [
    "scaled_dot_product_attention",
    "MonoheadAttention",
    "LocationSensitiveAttention",
]

_NEG_INF = -1e9


def scaled_dot_product_attention(q, k, v, mask=None, *, dropout_fn=None,
                                 drop_n_heads: int = 0, rng=None):
    """q (..., Tq, d), k (..., Tk, d), v (..., Tk, dv); mask broadcastable
    to (..., Tq, Tk) with True = keep (reference attention.py:22-64).

    ``drop_n_heads`` > 0 zeroes that many random heads per example
    (training regularizer; expects a leading (B, H, ...) layout and an
    ``rng``; reference attention.py:65-108 drop_head).
    """
    d = q.shape[-1]
    scores = jnp.einsum("...qd,...kd->...qk", q, k) / jnp.sqrt(
        jnp.asarray(d, q.dtype))
    if mask is not None:
        scores = masked_fill(scores, ~mask, _NEG_INF)
    weights = nn.softmax(scores, axis=-1)
    if dropout_fn is not None:
        weights = dropout_fn(weights)
    out = jnp.einsum("...qk,...kd->...qd", weights, v)
    if drop_n_heads > 0:
        if rng is None:
            raise ValueError("drop_n_heads requires an rng")
        b, h = out.shape[0], out.shape[1]
        # keep the (h - drop_n_heads) highest of h uniform draws per row
        scores_h = jax.random.uniform(rng, (b, h))
        kth = jnp.sort(scores_h, axis=1)[:, drop_n_heads - 1:drop_n_heads]
        keep = (scores_h > kth).astype(out.dtype)
        scale = h / max(h - drop_n_heads, 1)
        out = out * keep[:, :, None, None] * scale
    return out, weights


class MonoheadAttention(nn.Module):
    """Single-head projected attention (reference attention.py:112-177)."""
    model_dim: int
    dropout_rate: float = 0.0
    k_dim: Optional[int] = None
    v_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, mask=None, *, deterministic: bool = True):
        k_dim = self.k_dim or self.model_dim
        v_dim = self.v_dim or self.model_dim
        q = nn.Dense(k_dim, dtype=self.dtype, name="affine_q")(q)
        k = nn.Dense(k_dim, dtype=self.dtype, name="affine_k")(k)
        v = nn.Dense(v_dim, dtype=self.dtype, name="affine_v")(v)
        out, weights = scaled_dot_product_attention(q, k, v, mask)
        out = nn.Dense(self.model_dim, dtype=self.dtype, name="affine_o")(out)
        if self.dropout_rate:
            out = nn.Dropout(self.dropout_rate)(out,
                                                deterministic=deterministic)
        return out, weights


class LocationSensitiveAttention(nn.Module):
    """Location-sensitive additive attention, one decoder step at a time.

    Score(i) = v . tanh(W_q q + W_k k_i + W_f f_i), where f = conv1d over
    the stacked [previous, cumulative] attention weights (reference
    attention.py:258-348).  Use :meth:`process_keys` once per utterance and
    pass the result as ``processed_keys`` to each step call.
    """
    d_attention: int
    location_filters: int = 32
    location_kernel_size: int = 31
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.query_layer = nn.Dense(self.d_attention, use_bias=False,
                                    dtype=self.dtype)
        self.key_layer = nn.Dense(self.d_attention, use_bias=False,
                                  dtype=self.dtype)
        self.location_conv = nn.Conv(self.location_filters,
                                     (self.location_kernel_size,),
                                     padding="SAME", use_bias=False,
                                     dtype=self.dtype)
        self.location_layer = nn.Dense(self.d_attention, use_bias=False,
                                       dtype=self.dtype)
        self.value = nn.Dense(1, use_bias=False, dtype=self.dtype)

    def process_keys(self, keys):
        """(B, T, d_k) -> (B, T, d_attention); call once, outside the scan."""
        return self.key_layer(keys)

    def __call__(self, query, processed_keys, values, attention_weights,
                 cum_attention_weights, mask=None):
        """One alignment step.

        query: (B, d_q) decoder state; processed_keys: (B, T, d_att);
        values: (B, T, d_v) encoder outputs; attention_weights /
        cum_attention_weights: (B, T); mask: (B, T) True = valid.
        Returns (context (B, d_v), new_weights (B, T)).
        """
        processed_query = self.query_layer(query)[:, None, :]  # (B,1,d)
        location = jnp.stack(
            [attention_weights, cum_attention_weights], axis=-1)  # (B,T,2)
        processed_location = self.location_layer(
            self.location_conv(location))
        energies = self.value(
            jnp.tanh(processed_query + processed_keys +
                     processed_location)).squeeze(-1)  # (B, T)
        if mask is not None:
            energies = jnp.where(mask, energies, _NEG_INF)
        # softmax in fp32 (stable under bf16 compute), back to the
        # compute dtype so scan carries keep a fixed type
        weights = nn.softmax(energies.astype(jnp.float32),
                             axis=-1).astype(self.dtype)
        context = jnp.einsum(
            "bt,btd->bd", weights, values.astype(self.dtype))
        return context, weights
