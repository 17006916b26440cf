"""On-device length regulation (duration -> frame expansion).

The reference builds a 0/1 expansion matrix on the host in numpy every step
(reference: parakeet/modules/fastspeech2_predictor/length_regulator.py:33-76,
parakeet/modules/expansion.py:19) — a device round-trip per batch.  Here the
expansion stays on device and jit-compiles: frame t belongs to the token i
with cumsum(durations)[i-1] <= t < cumsum(durations)[i], found with
searchsorted; frames beyond sum(durations) are masked out.  Output length is
a static ``max_len`` so the computation has fixed shapes under jit.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["length_regulate", "gaussian_upsample"]


def length_regulate(encodings: jnp.ndarray,
                    durations: jnp.ndarray,
                    max_len: int,
                    alpha: float | jnp.ndarray = 1.0
                    ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Expand token encodings into frames according to durations.

    Parameters
    ----------
    encodings : (B, L, D) token-level features.
    durations : (B, L) int frame counts per token.
    max_len : static output frame capacity.
    alpha : speed control; durations are scaled by alpha then rounded
        (alpha != 1 only sensible for already-predicted durations).

    Returns
    -------
    frames : (B, max_len, D) expanded features, zero past the total length.
    frame_lengths : (B,) actual number of valid frames per item.
    """
    if not (isinstance(alpha, (int, float)) and alpha == 1.0):
        durations = jnp.round(durations.astype(jnp.float32) * alpha)
    durations = durations.astype(jnp.int32)
    cum = jnp.cumsum(durations, axis=-1)                      # (B, L)
    total = cum[:, -1]                                        # (B,)
    t = jnp.arange(max_len, dtype=jnp.int32)                  # (T,)
    # token index for each output frame: first i with cum[i] > t
    token_idx = jnp.sum(t[None, :, None] >= cum[:, None, :],
                        axis=-1).astype(jnp.int32)            # (B, T)
    token_idx = jnp.clip(token_idx, 0, encodings.shape[1] - 1)
    frames = jnp.take_along_axis(
        encodings, token_idx[..., None], axis=1)              # (B, T, D)
    valid = (t[None, :] < total[:, None])
    frames = frames * valid[..., None].astype(frames.dtype)
    return frames, total


def gaussian_upsample(encodings: jnp.ndarray,
                      durations: jnp.ndarray,
                      max_len: int,
                      temperature: float = 10.0
                      ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Differentiable soft length regulation (Gaussian upsampling).

    An additive TPU-friendly alternative to hard expansion: each frame
    attends to tokens with weights softmax(-(t - c_i)^2 / temperature) where
    c_i is the token's center position.  Useful for end-to-end duration
    learning; not present in the reference.
    """
    durations = durations.astype(jnp.float32)
    cum = jnp.cumsum(durations, axis=-1)
    centers = cum - 0.5 * durations                           # (B, L)
    total = cum[:, -1]
    t = jnp.arange(max_len, dtype=jnp.float32) + 0.5          # (T,)
    logits = -jnp.square(t[None, :, None] - centers[:, None, :]) / temperature
    # mask padded tokens (zero duration)
    logits = jnp.where((durations > 0)[:, None, :], logits, -1e9)
    w = jnp.exp(logits - jnp.max(logits, axis=-1, keepdims=True))
    w = w / jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-9)
    frames = jnp.einsum("btl,bld->btd", w, encodings,
                        preferred_element_type=jnp.float32)
    valid = (jnp.arange(max_len)[None, :] < total[:, None])
    return frames * valid[..., None].astype(frames.dtype), total.astype(
        jnp.int32)
