"""Variance predictors for non-autoregressive acoustic models (flax).

Equivalents of the reference's predictors (reference:
parakeet/modules/fastspeech2_predictor/duration_predictor.py:22-184,
variance_predictor.py:24), in NLC layout with no transposes.  The duration
predictor trains in the log domain; ``inference=True`` returns linear-domain
integer durations (clip(round(exp(x) - offset), 0)).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["DurationPredictor", "VariancePredictor", "VarianceEmbedding",
           "duration_predictor_loss"]


class _ConvStack(nn.Module):
    """(conv1d -> relu -> LayerNorm -> dropout) x n, then linear to 1."""
    n_layers: int
    n_chans: int
    kernel_size: int
    dropout_rate: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, *, deterministic: bool = True):
        h = xs
        for i in range(self.n_layers):
            h = nn.Conv(self.n_chans, (self.kernel_size,), padding="SAME",
                        dtype=self.dtype, name=f"conv_{i}")(h)
            h = nn.relu(h)
            h = nn.LayerNorm(dtype=self.dtype, name=f"norm_{i}")(h)
            h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        return nn.Dense(1, dtype=self.dtype, name="linear")(h)[..., 0]


class DurationPredictor(nn.Module):
    """Predicts log-durations (train) or integer durations (inference)."""
    n_layers: int = 2
    n_chans: int = 384
    kernel_size: int = 3
    dropout_rate: float = 0.1
    offset: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, pad_mask=None, *, inference: bool = False,
                 deterministic: bool = True):
        out = _ConvStack(self.n_layers, self.n_chans, self.kernel_size,
                         self.dropout_rate, dtype=self.dtype,
                         name="stack")(xs, deterministic=deterministic)
        if inference:
            out = jnp.clip(jnp.round(jnp.exp(out) - self.offset), 0, None)
        if pad_mask is not None:
            out = jnp.where(pad_mask, 0.0, out)
        return out


class VariancePredictor(nn.Module):
    """Pitch/energy predictor; returns (B, T, 1)."""
    n_layers: int = 2
    n_chans: int = 384
    kernel_size: int = 3
    dropout_rate: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, pad_mask=None, *, deterministic: bool = True):
        out = _ConvStack(self.n_layers, self.n_chans, self.kernel_size,
                         self.dropout_rate, dtype=self.dtype,
                         name="stack")(xs, deterministic=deterministic)
        out = out[..., None]
        if pad_mask is not None:
            out = jnp.where(pad_mask, 0.0, out)
        return out


class VarianceEmbedding(nn.Module):
    """conv1d + dropout embedding of a scalar track (pitch/energy)."""
    out_dim: int
    kernel_size: int = 9
    dropout_rate: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, *, deterministic: bool = True):
        h = nn.Conv(self.out_dim, (self.kernel_size,), padding="SAME",
                    dtype=self.dtype, name="conv")(xs)
        return nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)


def duration_predictor_loss(pred_log_durations, target_durations, mask=None,
                            offset: float = 1.0):
    """MSE in log domain (reference: duration_predictor.py:140-184)."""
    target = jnp.log(target_durations.astype(jnp.float32) + offset)
    sq = jnp.square(pred_log_durations - target)
    if mask is None:
        return jnp.mean(sq)
    mask = mask.astype(sq.dtype)
    return jnp.sum(sq * mask) / jnp.maximum(jnp.sum(mask), 1.0)
