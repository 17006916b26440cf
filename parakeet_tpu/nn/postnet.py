"""Postnet / Prenet modules shared by the acoustic models (flax).

Equivalents of the reference's Tacotron2-style pieces (reference:
parakeet/modules/tacotron2/decoder.py:21-160): the 5-conv residual Postnet
(used by Tacotron2, TransformerTTS, FastSpeech2) and the bottleneck Prenet.
NLC layout; BatchNorm runs with a mutable ``batch_stats`` collection when
training (``deterministic=False``).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["Postnet", "Prenet"]


class Postnet(nn.Module):
    """Residual refinement stack: conv1d (+BN) + tanh (except last layer)."""
    odim: int
    n_layers: int = 5
    n_chans: int = 512
    n_filts: int = 5
    dropout_rate: float = 0.5
    use_batch_norm: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, *, deterministic: bool = True):
        """(B, T, odim) -> (B, T, odim) residual correction."""
        h = xs
        for i in range(self.n_layers):
            last = i == self.n_layers - 1
            out_ch = self.odim if last else self.n_chans
            h = nn.Conv(out_ch, (self.n_filts,), padding="SAME",
                        use_bias=not self.use_batch_norm,
                        dtype=self.dtype, name=f"conv_{i}")(h)
            if self.use_batch_norm:
                h = nn.BatchNorm(use_running_average=deterministic,
                                 dtype=self.dtype, name=f"bn_{i}")(h)
            if not last:
                h = jnp.tanh(h)
            h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        return h


class Prenet(nn.Module):
    """Bottleneck MLP with always-on dropout.

    Dropout stays active even at inference — essential for Tacotron-family
    autoregressive stability (as in the reference decoder prenet), hence the
    dedicated ``always_dropout`` flag.
    """
    n_layers: int = 2
    n_units: int = 256
    dropout_rate: float = 0.5
    always_dropout: bool = True
    use_bias: bool = True  # Tacotron2's DecoderPreNet is bias-free
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, *, deterministic: bool = True):
        det = False if self.always_dropout else deterministic
        h = xs
        for i in range(self.n_layers):
            h = nn.Dense(self.n_units, use_bias=self.use_bias,
                         dtype=self.dtype, name=f"fc_{i}")(h)
            h = nn.relu(h)
            h = nn.Dropout(self.dropout_rate)(h, deterministic=det)
        return h
