"""Global Style Tokens (GST) style encoder (flax).

TPU-native equivalent of the reference's GST stack (reference:
parakeet/modules/style_encoder.py:24-308): a ReferenceEncoder (6 strided
conv2d + GRU over the time axis) distills a reference mel into one vector,
which attends over a bank of learned style tokens via multi-head attention;
the attended mixture is the style embedding.

TPU-first notes: the conv stack runs in NHWC (feature-last) layout, and the
GRU is a single ``nn.RNN`` scan; token attention is one batched einsum.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["ReferenceEncoder", "StyleTokenLayer", "StyleEncoder"]


class ReferenceEncoder(nn.Module):
    """Mel (B, T, n_mels) -> utterance vector (B, gru_units)."""
    conv_layers: int = 6
    conv_chans_list: tuple = (32, 32, 64, 64, 128, 128)
    conv_kernel_size: int = 3
    conv_stride: int = 2
    gru_layers: int = 1
    gru_units: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, speech):
        # (B, T, D) -> (B, T, D, 1) NHWC image
        x = speech[..., None]
        for i in range(self.conv_layers):
            x = nn.Conv(self.conv_chans_list[i],
                        (self.conv_kernel_size, self.conv_kernel_size),
                        strides=(self.conv_stride, self.conv_stride),
                        padding="SAME", use_bias=False, dtype=self.dtype,
                        name=f"conv_{i}")(x)
            x = nn.BatchNorm(use_running_average=True, dtype=self.dtype,
                             name=f"bn_{i}")(x)
            x = nn.relu(x)
        b, t, d, c = x.shape
        x = x.reshape(b, t, d * c)
        for i in range(self.gru_layers):
            x = nn.RNN(nn.GRUCell(self.gru_units, dtype=self.dtype),
                       name=f"gru_{i}")(x)
        return x[:, -1, :]


class StyleTokenLayer(nn.Module):
    """Attend a reference embedding over learned style tokens.

    ref_embs (B, ref_dim) -> style embedding (B, gst_token_dim).
    """
    gst_tokens: int = 10
    gst_token_dim: int = 256
    gst_heads: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, ref_embs):
        b = ref_embs.shape[0]
        tokens = self.param(
            "gst_tokens_param", nn.initializers.normal(stddev=0.5),
            (self.gst_tokens, self.gst_token_dim // self.gst_heads))
        keys = jnp.tanh(tokens)[None].repeat(b, axis=0)  # (B, n_tok, dk0)
        h, dk = self.gst_heads, self.gst_token_dim // self.gst_heads
        q = nn.DenseGeneral((h, dk), use_bias=False, dtype=self.dtype,
                            name="q")(ref_embs)               # (B, H, dk)
        k = nn.DenseGeneral((h, dk), use_bias=False, dtype=self.dtype,
                            name="k")(keys)                   # (B, n, H, dk)
        v = nn.DenseGeneral((h, dk), use_bias=False, dtype=self.dtype,
                            name="v")(keys)
        scores = jnp.einsum("bhd,bnhd->bhn", q, k) / jnp.sqrt(
            jnp.asarray(dk, jnp.float32)).astype(self.dtype)
        attn = nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhn,bnhd->bhd", attn, v).reshape(
            b, self.gst_token_dim)
        return out


class StyleEncoder(nn.Module):
    """ReferenceEncoder + StyleTokenLayer (reference style_encoder.py:24)."""
    gst_tokens: int = 10
    gst_token_dim: int = 256
    gst_heads: int = 4
    conv_layers: int = 6
    conv_chans_list: tuple = (32, 32, 64, 64, 128, 128)
    conv_kernel_size: int = 3
    conv_stride: int = 2
    gru_layers: int = 1
    gru_units: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, speech):
        ref_embs = ReferenceEncoder(
            self.conv_layers, self.conv_chans_list, self.conv_kernel_size,
            self.conv_stride, self.gru_layers, self.gru_units,
            dtype=self.dtype, name="ref_enc")(speech)
        return StyleTokenLayer(self.gst_tokens, self.gst_token_dim,
                               self.gst_heads, dtype=self.dtype,
                               name="stl")(ref_embs)
