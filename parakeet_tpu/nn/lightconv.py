"""Lightweight convolution (Wu et al. 2019), a self-attention
alternative for the transformer stack.

Equivalent of the reference module (reference:
parakeet/modules/fastspeech2_transformer/lightconv.py:27): GLU input
projection -> depthwise conv with ``wshare`` softmax-normalized shared
kernels -> output projection.  Expressed as a banded einsum over a
statically unfolded window (TPU-friendly: one matmul-like contraction,
no per-step gather).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["LightweightConvolution"]


class LightweightConvolution(nn.Module):
    wshare: int = 4
    n_feat: int = 256
    kernel_size: int = 31
    dropout_rate: float = 0.0
    use_kernel_mask: bool = False   # causal masking for decoders
    use_bias: bool = False

    @nn.compact
    def __call__(self, query, key, value, mask=None, *,
                 deterministic: bool = True):
        """query/key/value: (B, T, n_feat) with query==value in the
        reference usage; mask (B, 1, T) with True = keep."""
        del key
        b, t, _ = query.shape
        h = self.wshare
        k = self.kernel_size
        x = nn.Dense(2 * self.n_feat, name="linear1")(query)
        x = x[..., :self.n_feat] * nn.sigmoid(x[..., self.n_feat:])  # GLU

        weight = self.param("weight", nn.initializers.lecun_normal(),
                            (h, k))
        weight = nn.softmax(weight, axis=-1)
        weight = nn.Dropout(self.dropout_rate)(
            weight, deterministic=deterministic)
        if self.use_kernel_mask:
            # causal: zero taps that look ahead (kernel center = current)
            causal = jnp.arange(k) <= (k - 1) // 2
            weight = weight * causal
            weight = weight / jnp.clip(weight.sum(-1, keepdims=True),
                                       1e-8, None)

        # depthwise shared conv: channel c uses kernel c % wshare
        # (tile, not repeat: ESPnet's view(-1, H, T) interleaves heads)
        if mask is not None:
            x = x * mask.transpose(0, 2, 1).astype(x.dtype)
        pad = (k - 1) // 2
        xp = jnp.pad(x, ((0, 0), (pad, k - 1 - pad), (0, 0)))
        # window view via static shifts: y[t] = sum_j w[j] * x[t + j - pad]
        y = jnp.zeros_like(x)
        ch_kernel = jnp.tile(weight, (self.n_feat // h, 1))       # (C, k)
        for j in range(k):
            y = y + xp[:, j:j + t, :] * ch_kernel[:, j]
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros,
                               (self.n_feat,))
        return nn.Dense(self.n_feat, name="linear2")(y)
