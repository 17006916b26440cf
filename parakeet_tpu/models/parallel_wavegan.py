"""Parallel WaveGAN vocoder (generator + discriminators), TPU-native.

Behavioral equivalent of the reference (reference:
parakeet/models/parallel_wavegan/parallel_wavegan.py:26-790): a WaveNet-like
non-causal generator conditioned on upsampled mel, a dilated-conv
discriminator, and a residual (WaveNet-style) discriminator.  TPU-first
choices:

- NWC layout (time, channel-last) so every conv maps to XLA's native TPU
  convolution; no transposes anywhere.
- weight normalization via flax.linen.WeightNorm — fold-able into plain
  kernels for inference (the checkpoint converter performs the fold the
  reference does with remove_weight_norm, parallel_wavegan.py:474-496).
- generation is a single jit-compiled graph over a static number of frames;
  noise is passed explicitly (functional RNG) rather than sampled inside.
"""
from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["PWGGenerator", "PWGDiscriminator", "ResidualPWGDiscriminator",
           "pwg_inference"]


def _maybe_wn(conv: nn.Module, use_wn: bool, name: str) -> nn.Module:
    if use_wn:
        return nn.WeightNorm(conv, name=f"{name}_wn")
    return conv


class UpsampleNet(nn.Module):
    """Nearest-stretch + 2D conv per scale; mel (B, T, F) -> (B, T*prod, F)."""
    upsample_scales: Sequence[int]
    freq_axis_kernel_size: int = 1
    use_weight_norm: bool = True
    nonlinear_activation: Optional[str] = None
    nonlinear_activation_params: Dict[str, Any] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, c):
        # image layout: (B, T, F, 1)
        x = c[..., None]
        for i, scale in enumerate(self.upsample_scales):
            x = jnp.repeat(x, scale, axis=1)  # nearest along time
            kf = self.freq_axis_kernel_size
            conv = nn.Conv(1, (scale * 2 + 1, kf), padding="SAME",
                           use_bias=False, dtype=self.dtype,
                           name=f"conv_{i}")
            x = _maybe_wn(conv, self.use_weight_norm, f"conv_{i}")(x)
            if self.nonlinear_activation is not None:
                act = getattr(nn, self.nonlinear_activation.lower(), None) \
                    or getattr(jax.nn, self.nonlinear_activation.lower())
                x = act(x, **(self.nonlinear_activation_params or {}))
        return x[..., 0]


class ConvInUpsampleNet(nn.Module):
    """Context conv (VALID, trims 2*aux_context_window) then UpsampleNet.

    Input mel must carry ``aux_context_window`` extra frames on both sides
    (the VocoderClip collator provides them).
    """
    upsample_scales: Sequence[int]
    aux_channels: int = 80
    aux_context_window: int = 2
    freq_axis_kernel_size: int = 1
    use_weight_norm: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, c):
        k = 2 * self.aux_context_window + 1
        conv_in = nn.Conv(self.aux_channels, (k,), padding="VALID",
                          use_bias=False, dtype=self.dtype, name="conv_in")
        c = _maybe_wn(conv_in, self.use_weight_norm, "conv_in")(c)
        return UpsampleNet(
            self.upsample_scales, self.freq_axis_kernel_size,
            self.use_weight_norm, dtype=self.dtype, name="upsample")(c)


class ResidualBlock(nn.Module):
    """Gated dilated conv block with residual + skip outputs (NWC)."""
    kernel_size: int = 3
    residual_channels: int = 64
    gate_channels: int = 128
    skip_channels: int = 64
    aux_channels: Optional[int] = 80
    dilation: int = 1
    dropout: float = 0.0
    bias: bool = True
    use_weight_norm: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, c=None, *, deterministic: bool = True):
        residual = x
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        conv = nn.Conv(self.gate_channels, (self.kernel_size,),
                       kernel_dilation=(self.dilation,), padding="SAME",
                       use_bias=self.bias, dtype=self.dtype, name="conv")
        x = _maybe_wn(conv, self.use_weight_norm, "conv")(x)
        if c is not None and self.aux_channels is not None:
            aux = nn.Conv(self.gate_channels, (1,), use_bias=False,
                          dtype=self.dtype, name="conv1x1_aux")
            x = x + _maybe_wn(aux, self.use_weight_norm, "conv1x1_aux")(c)
        a, b = jnp.split(x, 2, axis=-1)
        x = jnp.tanh(a) * jax.nn.sigmoid(b)
        skip_conv = nn.Conv(self.skip_channels, (1,), use_bias=self.bias,
                            dtype=self.dtype, name="conv1x1_skip")
        out_conv = nn.Conv(self.residual_channels, (1,), use_bias=self.bias,
                           dtype=self.dtype, name="conv1x1_out")
        skip = _maybe_wn(skip_conv, self.use_weight_norm, "conv1x1_skip")(x)
        res = (_maybe_wn(out_conv, self.use_weight_norm, "conv1x1_out")(x)
               + residual) * math.sqrt(0.5)
        return res, skip


class PWGGenerator(nn.Module):
    """noise (B, T, 1) + mel (B, T', aux) -> waveform (B, T, 1).

    T = (T' - 2 * aux_context_window) * prod(upsample_scales).
    """
    in_channels: int = 1
    out_channels: int = 1
    kernel_size: int = 3
    layers: int = 30
    stacks: int = 3
    residual_channels: int = 64
    gate_channels: int = 128
    skip_channels: int = 64
    aux_channels: int = 80
    aux_context_window: int = 2
    dropout: float = 0.0
    bias: bool = True
    use_weight_norm: bool = True
    upsample_scales: Sequence[int] = (4, 4, 4, 4)
    freq_axis_kernel_size: int = 1
    dtype: jnp.dtype = jnp.float32

    @property
    def upsample_factor(self) -> int:
        out = 1
        for s in self.upsample_scales:
            out *= s
        return out

    @nn.compact
    def __call__(self, x, c, *, deterministic: bool = True):
        c = ConvInUpsampleNet(
            tuple(self.upsample_scales), self.aux_channels,
            self.aux_context_window, self.freq_axis_kernel_size,
            self.use_weight_norm, dtype=self.dtype, name="upsample_net")(c)
        first = nn.Conv(self.residual_channels, (1,), use_bias=True,
                        dtype=self.dtype, name="first_conv")
        x = _maybe_wn(first, self.use_weight_norm, "first_conv")(x)
        layers_per_stack = self.layers // self.stacks
        skips = 0.0
        for i in range(self.layers):
            x, s = ResidualBlock(
                kernel_size=self.kernel_size,
                residual_channels=self.residual_channels,
                gate_channels=self.gate_channels,
                skip_channels=self.skip_channels,
                aux_channels=self.aux_channels,
                dilation=2 ** (i % layers_per_stack),
                dropout=self.dropout, bias=self.bias,
                use_weight_norm=self.use_weight_norm,
                dtype=self.dtype, name=f"block_{i}")(
                    x, c, deterministic=deterministic)
            skips = skips + s
        skips = skips * math.sqrt(1.0 / self.layers)

        h = nn.relu(skips)
        c1 = nn.Conv(self.skip_channels, (1,), use_bias=True,
                     dtype=self.dtype, name="last_conv_0")
        h = nn.relu(_maybe_wn(c1, self.use_weight_norm, "last_conv_0")(h))
        c2 = nn.Conv(self.out_channels, (1,), use_bias=True,
                     dtype=self.dtype, name="last_conv_1")
        return _maybe_wn(c2, self.use_weight_norm, "last_conv_1")(h)


def pwg_inference(generator: PWGGenerator, variables, mel, rng=None,
                  noise=None):
    """Single/batched mel -> waveform.

    ``mel``: (T', aux) or (B, T', aux) log-mel (already normalizer-scaled).
    Pads ``aux_context_window`` frames on each side in replicate mode, as
    the reference does at inference (parallel_wavegan.py:498-520), so the
    output has exactly T' * upsample_factor samples.
    """
    if mel.ndim == 2:
        mel = mel[None]
        squeeze = True
    else:
        squeeze = False
    w = generator.aux_context_window
    mel = jnp.pad(mel, ((0, 0), (w, w), (0, 0)), mode="edge")
    t_out = (mel.shape[1] - 2 * w) * generator.upsample_factor
    if noise is None:
        noise = jax.random.normal(rng, (mel.shape[0], t_out, 1))
    wav = generator.apply(variables, noise, mel)
    return (wav[0, :, 0] if squeeze else wav[..., 0])


class PWGDiscriminator(nn.Module):
    """Stack of dilated convs + leaky relu; (B, T, 1) -> (B, T, 1) logits."""
    in_channels: int = 1
    out_channels: int = 1
    kernel_size: int = 3
    layers: int = 10
    conv_channels: int = 64
    dilation_factor: int = 1
    negative_slope: float = 0.2
    bias: bool = True
    use_weight_norm: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = x
        for i in range(self.layers - 1):
            dilation = 1 if i == 0 else (
                i if self.dilation_factor == 1 else self.dilation_factor ** i)
            conv = nn.Conv(self.conv_channels, (self.kernel_size,),
                           kernel_dilation=(dilation,), padding="SAME",
                           use_bias=self.bias, dtype=self.dtype,
                           name=f"conv_{i}")
            h = _maybe_wn(conv, self.use_weight_norm, f"conv_{i}")(h)
            h = nn.leaky_relu(h, self.negative_slope)
        last = nn.Conv(self.out_channels, (self.kernel_size,),
                       padding="SAME", use_bias=self.bias, dtype=self.dtype,
                       name="conv_last")
        return _maybe_wn(last, self.use_weight_norm, "conv_last")(h)


class ResidualPWGDiscriminator(nn.Module):
    """WaveNet-style discriminator (no aux conditioning)."""
    in_channels: int = 1
    out_channels: int = 1
    kernel_size: int = 3
    layers: int = 30
    stacks: int = 3
    residual_channels: int = 64
    gate_channels: int = 128
    skip_channels: int = 64
    dropout: float = 0.0
    bias: bool = True
    use_weight_norm: bool = True
    negative_slope: float = 0.2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        first = nn.Conv(self.residual_channels, (1,), use_bias=True,
                        dtype=self.dtype, name="first_conv")
        h = nn.leaky_relu(
            _maybe_wn(first, self.use_weight_norm, "first_conv")(x),
            self.negative_slope)
        layers_per_stack = self.layers // self.stacks
        skips = 0.0
        for i in range(self.layers):
            h, s = ResidualBlock(
                kernel_size=self.kernel_size,
                residual_channels=self.residual_channels,
                gate_channels=self.gate_channels,
                skip_channels=self.skip_channels,
                aux_channels=None,
                dilation=2 ** (i % layers_per_stack),
                dropout=self.dropout, bias=self.bias,
                use_weight_norm=self.use_weight_norm,
                dtype=self.dtype, name=f"block_{i}")(
                    h, None, deterministic=deterministic)
            skips = skips + s
        skips = skips * math.sqrt(1.0 / self.layers)

        h = nn.leaky_relu(skips, self.negative_slope)
        c1 = nn.Conv(self.skip_channels, (1,), use_bias=True,
                     dtype=self.dtype, name="last_conv_0")
        h = nn.leaky_relu(
            _maybe_wn(c1, self.use_weight_norm, "last_conv_0")(h),
            self.negative_slope)
        c2 = nn.Conv(self.out_channels, (1,), use_bias=True,
                     dtype=self.dtype, name="last_conv_1")
        return _maybe_wn(c2, self.use_weight_norm, "last_conv_1")(h)
