"""Torch golden oracle for the Parallel WaveGAN generator.

Implements the reference PWGGenerator forward math (reference:
parakeet/models/parallel_wavegan/parallel_wavegan.py:318-472) as plain
functional torch, consuming a paddle-layout state dict
(Conv1D weight (out, in, k); weight-normed convs stored as
weight_v/weight_g with dim=0).
"""
from __future__ import annotations

import math

import torch
import torch.nn.functional as F


def _wn(state, prefix):
    """Fold paddle weight norm: weight = g * v / ||v||, norm over all
    axes but 0 (parallel_wavegan.py:474-483 applies nn.utils.weight_norm
    with the default dim=0)."""
    v = torch.as_tensor(state[f"{prefix}.weight_v"], dtype=torch.float64)
    g = torch.as_tensor(state[f"{prefix}.weight_g"], dtype=torch.float64)
    norm = v.flatten(1).norm(dim=1).reshape((-1,) + (1,) * (v.ndim - 1))
    return v * (g.reshape_as(norm) / norm)


def _bias(state, prefix):
    b = state.get(f"{prefix}.bias")
    return None if b is None else torch.as_tensor(b, dtype=torch.float64)


def golden_pwg_forward(state, noise_ncl, mel_ncl, *, layers, stacks,
                       upsample_scales, aux_context_window):
    """noise (N, C_in, T) and pre-padded mel (N, C_aux, T'+2w) ->
    waveform (N, 1, T), float64 numpy."""
    x = torch.as_tensor(noise_ncl, dtype=torch.float64)
    c = torch.as_tensor(mel_ncl, dtype=torch.float64)

    # ConvInUpsampleNet: valid conv_in over the padded mel, then per
    # scale nearest-stretch (time) + (1, 2s+1) SAME conv
    c = F.conv1d(c, _wn(state, "upsample_net.conv_in"))
    c = c.unsqueeze(1)                                   # (N, 1, F, T)
    for i, s in enumerate(upsample_scales):
        c = F.interpolate(c, scale_factor=(1, s), mode="nearest")
        w = _wn(state, f"upsample_net.upsample.up_layers.{i * 2 + 1}")
        c = F.conv2d(c, w, padding=(0, s))
    c = c.squeeze(1)                                     # (N, F, T_up)

    x = F.conv1d(x, _wn(state, "first_conv"), _bias(state, "first_conv"))
    assert c.shape[-1] == x.shape[-1], (c.shape, x.shape)

    layers_per_stack = layers // stacks
    skips = 0.0
    for i in range(layers):
        d = 2 ** (i % layers_per_stack)
        p = f"conv_layers.{i}"
        kernel = _wn(state, f"{p}.conv")
        pad = (kernel.shape[-1] - 1) // 2 * d
        h = F.conv1d(x, kernel, _bias(state, f"{p}.conv"),
                     dilation=d, padding=pad)
        h = h + F.conv1d(c, _wn(state, f"{p}.conv1x1_aux"))
        a, b = torch.chunk(h, 2, dim=1)
        h = torch.tanh(a) * torch.sigmoid(b)
        skips = skips + F.conv1d(h, _wn(state, f"{p}.conv1x1_skip"),
                                 _bias(state, f"{p}.conv1x1_skip"))
        x = (F.conv1d(h, _wn(state, f"{p}.conv1x1_out"),
                      _bias(state, f"{p}.conv1x1_out")) + x) * math.sqrt(0.5)
    skips = skips * math.sqrt(1.0 / layers)

    y = F.relu(skips)
    y = F.conv1d(y, _wn(state, "last_conv_layers.1"),
                 _bias(state, "last_conv_layers.1"))
    y = F.relu(y)
    y = F.conv1d(y, _wn(state, "last_conv_layers.3"),
                 _bias(state, "last_conv_layers.3"))
    return y.numpy()
