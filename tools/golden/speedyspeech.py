"""Torch golden oracle for SpeedySpeech (teacher-forced forward).

Implements the reference forward math (reference:
parakeet/models/speedyspeech/speedyspeech.py:20-180: NLC residual conv
blocks with BatchNorm1D(data_format=NLC), dilated SAME convs with
paddle's left-light asymmetric padding for even kernels, duration
expansion, sinusoid positional encoding) as functional torch, consuming
a paddle-layout state dict.
"""
from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F

DT = torch.float64


def _t(state, key):
    return torch.as_tensor(np.asarray(state[key]), dtype=DT)


def _linear(state, prefix, x):
    return x @ _t(state, f"{prefix}.weight") + _t(state, f"{prefix}.bias")


def _conv_same_nlc(state, prefix, x, dilation=1):
    """paddle Conv1D(padding='same', data_format=NLC): total pad
    (k-1)*d split left-light (left = total // 2)."""
    w = _t(state, f"{prefix}.weight")
    b = _t(state, f"{prefix}.bias")
    total = (w.shape[-1] - 1) * dilation
    left = total // 2
    xc = F.pad(x.transpose(1, 2), (left, total - left))
    return F.conv1d(xc, w, b, dilation=dilation).transpose(1, 2)


def _bn_nlc(state, prefix, x):
    """BatchNorm1D(data_format=NLC) eval: normalize the channel (last)
    axis with running stats."""
    mean, var = _t(state, f"{prefix}._mean"), _t(state, f"{prefix}._variance")
    w, b = _t(state, f"{prefix}.weight"), _t(state, f"{prefix}.bias")
    return (x - mean) / torch.sqrt(var + 1e-5) * w + b


def _res_block(state, prefix, x, dilation, n=2):
    h = x
    for j in range(n):
        h = _conv_same_nlc(state, f"{prefix}.blocks.{j}.0", h, dilation)
        h = F.relu(h)
        h = _bn_nlc(state, f"{prefix}.blocks.{j}.2", h)
    return x + h


def _sinusoid(num_positions, feature_size):
    channel = torch.arange(0, feature_size, 2, dtype=DT)
    index = torch.arange(num_positions, dtype=DT)
    p = index.unsqueeze(-1) / (10000.0 ** (channel / float(feature_size)))
    enc = torch.zeros(num_positions, feature_size, dtype=DT)
    enc[:, 0::2] = torch.sin(p)
    enc[:, 1::2] = torch.cos(p)
    return enc


def golden_speedyspeech_forward(state, text, tones, durations, *,
                                encoder_dilations, decoder_dilations):
    """text/tones (B, T) int, durations (B, T) int ->
    (decoded (B, sum(dur), odim), pred_log_durations (B, T))."""
    text = torch.as_tensor(np.asarray(text)).long()
    tones = torch.as_tensor(np.asarray(tones)).long()
    durations = torch.as_tensor(np.asarray(durations)).long()

    emb = _t(state, "encoder.embedding.text_embedding.weight")[text] \
        + _t(state, "encoder.embedding.tone_embedding.weight")[tones]
    x = F.relu(_linear(state, "encoder.prenet.0", emb))
    h = x
    for i, d in enumerate(encoder_dilations):
        h = _res_block(state, f"encoder.res_blocks.{i}", h, d, n=2)
    h = x + _linear(state, "encoder.postnet1.0", h)
    h = F.relu(h)
    h = _bn_nlc(state, "encoder.postnet2.1", h)
    encodings = _linear(state, "encoder.postnet2.2", h)

    # duration predictor on (detached) encodings
    p = encodings
    for i, k in enumerate((4, 3, 1)):
        p = _res_block(state, f"duration_predictor.layers.{i}", p, 1, n=1)
    pred_durations = _linear(state, "duration_predictor.layers.3",
                             p).squeeze(-1)

    # expand by durations (expansion.py:19)
    B, _T, C = encodings.shape
    expanded = []
    for b in range(B):
        expanded.append(torch.repeat_interleave(encodings[b],
                                                durations[b], dim=0))
    L = max(e.shape[0] for e in expanded)
    enc = torch.zeros(B, L, C, dtype=DT)
    for b, e in enumerate(expanded):
        enc[b, :e.shape[0]] = e
    enc = enc + _sinusoid(L, C)

    h = enc
    for i, d in enumerate(decoder_dilations):
        h = _res_block(state, f"decoder.res_blocks.{i}", h, d, n=2)
    h = enc + _linear(state, "decoder.postnet1.0", h)
    h = _res_block(state, "decoder.postnet2.0", h, 1, n=2)
    decoded = _linear(state, "decoder.postnet2.1", h)
    return decoded.numpy(), pred_durations.numpy()
