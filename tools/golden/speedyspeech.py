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

from .common import DT, grads_of, make_grad_state, to_tensor


def _t(state, key):
    return to_tensor(state[key])


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


def _bn_nlc(state, prefix, x, train=False):
    """BatchNorm1D(data_format=NLC): normalize the channel (last) axis;
    ``train`` uses minibatch statistics (over B and T)."""
    if train:
        mean = x.mean(dim=(0, 1))
        var = x.var(dim=(0, 1), unbiased=False)
    else:
        mean = _t(state, f"{prefix}._mean")
        var = _t(state, f"{prefix}._variance")
    w, b = _t(state, f"{prefix}.weight"), _t(state, f"{prefix}.bias")
    return (x - mean) / torch.sqrt(var + 1e-5) * w + b


def _res_block(state, prefix, x, dilation, n=2, bn_train=False):
    h = x
    for j in range(n):
        h = _conv_same_nlc(state, f"{prefix}.blocks.{j}.0", h, dilation)
        h = F.relu(h)
        h = _bn_nlc(state, f"{prefix}.blocks.{j}.2", h, train=bn_train)
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
    decoded, pred = _forward(state, text, tones, durations,
                             encoder_dilations=encoder_dilations,
                             decoder_dilations=decoder_dilations)
    return decoded.detach().numpy(), pred.detach().numpy()


def _forward(state, text, tones, durations, *, encoder_dilations,
             decoder_dilations, bn_train=False):
    """Torch-tensor forward (grad-capable when ``state`` holds
    requires_grad tensors).  ``bn_train``: every BatchNorm uses
    minibatch statistics.  The duration predictor consumes *detached*
    encodings, matching the reference's stop-gradient
    (speedyspeech.py:97-104)."""
    text = torch.as_tensor(np.asarray(text)).long()
    tones = torch.as_tensor(np.asarray(tones)).long()
    durations = torch.as_tensor(np.asarray(durations)).long()

    emb = _t(state, "encoder.embedding.text_embedding.weight")[text] \
        + _t(state, "encoder.embedding.tone_embedding.weight")[tones]
    x = F.relu(_linear(state, "encoder.prenet.0", emb))
    h = x
    for i, d in enumerate(encoder_dilations):
        h = _res_block(state, f"encoder.res_blocks.{i}", h, d, n=2,
                       bn_train=bn_train)
    h = x + _linear(state, "encoder.postnet1.0", h)
    h = F.relu(h)
    h = _bn_nlc(state, "encoder.postnet2.1", h, train=bn_train)
    encodings = _linear(state, "encoder.postnet2.2", h)

    # duration predictor on detached encodings (stop-gradient)
    p = encodings.detach()
    for i, k in enumerate((4, 3, 1)):
        p = _res_block(state, f"duration_predictor.layers.{i}", p, 1, n=1,
                       bn_train=bn_train)
    pred_durations = _linear(state, "duration_predictor.layers.3",
                             p).squeeze(-1)

    # expand by durations (expansion.py:19)
    B, _T, C = encodings.shape
    expanded = []
    for b in range(B):
        expanded.append(torch.repeat_interleave(encodings[b],
                                                durations[b], dim=0))
    L = max(e.shape[0] for e in expanded)
    rows = []
    for e in expanded:
        rows.append(F.pad(e, (0, 0, 0, L - e.shape[0])))
    enc = torch.stack(rows, dim=0)
    enc = enc + _sinusoid(L, C)

    h = enc
    for i, d in enumerate(decoder_dilations):
        h = _res_block(state, f"decoder.res_blocks.{i}", h, d, n=2,
                       bn_train=bn_train)
    h = enc + _linear(state, "decoder.postnet1.0", h)
    h = _res_block(state, "decoder.postnet2.0", h, 1, n=2,
                   bn_train=bn_train)
    decoded = _linear(state, "decoder.postnet2.1", h)
    return decoded, pred_durations


def _ssim(img1, img2, win_size=11, sigma=1.5, data_range=1.0):
    """fp64 SSIM matching parakeet_tpu.ops.ssim: depthwise 11x11
    Gaussian window, SAME padding, C1/C2 from ``data_range``."""
    g = torch.exp(-((torch.arange(win_size, dtype=DT) - win_size // 2) ** 2)
                  / (2.0 * sigma ** 2))
    g = g / g.sum()
    w = torch.outer(g, g)[None, None]                 # (1, 1, K, K)
    c = img1.shape[1]
    w = w.expand(c, 1, win_size, win_size)

    def filt(x):
        return F.conv2d(x, w, padding=win_size // 2, groups=c)

    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    mu1, mu2 = filt(img1), filt(img2)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = filt(img1 * img1) - mu1_sq
    s2 = filt(img2 * img2) - mu2_sq
    s12 = filt(img1 * img2) - mu12
    ssim_map = ((2 * mu12 + c1) * (2 * s12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))
    return ssim_map.mean()


def golden_speedyspeech_loss_and_grads(state, text, tones, durations,
                                       feats, *, encoder_dilations,
                                       decoder_dilations):
    """Training-numerics oracle: d SpeedySpeech loss / d params in fp64.

    Loss mirrors speedyspeech_loss (reference updater semantics,
    speedyspeech_updater.py:33-95): mean L1 on the mel + (1 - SSIM) of
    the mel "images" + huber(pred_log_d - log(max(d, 1))) on the
    (stop-gradient'd) duration head.  Assumes every row has the same
    total duration (no frame padding), so the masks are all-ones and
    train-mode BN statistics are padding-free on both sides.  BN
    running stats (buffers) get zero grads.
    Returns (loss float, {paddle name: fp64 numpy grad}).
    """
    grad_state = make_grad_state(state)
    decoded, pred_log_d = _forward(
        grad_state, text, tones, durations, bn_train=True,
        encoder_dilations=encoder_dilations,
        decoder_dilations=decoder_dilations)
    target = torch.as_tensor(np.asarray(feats), dtype=DT)
    d = torch.as_tensor(np.asarray(durations), dtype=DT)

    l1 = (decoded - target).abs().mean()
    ssim_val = _ssim(decoded.unsqueeze(1), target.unsqueeze(1))
    err = pred_log_d - torch.log(d.clamp(min=1.0))
    a = err.abs()
    huber = torch.where(a <= 1.0, 0.5 * err ** 2, a - 0.5)
    loss = l1 + (1.0 - ssim_val) + huber.mean()
    loss.backward()
    return float(loss.detach()), grads_of(grad_state)
