"""Torch golden oracle for WaveFlow (likelihood-direction forward).

Implements the reference ConditionalWaveFlow.forward math (reference:
parakeet/models/waveflow.py:32-700: weight-normed ConvTranspose2D
upsampler with leaky_relu(0.4), fold into (B,1,h,W), per-flow
causal-in-height ResidualNet, affine transform of rows 1..h-1, fixed
row permutations between flows) as functional torch, consuming a
paddle-layout state dict.
"""
from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F

from .common import DT, grads_of, to_tensor


def _wn(state, prefix):
    if f"{prefix}.weight" in state:   # pre-folded (grad-oracle path)
        return _t(state, f"{prefix}.weight")
    v = _t(state, f"{prefix}.weight_v")
    g = _t(state, f"{prefix}.weight_g")
    norm = v.flatten(1).norm(dim=1).reshape((-1,) + (1,) * (v.ndim - 1))
    return v * (g.reshape_as(norm) / norm)


def _t(state, key):
    return to_tensor(state[key])


def _perms(n_group, n_flows):
    idx = list(range(n_group))
    half = n_group // 2
    out = []
    for i in range(n_flows):
        if i < n_flows // 2:
            out.append(idx[::-1])
        else:
            out.append(list(reversed(idx[:half]))
                       + list(reversed(idx[half:])))
    return out


def golden_waveflow_forward(state, audio, mel_ncl, *, n_flows, n_layers,
                            n_group, upsample_factors, kernel_size=(3, 3)):
    """audio (B, T), mel (B, n_mels, T_mel) -> (z (B, T), log_det scalar),
    float64 numpy."""
    z, log_det = _forward_t(state, audio, mel_ncl, n_flows=n_flows,
                            n_layers=n_layers, n_group=n_group,
                            upsample_factors=upsample_factors,
                            kernel_size=kernel_size)
    return z.detach().numpy(), float(log_det.detach())


def _forward_t(state, audio, mel_ncl, *, n_flows, n_layers,
               n_group, upsample_factors, kernel_size=(3, 3)):
    """Torch-tensor forward (grad-capable when ``state`` holds
    requires_grad tensors)."""
    x = torch.as_tensor(np.asarray(audio), dtype=DT)
    c = torch.as_tensor(np.asarray(mel_ncl), dtype=DT)

    # UpsampleNet: weight-normed ConvTranspose2D (stride (1, f), padding
    # (1, f//2)) + leaky_relu(0.4); paddle ConvTranspose weight layout
    # (in, out, kh, kw) == torch's
    c = c.unsqueeze(1)
    for i, f in enumerate(upsample_factors):
        w = _wn(state, f"encoder.{i}")
        b = _t(state, f"encoder.{i}.bias")
        c = F.conv_transpose2d(c, w, b, stride=(1, f), padding=(1, f // 2))
        c = F.leaky_relu(c, 0.4)
    c = c.squeeze(1)                                     # (B, C, T)

    # fold to (B, 1, h, W) / (B, C, h, W)
    B, T = x.shape
    W = T // n_group
    x = x[:, :W * n_group].reshape(B, W, n_group).transpose(1, 2)
    x = x.unsqueeze(1)
    c = c[:, :, :W * n_group].reshape(B, c.shape[1], W, n_group) \
         .permute(0, 1, 3, 2)                            # (B, C, h, W)

    kh, kw = kernel_size
    # dilations in h follow the reference table (waveflow.py:420-426):
    # all ones for n_group <= 16
    dil_table = {8: [1] * 8, 16: [1] * 8,
                 32: [1, 2, 4, 1, 2, 4, 1, 2],
                 64: [1, 2, 4, 8, 16, 1, 2, 4],
                 128: [1, 2, 4, 8, 16, 32, 64, 1]}
    dils_h = dil_table.get(n_group, [1] * n_layers)

    perms = _perms(n_group, n_flows)
    logs_all = []
    for fl in range(n_flows):
        fp = f"decoder.{fl}"
        # predict (logs, b) from rows :-1 conditioned on rows 1:
        h = F.conv2d(x[:, :, :-1, :], _wn(state, f"{fp}.input_proj"),
                     _t(state, f"{fp}.input_proj.bias"))
        cond = c[:, :, 1:, :]
        skips = 0.0
        for la in range(n_layers):
            lp = f"{fp}.resnet.{la}"
            dh, dw = dils_h[la], 2 ** la
            rh, rw = 1 + (kh - 1) * dh, 1 + (kw - 1) * dw
            hp = F.pad(h, (rw // 2, (rw - 1) // 2, rh - 1, 0))
            y = F.conv2d(hp, _wn(state, f"{lp}.conv"),
                         _t(state, f"{lp}.conv.bias"), dilation=(dh, dw))
            y = y + F.conv2d(cond, _wn(state, f"{lp}.condition_proj"),
                             _t(state, f"{lp}.condition_proj.bias"))
            content, gate = torch.chunk(y, 2, dim=1)
            y = torch.tanh(content) * torch.sigmoid(gate)
            y = F.conv2d(y, _wn(state, f"{lp}.out_proj"),
                         _t(state, f"{lp}.out_proj.bias"))
            res, skip = torch.chunk(y, 2, dim=1)
            h = h + res
            skips = skips + skip
        out = F.conv2d(skips, _t(state, f"{fp}.output_proj.weight"),
                       _t(state, f"{fp}.output_proj.bias"))
        logs, b = torch.chunk(out, 2, dim=1)
        logs_all.append(logs)
        z_rest = x[:, :, 1:, :] * torch.exp(logs) + b
        x = torch.cat([x[:, :, :1, :], z_rest], dim=2)
        # permute rows
        perm = perms[fl]
        x = x[:, :, perm, :]
        c = c[:, :, perm, :]

    z = x.squeeze(1).transpose(1, 2).reshape(B, -1)
    log_det = sum(l.sum() for l in logs_all)
    return z, log_det


def golden_waveflow_loss_and_grads(state, audio, mel_ncl, *, sigma=1.0,
                                   n_flows, n_layers, n_group,
                                   upsample_factors):
    """Training-numerics oracle: d WaveFlowLoss / d params in fp64.

    Loss mirrors the reference WaveFlowLoss (waveflow.py:855-892):
    (sum(z^2) / (2 sigma^2) - log_det) / numel(z) + const, with
    const = log(2 pi)/2 + log(sigma).

    Weight-normed convs are folded to plain ``.weight`` leaves first
    (our JAX WaveFlow trains plain convs — convert_waveflow folds at
    load), so the returned gradient dict is keyed by ``{prefix}.weight``
    and maps through ``convert_waveflow(..., pre-folded)`` as a pure
    reindexing.  Returns (loss float, {name: fp64 numpy grad}).
    """
    import math

    grad_state = {}
    for k, v in state.items():
        if k.endswith(".weight_g"):
            continue
        if k.endswith(".weight_v"):
            prefix = k[: -len(".weight_v")]
            v_np = np.asarray(state[k], np.float64)
            g_np = np.asarray(state[f"{prefix}.weight_g"], np.float64)
            axes = tuple(range(1, v_np.ndim))
            norm = np.sqrt((v_np ** 2).sum(axis=axes, keepdims=True))
            w = v_np * (g_np.reshape((-1,) + (1,) * (v_np.ndim - 1)) / norm)
            grad_state[f"{prefix}.weight"] = torch.as_tensor(
                w, dtype=DT).clone().requires_grad_(True)
        else:
            grad_state[k] = torch.as_tensor(
                np.asarray(v), dtype=DT).clone().requires_grad_(True)

    z, log_det = _forward_t(grad_state, audio, mel_ncl, n_flows=n_flows,
                            n_layers=n_layers, n_group=n_group,
                            upsample_factors=upsample_factors)
    n = z.numel()
    const = 0.5 * math.log(2 * math.pi) + math.log(sigma)
    loss = (z.pow(2).sum() / (2 * sigma * sigma) - log_det) / n + const
    loss.backward()
    return float(loss.detach()), grads_of(grad_state)
