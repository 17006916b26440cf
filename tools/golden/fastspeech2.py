"""Torch golden oracle for FastSpeech2 (teacher-forced forward).

Implements the reference forward math (reference:
parakeet/models/fastspeech2/fastspeech2.py:377-465 and the
fastspeech2_transformer/_predictor modules) as functional torch,
consuming a paddle-layout state dict (Linear weight (in, out); Conv1D
weight (out, in, k); ESPnet pre-LN encoder with MultiLayeredConv1d FFN;
ScaledPositionalEncoding x + alpha*pe).
"""
from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn.functional as F

from .common import DT, grads_of, make_grad_state, to_tensor


def _t(state, key):
    return to_tensor(state[key])


def _linear(state, prefix, x):
    # paddle Linear weight is (in, out)
    return x @ _t(state, f"{prefix}.weight") + _t(state, f"{prefix}.bias")


def _conv1d_ncl(state, prefix, x, *, dilation=1, bias=True):
    w = _t(state, f"{prefix}.weight")
    b = _t(state, f"{prefix}.bias") if bias else None
    pad = (w.shape[-1] - 1) // 2 * dilation
    return F.conv1d(x, w, b, dilation=dilation, padding=pad)


def _layernorm_last(state, prefix, x, eps=1e-5):
    w, b = _t(state, f"{prefix}.weight"), _t(state, f"{prefix}.bias")
    return F.layer_norm(x, (x.shape[-1],), w, b, eps)


def _pos_table(length, d_model):
    position = torch.arange(length, dtype=DT).unsqueeze(1)
    div_term = torch.exp(torch.arange(0, d_model, 2, dtype=DT)
                         * -(math.log(10000.0) / d_model))
    pe = torch.zeros(length, d_model, dtype=DT)
    pe[:, 0::2] = torch.sin(position * div_term)
    pe[:, 1::2] = torch.cos(position * div_term)
    return pe.unsqueeze(0)


def _mha(state, prefix, x, mask_keep):
    """ESPnet MultiHeadedAttention with contiguous head split
    (fastspeech2_transformer/attention.py:42-120).  ``mask_keep``:
    (B, 1, T) bool, True = attend."""
    B, T, feat = x.shape
    q = _linear(state, f"{prefix}.linear_q", x)
    k = _linear(state, f"{prefix}.linear_k", x)
    v = _linear(state, f"{prefix}.linear_v", x)
    # infer head count from nothing — caller passes via attribute
    h = _mha.heads
    dk = feat // h
    q = q.reshape(B, T, h, dk).transpose(1, 2)
    k = k.reshape(B, T, h, dk).transpose(1, 2)
    v = v.reshape(B, T, h, dk).transpose(1, 2)
    scores = q @ k.transpose(-2, -1) / math.sqrt(dk)
    if mask_keep is not None:
        neg = torch.finfo(DT).min
        scores = scores.masked_fill(~mask_keep.unsqueeze(1), neg)
        attn = torch.softmax(scores, dim=-1)
        attn = attn.masked_fill(~mask_keep.unsqueeze(1), 0.0)
    else:
        attn = torch.softmax(scores, dim=-1)
    out = (attn @ v).transpose(1, 2).reshape(B, T, feat)
    return _linear(state, f"{prefix}.linear_out", out)


def _encoder_stack(state, prefix, x, mask_keep, n_layers, heads,
                   has_embed):
    """ESPnet Encoder: [Embedding +] ScaledPositionalEncoding ->
    pre-LN layers (self-attn + MultiLayeredConv1d) -> after_norm."""
    alpha_idx = 1 if has_embed else 0
    alpha = _t(state, f"{prefix}.embed.{alpha_idx}.alpha").reshape(())
    x = x + alpha * _pos_table(x.shape[1], x.shape[-1])
    _mha.heads = heads
    for i in range(n_layers):
        lp = f"{prefix}.encoders.{i}"
        resid = x
        xn = _layernorm_last(state, f"{lp}.norm1", x)
        x = resid + _mha(state, f"{lp}.self_attn", xn, mask_keep)
        resid = x
        xn = _layernorm_last(state, f"{lp}.norm2", x)
        h = F.relu(_conv1d_ncl(state, f"{lp}.feed_forward.w_1",
                               xn.transpose(1, 2)))
        h = _conv1d_ncl(state, f"{lp}.feed_forward.w_2", h)
        x = resid + h.transpose(1, 2)
    return _layernorm_last(state, f"{prefix}.after_norm", x)


def _predictor(state, prefix, hs, pad_mask, n_layers, squeeze):
    """Duration/variance predictor (duration_predictor.py:85-104,
    variance_predictor.py:77-104): conv->ReLU->LN(channel axis) stack,
    then linear; padding filled with 0."""
    x = hs.transpose(1, 2)                          # (B, C, T)
    for i in range(n_layers):
        x = F.relu(_conv1d_ncl(state, f"{prefix}.conv.{i}.0", x))
        x = _layernorm_last(state, f"{prefix}.conv.{i}.2",
                            x.transpose(1, 2)).transpose(1, 2)
    out = _linear(state, f"{prefix}.linear", x.transpose(1, 2))  # (B,T,1)
    if squeeze:
        out = out.squeeze(-1)
        return out.masked_fill(pad_mask, 0.0)
    return out.masked_fill(pad_mask.unsqueeze(-1), 0.0)


def _length_regulate(hs, durations):
    """Repeat token encodings by durations (length_regulator.py:33-76),
    padding each sequence to the batch max total."""
    B, _T, C = hs.shape
    totals = durations.sum(dim=1)
    L = int(totals.max().item())
    out = torch.zeros(B, L, C, dtype=hs.dtype)
    for b in range(B):
        rep = torch.repeat_interleave(hs[b], durations[b], dim=0)
        out[b, :rep.shape[0]] = rep
    return out, totals


def _forward(state, text, ilens, durations, pitch, energy, *, odim,
             heads=2, elayers=1, dlayers=1, predictor_layers=2,
             pitch_predictor_layers=2, energy_predictor_layers=2,
             postnet_layers=2, bn_train=False):
    """Teacher-forced forward returning torch tensors (grad-capable
    when ``state`` holds requires_grad tensors).  ``bn_train``: postnet
    BatchNorm normalizes with minibatch statistics (what a train step
    does) instead of the stored running stats."""
    text = torch.as_tensor(np.asarray(text)).long()
    ilens = torch.as_tensor(np.asarray(ilens)).long()
    durations = torch.as_tensor(np.asarray(durations)).long()
    pitch = torch.as_tensor(np.asarray(pitch), dtype=DT)
    energy = torch.as_tensor(np.asarray(energy), dtype=DT)
    B, Tmax = text.shape

    token_idx = torch.arange(Tmax).unsqueeze(0)
    nonpad = token_idx < ilens.unsqueeze(1)          # (B, Tmax) True=real
    pad_mask = ~nonpad

    emb = F.embedding(text, _t(state, "encoder.embed.0.weight"),
                      padding_idx=0)
    hs = _encoder_stack(state, "encoder", emb, nonpad.unsqueeze(1),
                        elayers, heads, has_embed=True)

    p_outs = _predictor(state, "pitch_predictor", hs, pad_mask,
                        pitch_predictor_layers, squeeze=False)
    e_outs = _predictor(state, "energy_predictor", hs, pad_mask,
                        energy_predictor_layers, squeeze=False)
    d_outs = _predictor(state, "duration_predictor", hs, pad_mask,
                        predictor_layers, squeeze=True)

    p_embs = _conv1d_ncl(state, "pitch_embed.0",
                         pitch.transpose(1, 2)).transpose(1, 2)
    e_embs = _conv1d_ncl(state, "energy_embed.0",
                         energy.transpose(1, 2)).transpose(1, 2)
    hs = hs + e_embs + p_embs

    hs, olens = _length_regulate(hs, durations * nonpad.long())

    frame_idx = torch.arange(hs.shape[1]).unsqueeze(0)
    out_nonpad = frame_idx < olens.unsqueeze(1)
    zs = _encoder_stack(state, "decoder", hs, out_nonpad.unsqueeze(1),
                        dlayers, heads, has_embed=False)
    before = _linear(state, "feat_out", zs).reshape(B, -1, odim)

    # Postnet (tacotron2/decoder.py:84-160): conv(no bias)+BN(+tanh
    # except last)
    x = before.transpose(1, 2)
    for i in range(postnet_layers):
        p = f"postnet.postnet.{i}"
        x = _conv1d_ncl(state, f"{p}.0", x, bias=False)
        if bn_train:
            mean = x.mean(dim=(0, 2))
            var = x.var(dim=(0, 2), unbiased=False)
        else:
            mean = _t(state, f"{p}.1._mean")
            var = _t(state, f"{p}.1._variance")
        w, b = _t(state, f"{p}.1.weight"), _t(state, f"{p}.1.bias")
        x = (x - mean[:, None]) / torch.sqrt(var[:, None] + 1e-5) \
            * w[:, None] + b[:, None]
        if i != postnet_layers - 1:
            x = torch.tanh(x)
    after = before + x.transpose(1, 2)

    return {"before_outs": before, "after_outs": after, "d_outs": d_outs,
            "p_outs": p_outs, "e_outs": e_outs, "olens": olens,
            "in_nonpad": nonpad, "out_nonpad": out_nonpad}


def golden_fastspeech2_forward(state, text, ilens, durations, pitch,
                               energy, **kw):
    """Teacher-forced forward.  text (B, Tmax) int, ilens (B,),
    durations (B, Tmax) int, pitch/energy (B, Tmax, 1).
    Returns dict of float64 numpy arrays."""
    out = _forward(state, text, ilens, durations, pitch, energy, **kw)
    return {k: out[k].numpy() for k in ("before_outs", "after_outs",
                                        "d_outs", "p_outs", "e_outs",
                                        "olens")}


def golden_fastspeech2_loss_and_grads(state, text, ilens, speech,
                                      durations, pitch, energy, **kw):
    """Full training-loss gradients w.r.t. every paddle-layout param.

    Loss mirrors the reference FastSpeech2Loss with use_masking=True
    (reference: fastspeech2.py:674-812): masked mean L1 on before+after
    outs, masked log-domain duration MSE (offset 1), masked pitch and
    energy MSE.  Postnet BN runs in train mode (minibatch statistics),
    matching what a train step differentiates.  Returns
    (loss float, {param_name: grad float64 numpy}); BN running stats
    (buffers, not trained) get zero grads.
    """
    grad_state = make_grad_state(state)
    out = _forward(grad_state, text, ilens, durations, pitch, energy,
                   bn_train=True, **kw)
    ys = torch.as_tensor(np.asarray(speech), dtype=DT)
    ds = torch.as_tensor(np.asarray(durations)).long()
    ps = torch.as_tensor(np.asarray(pitch), dtype=DT)
    es = torch.as_tensor(np.asarray(energy), dtype=DT)

    out_m = out["out_nonpad"].unsqueeze(-1).to(DT)        # (B, L, 1)
    in_m = out["in_nonpad"].to(DT)                        # (B, T)
    denom = (out_m.sum() * ys.shape[2]).clamp(min=1.0)
    l1 = ((out["before_outs"] - ys).abs() * out_m).sum() / denom \
        + ((out["after_outs"] - ys).abs() * out_m).sum() / denom
    log_ds = torch.log(ds.to(DT) + 1.0)
    dur = ((out["d_outs"] - log_ds) ** 2 * in_m).sum() \
        / in_m.sum().clamp(min=1.0)
    im3 = in_m.unsqueeze(-1)
    pitch_l = ((out["p_outs"] - ps) ** 2 * im3).sum() \
        / im3.sum().clamp(min=1.0)
    energy_l = ((out["e_outs"] - es) ** 2 * im3).sum() \
        / im3.sum().clamp(min=1.0)
    loss = l1 + dur + pitch_l + energy_l
    loss.backward()
    return float(loss.detach()), grads_of(grad_state)
