"""Torch golden oracle for Tacotron2 (teacher-forced forward).

Implements the reference forward math (reference:
parakeet/models/tacotron2.py:174-780: conv-BN-relu encoder + BiLSTM,
prenet, attention LSTM cell, location-sensitive attention, decoder LSTM
cell, projections, conv-BN postnet) as functional torch, consuming a
paddle-layout state dict (Linear weight (in, out); NLC Conv1D weight
(out, in, k); LSTM weight_ih (4H, in) with i,f,c,o gate order).

Dropout probabilities are assumed 0 (the comparison is deterministic;
the prenet's always-on dropout must be disabled on both sides).
"""
from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F

DT = torch.float64


def _t(state, key):
    return torch.as_tensor(np.asarray(state[key]), dtype=DT)


def _linear(state, prefix, x, bias=True):
    y = x @ _t(state, f"{prefix}.weight")
    if bias:
        y = y + _t(state, f"{prefix}.bias")
    return y


def _conv_nlc(state, prefix, x, bias=True):
    """NLC conv: x (B, T, C) -> (B, T, C_out), SAME padding."""
    w = _t(state, f"{prefix}.weight")
    b = _t(state, f"{prefix}.bias") if bias else None
    pad = (w.shape[-1] - 1) // 2
    return F.conv1d(x.transpose(1, 2), w, b, padding=pad).transpose(1, 2)


def _bn_eval(state, prefix, x):
    """BatchNorm1D eval over the last axis of (B, T, C)."""
    mean, var = _t(state, f"{prefix}._mean"), _t(state, f"{prefix}._variance")
    w, b = _t(state, f"{prefix}.weight"), _t(state, f"{prefix}.bias")
    return (x - mean) / torch.sqrt(var + 1e-5) * w + b


def _lstm_step(state, prefix, x, h, c, suffix=""):
    """paddle LSTMCell: gates = W_ih x + b_ih + W_hh h + b_hh, order
    i, f, c(g), o."""
    gates = (x @ _t(state, f"{prefix}.weight_ih{suffix}").T
             + _t(state, f"{prefix}.bias_ih{suffix}")
             + h @ _t(state, f"{prefix}.weight_hh{suffix}").T
             + _t(state, f"{prefix}.bias_hh{suffix}"))
    i, f, g, o = gates.chunk(4, dim=-1)
    c = torch.sigmoid(f) * c + torch.sigmoid(i) * torch.tanh(g)
    h = torch.sigmoid(o) * torch.tanh(c)
    return h, c


def _lstm_seq(state, prefix, xs, suffix=""):
    B, T, _ = xs.shape
    H = _t(state, f"{prefix}.weight_hh{suffix}").shape[1]
    h = torch.zeros(B, H, dtype=DT)
    c = torch.zeros(B, H, dtype=DT)
    outs = []
    for t in range(T):
        h, c = _lstm_step(state, prefix, xs[:, t], h, c, suffix)
        outs.append(h)
    return torch.stack(outs, dim=1)


def golden_tacotron2_forward(state, text, mels, *, reduction_factor=1,
                             encoder_conv_layers=2, postnet_conv_layers=2,
                             use_stop_token=True):
    """Teacher-forced forward with full-length inputs (no padding).
    text (B, T_text) int, mels (B, T_mel, d_mels).  Returns dict of
    float64 numpy arrays."""
    text = torch.as_tensor(np.asarray(text)).long()
    mels = torch.as_tensor(np.asarray(mels), dtype=DT)
    B = text.shape[0]

    x = _t(state, "embedding.weight")[text]
    for i in range(encoder_conv_layers):
        p = f"encoder.conv_batchnorms.{i}"
        x = F.relu(_bn_eval(state, f"{p}.bn",
                            _conv_nlc(state, f"{p}.conv", x)))
    fwd = _lstm_seq(state, "encoder.lstm", x, "_l0")
    rev = _lstm_seq(state, "encoder.lstm", torch.flip(x, [1]),
                    "_l0_reverse")
    keys = torch.cat([fwd, torch.flip(rev, [1])], dim=-1)  # (B, T, C)

    processed_key = _linear(state, "decoder.attention_layer.key_layer",
                            keys, bias=False)

    d_att_rnn = _t(state, "decoder.attention_rnn.weight_hh").shape[1]
    d_dec_rnn = _t(state, "decoder.decoder_rnn.weight_hh").shape[1]
    d_enc = keys.shape[-1]
    T_enc = keys.shape[1]

    att_h = torch.zeros(B, d_att_rnn, dtype=DT)
    att_c = torch.zeros(B, d_att_rnn, dtype=DT)
    dec_h = torch.zeros(B, d_dec_rnn, dtype=DT)
    dec_c = torch.zeros(B, d_dec_rnn, dtype=DT)
    attw = torch.zeros(B, T_enc, dtype=DT)
    attw_cum = torch.zeros(B, T_enc, dtype=DT)
    context = torch.zeros(B, d_enc, dtype=DT)

    # queries: [start_frame] + mels (reduction-reshaped), prenet, drop last
    q = mels.reshape(B, mels.shape[1] // reduction_factor, -1)
    q = torch.cat([torch.zeros(B, 1, q.shape[-1], dtype=DT), q], dim=1)
    q = F.relu(_linear(state, "decoder.prenet.linear1", q, bias=False))
    q = F.relu(_linear(state, "decoder.prenet.linear2", q, bias=False))

    mel_outs, aligns, stops = [], [], []
    for t in range(q.shape[1] - 1):
        cell_in = torch.cat([q[:, t], context], dim=-1)
        att_h, att_c = _lstm_step(state, "decoder.attention_rnn",
                                  cell_in, att_h, att_c)
        # location-sensitive attention (modules/attention.py:258-348)
        wcat = torch.stack([attw, attw_cum], dim=-1)        # (B, T, 2)
        loc = _conv_nlc(state, "decoder.attention_layer.location_conv",
                        wcat, bias=False)
        loc = _linear(state, "decoder.attention_layer.location_layer",
                      loc, bias=False)
        pq = _linear(state, "decoder.attention_layer.query_layer",
                     att_h, bias=False).unsqueeze(1)
        align = _linear(state, "decoder.attention_layer.value",
                        torch.tanh(loc + processed_key + pq), bias=False)
        w = torch.softmax(align, dim=1)                     # (B, T, 1)
        context = (w.transpose(1, 2) @ keys).squeeze(1)
        attw = w.squeeze(-1)
        attw_cum = attw_cum + attw

        dec_in = torch.cat([att_h, context], dim=-1)
        dec_h, dec_c = _lstm_step(state, "decoder.decoder_rnn",
                                  dec_in, dec_h, dec_c)
        hc = torch.cat([dec_h, context], dim=-1)
        mel_outs.append(_linear(state, "decoder.linear_projection", hc))
        aligns.append(attw)
        if use_stop_token:
            stops.append(_linear(state, "decoder.stop_layer", hc))

    mel = torch.stack(mel_outs, dim=1)

    y = mel
    for i in range(postnet_conv_layers):
        p = f"postnet.conv_batchnorms.{i}"
        y = _bn_eval(state, f"{p}.bn", _conv_nlc(state, f"{p}.conv", y))
        if i != postnet_conv_layers - 1:
            y = torch.tanh(y)
    out = {"mel_output": mel.numpy(),
           "mel_outputs_postnet": (mel + y).numpy(),
           "alignments": torch.stack(aligns, dim=1).numpy()}
    if use_stop_token:
        out["stop_logits"] = torch.cat(stops, dim=1).numpy()
    return out
