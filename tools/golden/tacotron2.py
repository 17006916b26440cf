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

from .common import DT, grads_of, make_grad_state, to_tensor


def _t(state, key):
    return to_tensor(state[key])


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


def _bn(state, prefix, x, train=False):
    """BatchNorm1D over the last axis of (B, T, C); ``train`` uses
    minibatch statistics (over B and T) instead of running stats."""
    if train:
        mean = x.mean(dim=(0, 1))
        var = x.var(dim=(0, 1), unbiased=False)
    else:
        mean = _t(state, f"{prefix}._mean")
        var = _t(state, f"{prefix}._variance")
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
    out = _forward(state, text, mels, reduction_factor=reduction_factor,
                   encoder_conv_layers=encoder_conv_layers,
                   postnet_conv_layers=postnet_conv_layers,
                   use_stop_token=use_stop_token)
    return {k: v.detach().numpy() for k, v in out.items()}


def _forward(state, text, mels, *, reduction_factor=1,
             encoder_conv_layers=2, postnet_conv_layers=2,
             use_stop_token=True, bn_train=False):
    """Torch-tensor forward (grad-capable when ``state`` holds
    requires_grad tensors).  ``bn_train``: encoder/postnet BatchNorm
    uses minibatch statistics (what a train step does)."""
    text = torch.as_tensor(np.asarray(text)).long()
    mels = torch.as_tensor(np.asarray(mels), dtype=DT)
    B = text.shape[0]

    x = _t(state, "embedding.weight")[text]
    for i in range(encoder_conv_layers):
        p = f"encoder.conv_batchnorms.{i}"
        x = F.relu(_bn(state, f"{p}.bn",
                       _conv_nlc(state, f"{p}.conv", x), train=bn_train))
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
        y = _bn(state, f"{p}.bn", _conv_nlc(state, f"{p}.conv", y),
                train=bn_train)
        if i != postnet_conv_layers - 1:
            y = torch.tanh(y)
    out = {"mel_output": mel,
           "mel_outputs_postnet": mel + y,
           "alignments": torch.stack(aligns, dim=1)}
    if use_stop_token:
        out["stop_logits"] = torch.cat(stops, dim=1)
    return out


def golden_tacotron2_loss_and_grads(state, text, mels, *,
                                    stop_pos_weight=1.0, sigma=0.2,
                                    **kw):
    """Training-numerics oracle: d Tacotron2Loss / d params in fp64.

    Loss mirrors the reference Tacotron2Loss (tacotron2.py:886-980),
    defaults included (sigma=0.2, unweighted stop BCE i.e.
    pos_weight=1), with full-length inputs (no padding; the oracle
    forward does not model masks): mel MSE + postnet MSE + stop
    BCE-with-logits (one-hot label at the final decoder step) + guided
    attention loss (W = 1 - exp(-(n/N - t/T)^2 / 2 sigma^2), mean over
    batch of sum(W*A)/(N*T)).  Encoder/postnet BN runs in train mode;
    conv biases feeding train-mode BN are no-ops (their oracle grads
    are ~0 and our model folds them away).  LSTM bias_ih/bias_hh enter
    only as their sum, so their grads are equal; ``bias_hh*`` entries
    are zeroed so the converter's bias fold maps gradients exactly.
    Returns (loss float, {paddle name: fp64 numpy grad}).
    """
    grad_state = make_grad_state(state)
    out = _forward(grad_state, text, mels, bn_train=True, **kw)
    ys = torch.as_tensor(np.asarray(mels), dtype=DT)
    B, t_dec, d_mels = ys.shape
    n_el = float(B * t_dec * d_mels)
    mel_loss = (out["mel_output"] - ys).pow(2).sum() / n_el
    post_loss = (out["mel_outputs_postnet"] - ys).pow(2).sum() / n_el
    loss = mel_loss + post_loss

    logits = out["stop_logits"].reshape(B, -1)
    n_steps = logits.shape[1]
    labels = (torch.arange(n_steps).unsqueeze(0)
              == (n_steps - 1)).to(DT).expand(B, n_steps)
    log_p = F.logsigmoid(logits)
    log_not_p = F.logsigmoid(-logits)
    per = -(stop_pos_weight * labels * log_p + (1.0 - labels) * log_not_p)
    loss = loss + per.mean()

    attn = out["alignments"]                       # (B, n_steps, T_enc)
    t_enc = attn.shape[-1]
    dec_pos = torch.arange(n_steps, dtype=DT) / n_steps
    enc_pos = torch.arange(t_enc, dtype=DT) / t_enc
    w = 1.0 - torch.exp(
        -((dec_pos[:, None] - enc_pos[None, :]) ** 2) / (2 * sigma ** 2))
    loss = loss + ((w * attn).sum(dim=(1, 2))
                   / float(n_steps * t_enc)).mean()
    loss.backward()
    grads = grads_of(grad_state)
    for k in grads:
        if ".bias_hh" in k:           # see docstring: fold-duplicate
            grads[k] = np.zeros_like(grads[k])
    return float(loss.detach()), grads
