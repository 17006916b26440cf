"""Torch golden oracle for TransformerTTS (teacher-forced forward).

Implements the reference forward math (reference:
parakeet/models/transformer_tts/transformer_tts.py:386-510: eos append,
plain-Embedding encoder input, pre-LN encoder with conv FFN, decoder
prenet + projection + scaled pos enc, causal pre-LN decoder with linear
FFN, feat/prob heads, conv-BN postnet) as functional torch, consuming a
paddle-layout state dict.  Prenet dropout must be 0 on both sides for a
deterministic comparison (the reference prenet's dropout is always-on).
"""
from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F

from .common import DT, grads_of, make_grad_state
from .fastspeech2 import (_conv1d_ncl, _encoder_stack, _layernorm_last,
                          _linear, _mha, _pos_table, _t)


def golden_transformer_tts_forward(state, text, ilens, speech, olens, *,
                                   odim, eos, heads=2, elayers=1,
                                   dlayers=1, dprenet_layers=2,
                                   postnet_layers=2, reduction_factor=1):
    """text (B, Tmax) int (without eos), speech (B, Lmax, odim).
    Returns dict of float64 numpy arrays."""
    out = _forward(state, text, ilens, speech, olens, odim=odim, eos=eos,
                   heads=heads, elayers=elayers, dlayers=dlayers,
                   dprenet_layers=dprenet_layers,
                   postnet_layers=postnet_layers,
                   reduction_factor=reduction_factor)
    return {k: out[k].detach().numpy()
            for k in ("before_outs", "after_outs", "stop_logits")}


def _forward(state, text, ilens, speech, olens, *,
             odim, eos, heads=2, elayers=1,
             dlayers=1, dprenet_layers=2,
             postnet_layers=2, reduction_factor=1, bn_train=False):
    """Torch-tensor forward (grad-capable when ``state`` holds
    requires_grad tensors).  ``bn_train``: postnet BatchNorm uses
    minibatch statistics (what a train step does)."""
    text = torch.as_tensor(np.asarray(text)).long()
    ilens = torch.as_tensor(np.asarray(ilens)).long()
    ys = torch.as_tensor(np.asarray(speech), dtype=DT)
    olens = torch.as_tensor(np.asarray(olens)).long()
    B = text.shape[0]
    r = reduction_factor

    # append eos at each sequence end (transformer_tts.py:419-425)
    text = F.pad(text, (0, 1))
    text[torch.arange(B), ilens] = eos
    ilens = ilens + 1
    T_enc = text.shape[1]
    enc_keep = (torch.arange(T_enc).unsqueeze(0)
                < ilens.unsqueeze(1)).unsqueeze(1)      # (B, 1, T)

    emb = _t(state, "encoder.embed.0.weight")[text]
    hs = _encoder_stack(state, "encoder", emb, enc_keep, elayers, heads,
                        has_embed=True)

    # decoder input: thin by r, shift right, prenet (+proj), pos enc
    ys_in = ys[:, r - 1::r]
    ys_in = torch.cat([torch.zeros_like(ys_in[:, :1]), ys_in[:, :-1]],
                      dim=1)
    h = ys_in
    for j in range(dprenet_layers):
        h = F.relu(_linear(state, f"decoder.embed.0.0.prenet.{j}.0", h))
    h = _linear(state, "decoder.embed.0.1", h)
    alpha = _t(state, "decoder.embed.1.alpha").reshape(())
    h = h + alpha * _pos_table(h.shape[1], h.shape[-1])

    n_steps = h.shape[1]
    olens_in = olens // r
    step_keep = (torch.arange(n_steps).unsqueeze(0)
                 < olens_in.unsqueeze(1))               # (B, n_steps)
    causal = torch.tril(torch.ones(n_steps, n_steps, dtype=torch.bool))
    self_keep = step_keep.unsqueeze(1) & causal.unsqueeze(0)  # (B, T, T)

    _mha.heads = heads
    x = h
    for i in range(dlayers):
        lp = f"decoder.decoders.{i}"
        resid = x
        xn = _layernorm_last(state, f"{lp}.norm1", x)
        x = resid + _mha(state, f"{lp}.self_attn", xn, self_keep)
        resid = x
        xn = _layernorm_last(state, f"{lp}.norm2", x)
        x = resid + _mha_cross(state, f"{lp}.src_attn", xn, hs, enc_keep,
                               heads)
        resid = x
        xn = _layernorm_last(state, f"{lp}.norm3", x)
        y = F.relu(_linear(state, f"{lp}.feed_forward.w_1", xn))
        x = resid + _linear(state, f"{lp}.feed_forward.w_2", y)
    zs = _layernorm_last(state, "decoder.after_norm", x)

    before = _linear(state, "feat_out", zs).reshape(B, -1, odim)
    logits = _linear(state, "prob_out", zs).reshape(B, -1)

    p = before.transpose(1, 2)
    for i in range(postnet_layers):
        pp = f"postnet.postnet.{i}"
        p = _conv1d_ncl(state, f"{pp}.0", p, bias=False)
        if bn_train:
            mean = p.mean(dim=(0, 2))
            var = p.var(dim=(0, 2), unbiased=False)
        else:
            mean = _t(state, f"{pp}.1._mean")
            var = _t(state, f"{pp}.1._variance")
        w, b = _t(state, f"{pp}.1.weight"), _t(state, f"{pp}.1.bias")
        p = (p - mean[:, None]) / torch.sqrt(var[:, None] + 1e-5) \
            * w[:, None] + b[:, None]
        if i != postnet_layers - 1:
            p = torch.tanh(p)
    after = before + p.transpose(1, 2)
    return {"before_outs": before, "after_outs": after,
            "stop_logits": logits}


def golden_transformer_tts_loss_and_grads(state, text, ilens, speech,
                                          olens, *, odim, eos,
                                          bce_pos_weight=5.0, **kw):
    """Training-numerics oracle: d TransformerTTSLoss / d params in fp64.

    Loss mirrors the reference TransformerTTSLoss with use_masking=True
    and loss_type="L1" (transformer_tts.py:770-873): masked mean L1 on
    before+after outs plus masked BCE-with-logits on the stop head with
    ``pos_weight`` and one-hot labels at the final valid frame.  Postnet
    BN runs in train mode.  BN running stats (buffers) get zero grads.
    Returns (loss float, {paddle name: fp64 numpy grad}).
    """
    grad_state = make_grad_state(state)
    out = _forward(grad_state, text, ilens, speech, olens, odim=odim,
                   eos=eos, bn_train=True, **kw)
    ys = torch.as_tensor(np.asarray(speech), dtype=DT)
    olens_t = torch.as_tensor(np.asarray(olens)).long()
    t_dec = ys.shape[1]
    idx = torch.arange(t_dec).unsqueeze(0)
    mask = (idx < olens_t.unsqueeze(1)).to(DT)            # (B, L)
    m3 = mask.unsqueeze(-1)
    denom = (m3.sum() * odim).clamp(min=1.0)
    l1 = ((out["before_outs"] - ys).abs() * m3).sum() / denom \
        + ((out["after_outs"] - ys).abs() * m3).sum() / denom
    labels = (idx == (olens_t - 1).unsqueeze(1)).to(DT)
    logits = out["stop_logits"]
    log_p = F.logsigmoid(logits)
    log_not_p = F.logsigmoid(-logits)
    per = -(bce_pos_weight * labels * log_p + (1.0 - labels) * log_not_p)
    bce = (per * mask).sum() / mask.sum().clamp(min=1.0)
    loss = l1 + bce
    loss.backward()
    return float(loss.detach()), grads_of(grad_state)


def _mha_cross(state, prefix, q_in, kv_in, mask_keep, heads):
    """Cross-attention variant of the ESPnet MHA."""
    B, Tq, feat = q_in.shape
    Tk = kv_in.shape[1]
    dk = feat // heads
    q = _linear(state, f"{prefix}.linear_q", q_in) \
        .reshape(B, Tq, heads, dk).transpose(1, 2)
    k = _linear(state, f"{prefix}.linear_k", kv_in) \
        .reshape(B, Tk, heads, dk).transpose(1, 2)
    v = _linear(state, f"{prefix}.linear_v", kv_in) \
        .reshape(B, Tk, heads, dk).transpose(1, 2)
    scores = q @ k.transpose(-2, -1) / (dk ** 0.5)
    neg = torch.finfo(DT).min
    scores = scores.masked_fill(~mask_keep.unsqueeze(1), neg)
    attn = torch.softmax(scores, dim=-1)
    attn = attn.masked_fill(~mask_keep.unsqueeze(1), 0.0)
    out = (attn @ v).transpose(1, 2).reshape(B, Tq, feat)
    return _linear(state, f"{prefix}.linear_out", out)
