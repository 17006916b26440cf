"""Torch golden oracle for the GE2E LSTM speaker encoder.

Implements the reference LSTMSpeakerEncoder math (reference:
parakeet/models/lstm_speaker_encoder.py:24-147: 3-layer LSTM -> Linear
-> ReLU -> L2 normalize; similarity matrix against inclusive centroids
with the own-speaker column replaced by leave-one-out centroids; scaled
by (similarity_weight, similarity_bias); softmax cross-entropy loss)
in float64 torch, consuming a paddle-layout state dict.

The LSTM itself is torch.nn.LSTM — torch and paddle share the
(weight_ih (4H, in), weight_hh (4H, H), bias_ih + bias_hh, gate order
i,f,c/g,o) convention, so loading the paddle tensors verbatim exercises
exactly the gate-order/bias-folding mapping `utils.convert.convert_ge2e`
performs for flax (SURVEY §7 named LSTM gate order a hard part).
"""
from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F

from .common import DT, to_tensor


def _t(state, key):
    return to_tensor(state[key])


def _forward_t(state, utterances, n_speakers, *, num_layers=3,
               hidden_size=None):
    """Torch forward returning (embeds_flat, logits, loss, lstm module).
    The lstm module's parameters are leaf tensors loaded from ``state``
    (grad-capable)."""
    x = torch.as_tensor(np.asarray(utterances), dtype=DT)
    n_mels = x.shape[-1]
    if hidden_size is None:
        hidden_size = state["lstm.weight_hh_l0"].shape[1]

    lstm = torch.nn.LSTM(n_mels, hidden_size, num_layers=num_layers,
                         batch_first=True).to(DT)
    with torch.no_grad():
        for la in range(num_layers):
            getattr(lstm, f"weight_ih_l{la}").copy_(
                _t(state, f"lstm.weight_ih_l{la}"))
            getattr(lstm, f"weight_hh_l{la}").copy_(
                _t(state, f"lstm.weight_hh_l{la}"))
            getattr(lstm, f"bias_ih_l{la}").copy_(
                _t(state, f"lstm.bias_ih_l{la}"))
            getattr(lstm, f"bias_hh_l{la}").copy_(
                _t(state, f"lstm.bias_hh_l{la}"))
    _, (h, _) = lstm(x)
    # paddle Linear stores (in, out); torch F.linear wants (out, in)
    e = F.relu(h[-1] @ _t(state, "linear.weight")
               + _t(state, "linear.bias"))
    embeds_flat = F.normalize(e, dim=-1)

    n = n_speakers
    m = embeds_flat.shape[0] // n
    embeds = embeds_flat.reshape(n, m, -1)

    centroids_incl = embeds.mean(dim=1)
    centroids_incl = F.normalize(centroids_incl, dim=-1)
    centroids_excl = (embeds.sum(dim=1, keepdim=True) - embeds) / (m - 1)
    centroids_excl = F.normalize(centroids_excl, dim=-1)

    sim = torch.einsum("ijd,kd->ijk", embeds, centroids_incl)
    own = torch.einsum("ijd,ijd->ij", embeds, centroids_excl)
    eye = torch.eye(n, dtype=DT)
    sim = sim * (1 - eye)[:, None, :] + own[..., None] * eye[:, None, :]

    w = _t(state, "similarity_weight").reshape(())
    b = _t(state, "similarity_bias").reshape(())
    logits = (sim * w + b).reshape(n * m, n)
    target = torch.arange(n).unsqueeze(-1).expand(n, m).reshape(-1)
    loss = F.cross_entropy(logits, target)
    return embeds_flat, logits, loss, lstm


def golden_ge2e_forward(state, utterances, n_speakers, *, num_layers=3,
                        hidden_size=None):
    """utterances (N*M, T, n_mels) -> dict(embeds (N*M, d),
    sim (N*M, N), loss scalar), float64 numpy."""
    embeds_flat, logits, loss, _ = _forward_t(
        state, utterances, n_speakers, num_layers=num_layers,
        hidden_size=hidden_size)
    return {
        "embeds": embeds_flat.detach().numpy(),
        "sim": logits.detach().numpy(),
        "loss": np.asarray(loss.detach().numpy()).reshape(1),
    }


def golden_ge2e_loss_and_grads(state, utterances, n_speakers, *,
                               num_layers=3):
    """Training-numerics oracle: d GE2E loss / d params in fp64,
    including the reference's do_gradient_ops x0.01 scaling of the
    similarity (weight, bias) grads (lstm_speaker_encoder.py:105-109).

    The LSTM gradient comes from torch.nn.LSTM autograd (production
    recurrence, i-f-c-o gates).  paddle's bias_ih and bias_hh enter the
    cell only as their sum, so their grads are equal; the returned dict
    zeroes ``bias_hh_l{k}`` so ``convert_ge2e``'s bias fold
    (bias_ih + bias_hh -> one flax bias) maps the gradient exactly.
    Assumes similarity_weight > 0 (true of trained checkpoints; our
    ge2e_loss keeps w positive via relu, identity for w > 0).
    Returns (loss float, {paddle name: fp64 numpy grad}).
    """
    grad_state = {
        k: torch.as_tensor(np.asarray(v),
                           dtype=DT).clone().requires_grad_(True)
        for k, v in state.items() if not k.startswith("lstm.")}
    # lstm params become the torch module's own leaves inside _forward_t
    for k, v in state.items():
        if k.startswith("lstm."):
            grad_state[k] = v

    _, _, loss, lstm = _forward_t(grad_state, utterances, n_speakers,
                                  num_layers=num_layers)
    loss.backward()

    grads = {}
    for la in range(num_layers):
        for nm in ("weight_ih", "weight_hh", "bias_ih"):
            p = getattr(lstm, f"{nm}_l{la}")
            grads[f"lstm.{nm}_l{la}"] = p.grad.detach().numpy()
        grads[f"lstm.bias_hh_l{la}"] = np.zeros(
            grad_state[f"lstm.bias_hh_l{la}"].shape, np.float64)
    for k in ("linear.weight", "linear.bias",
              "similarity_weight", "similarity_bias"):
        g = grad_state[k].grad
        grads[k] = (g.detach().numpy() if g is not None
                    else np.zeros(grad_state[k].shape, np.float64))
    grads["similarity_weight"] = grads["similarity_weight"] * 0.01
    grads["similarity_bias"] = grads["similarity_bias"] * 0.01
    return float(loss.detach()), grads
