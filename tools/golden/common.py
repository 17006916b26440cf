"""Shared torch helpers for the golden oracles.

Every oracle consumes a paddle-layout state dict whose values are
numpy arrays (forward parity) or requires_grad torch leaves (gradient
parity).  These helpers implement that dual-mode plumbing once.
"""
from __future__ import annotations

import numpy as np
import torch

DT = torch.float64

BUFFER_SUFFIXES = ("._mean", "._variance")


def to_tensor(v):
    """Value -> fp64 torch tensor; requires_grad leaves pass through."""
    if isinstance(v, torch.Tensor):
        return v if v.dtype == DT else v.to(DT)
    return torch.as_tensor(np.asarray(v), dtype=DT)


def make_grad_state(state, buffer_suffixes=BUFFER_SUFFIXES):
    """fp64 requires_grad leaf per parameter; buffers (BN running
    stats) stay grad-free so they collect zero grads."""
    out = {}
    for k, v in state.items():
        t = torch.as_tensor(np.asarray(v), dtype=DT)
        if not any(k.endswith(s) for s in buffer_suffixes):
            t = t.clone().requires_grad_(True)
        out[k] = t
    return out


def grads_of(grad_state):
    """{name: fp64 numpy grad} after backward(); grad-free leaves
    (buffers, params off the loss graph) yield zeros."""
    return {k: (t.grad.detach().numpy() if t.grad is not None
                else np.zeros(t.shape, np.float64))
            for k, t in grad_state.items()}
