"""Matplotlib figure helpers for training observability.

Equivalent of the reference display utilities (reference:
parakeet/utils/display.py:26-110): alignment / spectrogram / waveform
figures fed to the metrics writer (TensorBoard ``add_figure``).
"""
from __future__ import annotations

import numpy as np

__all__ = ["plot_alignment", "plot_multihead_alignments",
           "plot_multilayer_multihead_alignments", "plot_spectrogram",
           "plot_waveform"]


def _plt():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


def plot_alignment(alignment, title: str | None = None):
    """(T_dec, T_enc) attention matrix -> figure."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(6, 4))
    im = ax.imshow(np.asarray(alignment).T, aspect="auto", origin="lower",
                   interpolation="none")
    fig.colorbar(im, ax=ax)
    ax.set_xlabel("decoder step")
    ax.set_ylabel("encoder step")
    if title:
        ax.set_title(title)
    fig.tight_layout()
    return fig


def plot_multihead_alignments(alignments):
    """(H, T_dec, T_enc) -> one row of head subplots."""
    plt = _plt()
    alignments = np.asarray(alignments)
    h = alignments.shape[0]
    fig, axes = plt.subplots(1, h, figsize=(4 * h, 4), squeeze=False)
    for i in range(h):
        ax = axes[0][i]
        im = ax.imshow(alignments[i].T, aspect="auto", origin="lower",
                       interpolation="none")
        fig.colorbar(im, ax=ax)
        ax.set_title(f"head {i}")
    fig.tight_layout()
    return fig


def plot_multilayer_multihead_alignments(alignments):
    """(L, H, T_dec, T_enc) -> grid of subplots."""
    plt = _plt()
    alignments = np.asarray(alignments)
    l, h = alignments.shape[:2]
    fig, axes = plt.subplots(l, h, figsize=(4 * h, 3 * l), squeeze=False)
    for i in range(l):
        for j in range(h):
            ax = axes[i][j]
            im = ax.imshow(alignments[i, j].T, aspect="auto",
                           origin="lower", interpolation="none")
            fig.colorbar(im, ax=ax)
            ax.set_title(f"layer {i} head {j}")
    fig.tight_layout()
    return fig


def plot_spectrogram(spec):
    """(T, n_mels) or (n_mels, T) log-mel -> figure."""
    plt = _plt()
    spec = np.asarray(spec)
    if spec.shape[0] > spec.shape[1]:
        spec = spec.T          # to (n_mels, T)
    fig, ax = plt.subplots(figsize=(8, 3))
    im = ax.imshow(spec, aspect="auto", origin="lower",
                   interpolation="none")
    fig.colorbar(im, ax=ax)
    ax.set_xlabel("frame")
    ax.set_ylabel("mel bin")
    fig.tight_layout()
    return fig


def plot_waveform(wav, sample_rate: int = 22050):
    plt = _plt()
    wav = np.asarray(wav)
    fig, ax = plt.subplots(figsize=(8, 2))
    t = np.arange(len(wav)) / sample_rate
    ax.plot(t, wav, linewidth=0.4)
    ax.set_xlabel("seconds")
    fig.tight_layout()
    return fig
