"""Spectral losses for vocoder training (device side).

Functional equivalents of the reference's STFT losses
(reference: parakeet/modules/stft_loss.py:70-219) with the same defaults:
multi-resolution FFT sizes (1024, 2048, 512), hops (120, 240, 50), windows
(600, 1200, 240), averaged over resolutions.
"""
from __future__ import annotations

import jax.numpy as jnp

from .stft import stft_magnitude

__all__ = ["spectral_convergence_loss", "log_stft_magnitude_loss",
           "stft_loss", "multi_resolution_stft_loss",
           "MultiResolutionSTFTLoss"]


def spectral_convergence_loss(x_mag: jnp.ndarray, y_mag: jnp.ndarray
                              ) -> jnp.ndarray:
    """||y - x||_F / ||y||_F over the whole batch."""
    num = jnp.sqrt(jnp.sum(jnp.square(y_mag - x_mag)))
    den = jnp.sqrt(jnp.sum(jnp.square(y_mag)))
    return num / jnp.maximum(den, 1e-10)


def log_stft_magnitude_loss(x_mag: jnp.ndarray, y_mag: jnp.ndarray,
                            eps: float = 1e-7) -> jnp.ndarray:
    """L1 between log magnitudes."""
    return jnp.mean(jnp.abs(jnp.log(jnp.clip(y_mag, eps, None))
                            - jnp.log(jnp.clip(x_mag, eps, None))))


def stft_loss(x: jnp.ndarray, y: jnp.ndarray, fft_size: int = 1024,
              hop_length: int = 120, win_length: int = 600,
              window: str = "hann") -> tuple[jnp.ndarray, jnp.ndarray]:
    """(sc_loss, mag_loss) between predicted x and target y, both (B, T)."""
    x_mag = stft_magnitude(x, fft_size, hop_length, win_length, window)
    y_mag = stft_magnitude(y, fft_size, hop_length, win_length, window)
    return (spectral_convergence_loss(x_mag, y_mag),
            log_stft_magnitude_loss(x_mag, y_mag))


def multi_resolution_stft_loss(
        x: jnp.ndarray,
        y: jnp.ndarray,
        fft_sizes=(1024, 2048, 512),
        hop_sizes=(120, 240, 50),
        win_lengths=(600, 1200, 240),
        window: str = "hann") -> tuple[jnp.ndarray, jnp.ndarray]:
    """Averaged (sc, mag) losses over resolutions; x, y: (B, T) or (B, C, T)."""
    assert len(fft_sizes) == len(hop_sizes) == len(win_lengths)
    if x.ndim == 3:
        x = x.reshape(-1, x.shape[-1])
        y = y.reshape(-1, y.shape[-1])
    sc_total = 0.0
    mag_total = 0.0
    for fs, hs, wl in zip(fft_sizes, hop_sizes, win_lengths):
        sc, mag = stft_loss(x, y, fs, hs, wl, window)
        sc_total = sc_total + sc
        mag_total = mag_total + mag
    n = len(fft_sizes)
    return sc_total / n, mag_total / n


class MultiResolutionSTFTLoss:
    """Config-holding callable wrapper around multi_resolution_stft_loss."""

    def __init__(self, fft_sizes=(1024, 2048, 512), hop_sizes=(120, 240, 50),
                 win_lengths=(600, 1200, 240), window: str = "hann"):
        self.fft_sizes = tuple(fft_sizes)
        self.hop_sizes = tuple(hop_sizes)
        self.win_lengths = tuple(win_lengths)
        self.window = window

    def __call__(self, x, y):
        return multi_resolution_stft_loss(
            x, y, self.fft_sizes, self.hop_sizes, self.win_lengths,
            self.window)
