"""Structural similarity (SSIM) between spectrogram "images".

JAX equivalent of the reference's SSIM metric (parakeet/modules/ssim.py:64),
used by the SpeedySpeech updater as an auxiliary mel loss
(parakeet/models/speedyspeech/speedyspeech_updater.py:48).  Standard SSIM
with an 11x11 Gaussian window (sigma 1.5) applied per channel.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["ssim"]


@functools.lru_cache(maxsize=8)
def _gaussian_window(win_size: int, sigma: float) -> np.ndarray:
    g = np.exp(-((np.arange(win_size) - win_size // 2) ** 2)
               / (2.0 * sigma ** 2))
    g = g / g.sum()
    w = np.outer(g, g).astype(np.float32)
    return w[None, None]  # (1, 1, K, K) OIHW


def _filter2d(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Depthwise 2-D conv with SAME padding; x: (B, C, H, W)."""
    c = x.shape[1]
    kernel = jnp.tile(kernel, (c, 1, 1, 1))
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding="SAME",
        feature_group_count=c,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, win_size: int = 11,
         sigma: float = 1.5, data_range: float = 1.0) -> jnp.ndarray:
    """Mean SSIM of two batches of images (B, C, H, W)."""
    # loss metric: compute in fp32 regardless of the model compute dtype
    img1 = img1.astype(jnp.float32)
    img2 = img2.astype(jnp.float32)
    w = jnp.asarray(_gaussian_window(win_size, sigma))
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2

    mu1 = _filter2d(img1, w)
    mu2 = _filter2d(img2, w)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _filter2d(img1 * img1, w) - mu1_sq
    sigma2_sq = _filter2d(img2 * img2, w) - mu2_sq
    sigma12 = _filter2d(img1 * img2, w) - mu12

    ssim_map = ((2 * mu12 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2))
    return jnp.mean(ssim_map)
