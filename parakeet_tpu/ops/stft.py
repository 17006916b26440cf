"""Device-side STFT / mel, formulated as matmuls for the TPU MXU.

Instead of porting the reference's conv1d-with-DFT-weights trick
(reference: parakeet/modules/audio.py:74-218) or relying on an FFT op, the
transform is expressed directly as two dense matmuls against precomputed
windowed DFT basis matrices: frames (B*F, n_fft) @ basis (n_fft, n_bins).
On TPU this maps straight onto the systolic array and XLA fuses the
magnitude/mel/log elementwise tail into the matmul epilogue.  Differentiable;
used by the multi-resolution STFT losses and on-device feature extraction.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..audio.spectrum import get_window as _np_window
from ..audio.spectrum import mel_filterbank

__all__ = ["stft", "stft_magnitude", "mel_spectrogram",
           "log_mel_spectrogram", "dft_basis", "frame"]


@functools.lru_cache(maxsize=32)
def dft_basis(n_fft: int, win_length: int, window: str = "hann"
              ) -> tuple[np.ndarray, np.ndarray]:
    """Windowed real-DFT basis, two (n_fft, 1 + n_fft // 2) float32 arrays.

    ``real[n, k] = w[n] cos(2 pi n k / N)``, ``imag[n, k] = -w[n] sin(...)``
    with the window zero-padded centered to ``n_fft``.
    """
    win = _np_window(window, win_length)
    lpad = (n_fft - win_length) // 2
    w = np.zeros(n_fft)
    w[lpad:lpad + win_length] = win
    n = np.arange(n_fft)[:, None]
    k = np.arange(1 + n_fft // 2)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    real = (w[:, None] * np.cos(ang)).astype(np.float32)
    imag = (-w[:, None] * np.sin(ang)).astype(np.float32)
    return real, imag


def frame(x: jnp.ndarray, frame_length: int, hop_length: int,
          center: bool = True, pad_mode: str = "reflect") -> jnp.ndarray:
    """(B, T) -> (B, n_frames, frame_length) overlapping frames."""
    if center:
        pad = frame_length // 2
        x = jnp.pad(x, ((0, 0), (pad, pad)), mode=pad_mode)
    n_frames = 1 + (x.shape[-1] - frame_length) // hop_length
    idx = (jnp.arange(n_frames)[:, None] * hop_length
           + jnp.arange(frame_length)[None, :])
    return x[:, idx]


def stft(x: jnp.ndarray,
         n_fft: int,
         hop_length: int,
         win_length: int | None = None,
         window: str = "hann",
         center: bool = True,
         pad_mode: str = "reflect",
         precision=jax.lax.Precision.HIGHEST
         ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Real/imag STFT of (B, T) -> two (B, n_frames, 1 + n_fft // 2).

    ``precision`` defaults to HIGHEST: on TPU the default matmul precision
    truncates to bfloat16 passes, which is too lossy for a DFT basis whose
    output feeds log-magnitude losses.
    """
    if win_length is None:
        win_length = n_fft
    real_b, imag_b = dft_basis(n_fft, win_length, window)
    frames = frame(x, n_fft, hop_length, center, pad_mode)
    real = jnp.einsum("bfn,nk->bfk", frames, jnp.asarray(real_b),
                      preferred_element_type=jnp.float32,
                      precision=precision)
    imag = jnp.einsum("bfn,nk->bfk", frames, jnp.asarray(imag_b),
                      preferred_element_type=jnp.float32,
                      precision=precision)
    return real, imag


def stft_magnitude(x: jnp.ndarray,
                   n_fft: int,
                   hop_length: int,
                   win_length: int | None = None,
                   window: str = "hann",
                   center: bool = True,
                   pad_mode: str = "reflect",
                   eps: float = 1e-7) -> jnp.ndarray:
    """sqrt(clip(re^2 + im^2, eps)) — (B, n_frames, n_bins).

    Matches the floor used by the reference's loss-time stft
    (parakeet/modules/stft_loss.py:66).
    """
    real, imag = stft(x, n_fft, hop_length, win_length, window, center,
                      pad_mode)
    return jnp.sqrt(jnp.clip(real * real + imag * imag, eps, None))


def mel_spectrogram(x: jnp.ndarray,
                    sr: int,
                    n_fft: int,
                    hop_length: int,
                    win_length: int | None = None,
                    window: str = "hann",
                    n_mels: int = 80,
                    fmin: float = 0.0,
                    fmax: float | None = None) -> jnp.ndarray:
    """(B, T) -> (B, n_frames, n_mels) linear mel magnitude."""
    mag = stft_magnitude(x, n_fft, hop_length, win_length, window, eps=0.0)
    fb = jnp.asarray(
        mel_filterbank(sr, n_fft, n_mels, fmin, fmax).astype(np.float32))
    return jnp.einsum("bfk,mk->bfm", mag, fb,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)


def log_mel_spectrogram(x: jnp.ndarray, *, base: str = "10",
                        eps: float = 1e-10, **kwargs) -> jnp.ndarray:
    """Log (base 10 or e) mel spectrogram, matching LogMelFBank semantics."""
    mel = jnp.clip(mel_spectrogram(x, **kwargs), eps, None)
    log = jnp.log(mel)
    if base == "10":
        log = log / jnp.log(10.0)
    return log
