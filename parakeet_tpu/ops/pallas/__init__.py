"""Pallas TPU kernels for the hot ops."""
from .stft_kernel import stft_magnitude_pallas

__all__ = ["stft_magnitude_pallas"]
