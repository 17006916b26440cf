"""Padding batchers with TPU-friendly bucketed shapes.

Host-side equivalents of the reference's batch functions (reference:
parakeet/data/batch.py:42-189) with one crucial TPU-first change: instead of
padding to the longest item *in the batch* (a different shape every step,
causing one XLA recompile per new length), lengths are padded up to a bucket
boundary so the set of compiled shapes is small and the jit cache stays warm.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

__all__ = [
    "round_up", "bucket_length", "batch_sequences", "batch_text_id",
    "batch_wav", "batch_spec",
]


def round_up(n: int, multiple: int) -> int:
    return ((n + multiple - 1) // multiple) * multiple


def bucket_length(max_len: int,
                  bucket_size: int = 32,
                  cap: Optional[int] = None) -> int:
    """Smallest bucket boundary >= max_len (optionally capped)."""
    length = round_up(max(max_len, 1), bucket_size)
    if cap is not None:
        length = min(length, cap)
    return length


def batch_sequences(seqs: Sequence[np.ndarray],
                    axis: int = 0,
                    pad_value: float = 0.0,
                    bucket_size: int = 1,
                    length: Optional[int] = None) -> np.ndarray:
    """Stack variable-length arrays, padding ``axis`` to a common length.

    ``length`` overrides the computed (bucketed) target length; items longer
    than it are truncated.
    """
    seqs = [np.asarray(s) for s in seqs]
    if axis != 0:
        seqs = [np.moveaxis(s, axis, 0) for s in seqs]
    max_len = max(s.shape[0] for s in seqs)
    target = length if length is not None else bucket_length(
        max_len, bucket_size)
    trailing = seqs[0].shape[1:]
    out = np.full((len(seqs), target, *trailing), pad_value,
                  dtype=seqs[0].dtype)
    for i, s in enumerate(seqs):
        n = min(s.shape[0], target)
        out[i, :n] = s[:n]
    if axis != 0:
        out = np.moveaxis(out, 1, axis + 1)
    return out


def _batch_with_lengths(seqs, pad_value, dtype, bucket_size, length):
    seqs = [np.asarray(s, dtype=dtype) for s in seqs]
    lengths = np.array([min(len(s), length) if length else len(s)
                        for s in seqs], dtype=np.int64)
    padded = batch_sequences(seqs, pad_value=pad_value,
                             bucket_size=bucket_size, length=length)
    return padded, lengths


def batch_text_id(texts, pad_id: int = 0, dtype=np.int64,
                  bucket_size: int = 1, length: Optional[int] = None):
    """Pad id sequences; returns (ids (B, T), lengths (B,))."""
    return _batch_with_lengths(texts, pad_id, dtype, bucket_size, length)


def batch_wav(wavs, pad_value: float = 0.0, dtype=np.float32,
              bucket_size: int = 1, length: Optional[int] = None):
    """Pad mono waveforms; returns (wav (B, T), lengths (B,))."""
    return _batch_with_lengths(wavs, pad_value, dtype, bucket_size, length)


def batch_spec(specs, pad_value: float = 0.0, dtype=np.float32,
               time_axis: int = 0, bucket_size: int = 1,
               length: Optional[int] = None):
    """Pad spectrograms along ``time_axis``; returns (spec, lengths)."""
    specs = [np.asarray(s, dtype=dtype) for s in specs]
    lengths = np.array(
        [min(s.shape[time_axis], length) if length else s.shape[time_axis]
         for s in specs], dtype=np.int64)
    padded = batch_sequences(specs, axis=time_axis, pad_value=pad_value,
                             bucket_size=bucket_size, length=length)
    return padded, lengths
