"""ctypes bindings for the native host-DSP library (native/src/dsp.cc).

The reference's host DSP is native C under python wrappers (librosa ->
scipy/fftpack, pyworld -> WORLD C++); this module is our equivalent.
Gracefully unavailable when the shared library has not been built — the
numpy implementations in :mod:`parakeet_tpu.audio` remain the reference
semantics; these bindings accelerate the preprocess recipes.

Build:  make -C native
"""
from __future__ import annotations

import ctypes
import os
from pathlib import Path
from typing import Optional

import numpy as np

__all__ = ["is_available", "stft_magnitude", "apply_mel", "yin_pitch"]

_LIB: Optional[ctypes.CDLL] = None


def _find_library() -> Optional[Path]:
    env = os.environ.get("PARAKEET_TPU_NATIVE_LIB")
    if env and Path(env).exists():
        return Path(env)
    root = Path(__file__).resolve().parent.parent.parent
    cand = root / "native" / "libparakeet_dsp.so"
    return cand if cand.exists() else None


def _load() -> Optional[ctypes.CDLL]:
    global _LIB
    if _LIB is not None:
        return _LIB
    path = _find_library()
    if path is None:
        return None
    lib = ctypes.CDLL(str(path))
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.pk_stft_magnitude.restype = ctypes.c_int64
    lib.pk_stft_magnitude.argtypes = [
        f32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int, f32p]
    lib.pk_apply_mel.restype = None
    lib.pk_apply_mel.argtypes = [
        f32p, ctypes.c_int64, ctypes.c_int64, f32p, ctypes.c_int64, f32p]
    lib.pk_yin_pitch.restype = ctypes.c_int64
    lib.pk_yin_pitch.argtypes = [
        f32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_double, ctypes.c_double, ctypes.c_double,
        f32p]
    _LIB = lib
    return lib


def is_available() -> bool:
    return _load() is not None


def _f32(x: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(x, dtype=np.float32)


def _ptr(x: np.ndarray):
    return x.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def stft_magnitude(wav: np.ndarray, n_fft: int, hop_length: int,
                   win_length: Optional[int] = None,
                   center: bool = True) -> np.ndarray:
    """(T,) -> (n_frames, n_fft // 2 + 1) |STFT| (Hann window)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native DSP library not built (make -C native)")
    wav = _f32(wav)
    win_length = win_length or n_fft
    pad = n_fft // 2 if center else 0
    n_frames = 1 + (len(wav) + 2 * pad - n_fft) // hop_length
    out = np.empty((n_frames, n_fft // 2 + 1), np.float32)
    got = lib.pk_stft_magnitude(_ptr(wav), len(wav), n_fft, hop_length,
                                win_length, int(center), _ptr(out))
    if got < 0:
        raise ValueError(f"pk_stft_magnitude failed: {got}")
    return out[:got]


def apply_mel(spec: np.ndarray, fb: np.ndarray) -> np.ndarray:
    """spec (n_frames, n_bins) @ fb (n_mels, n_bins)^T."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native DSP library not built (make -C native)")
    spec, fb = _f32(spec), _f32(fb)
    out = np.empty((spec.shape[0], fb.shape[0]), np.float32)
    lib.pk_apply_mel(_ptr(spec), spec.shape[0], spec.shape[1], _ptr(fb),
                     fb.shape[0], _ptr(out))
    return out


def yin_pitch(wav: np.ndarray, sr: int, frame_length: int, hop_length: int,
              f0min: float = 80.0, f0max: float = 7600.0,
              threshold: float = 0.15) -> np.ndarray:
    """(T,) -> per-frame f0 in Hz (0 = unvoiced)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native DSP library not built (make -C native)")
    wav = _f32(wav)
    pad = frame_length // 2
    n_frames = 1 + (len(wav) + 2 * pad - frame_length) // hop_length
    out = np.empty(n_frames, np.float32)
    got = lib.pk_yin_pitch(_ptr(wav), len(wav), sr, frame_length,
                           hop_length, f0min, f0max, threshold, _ptr(out))
    if got < 0:
        raise ValueError(f"pk_yin_pitch failed: {got}")
    return out[:got]
