"""Native C++ DSP library parity tests (skipped when not built)."""
import numpy as np
import pytest

from parakeet_tpu import native
from parakeet_tpu.audio.spectrum import mel_filterbank
from parakeet_tpu.audio.spectrum import stft as np_stft

pytestmark = pytest.mark.skipif(not native.is_available(),
                                reason="native DSP library not built")


@pytest.fixture(scope="module")
def sine():
    sr = 24000
    t = np.arange(sr) / sr
    return (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32), sr


def test_native_stft_matches_numpy(sine):
    wav, _ = sine
    got = native.stft_magnitude(wav, 512, 128, 512)
    ref = np.abs(np_stft(wav, n_fft=512, hop_length=128, win_length=512))
    if ref.shape != got.shape:
        ref = ref.T
    assert got.shape == ref.shape
    rel = np.max(np.abs(got - ref)) / ref.max()
    assert rel < 1e-5


def test_native_mel_matches_matmul(sine):
    wav, sr = sine
    mag = native.stft_magnitude(wav, 512, 128, 512)
    fb = mel_filterbank(sr, 512, 20).astype(np.float32)
    got = native.apply_mel(mag, fb)
    ref = mag @ fb.T
    assert np.max(np.abs(got - ref)) / ref.max() < 1e-5


def test_native_yin_pitch_sine(sine):
    wav, sr = sine
    f0 = native.yin_pitch(wav, sr, 2048, 256, 80, 400)
    voiced = f0[f0 > 0]
    assert len(voiced) > 0.5 * len(f0)
    assert abs(np.median(voiced) - 220.0) < 3.0
