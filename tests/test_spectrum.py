"""DSP parity tests: host numpy STFT/mel vs scipy and device JAX STFT."""
import numpy as np
from scipy import signal as sps

from parakeet_tpu.audio import spectrum as sp
from parakeet_tpu.audio.features import (Energy, LogMelFBank, Pitch,
                                         average_by_duration)


def test_stft_matches_scipy_stft():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(4096).astype(np.float32)
    n_fft, hop = 512, 128
    ours = sp.stft(x, n_fft=n_fft, hop_length=hop, center=False)
    # scipy reference: manual framing + rfft
    win = sps.get_window("hann", n_fft, fftbins=True)
    n_frames = 1 + (len(x) - n_fft) // hop
    ref = np.stack([
        np.fft.rfft(x[i * hop:i * hop + n_fft] * win)
        for i in range(n_frames)
    ]).T
    np.testing.assert_allclose(ours, ref, atol=1e-8)


def test_stft_center_reflect_shape():
    x = np.random.default_rng(1).standard_normal(3000)
    spec = sp.stft(x, n_fft=1024, hop_length=256)
    assert spec.shape == (513, 1 + len(x) // 256)


def test_istft_roundtrip():
    rng = np.random.default_rng(2)
    x = rng.standard_normal(8192)
    spec = sp.stft(x, n_fft=1024, hop_length=256)
    rec = sp.istft(spec, hop_length=256, length=len(x))
    np.testing.assert_allclose(rec, x, atol=1e-6)


def test_mel_filterbank_slaney_properties():
    fb = sp.mel_filterbank(sr=24000, n_fft=2048, n_mels=80, fmin=80,
                           fmax=7600)
    assert fb.shape == (80, 1025)
    assert (fb >= 0).all()
    # each filter has nonzero support and peaks inside (fmin, fmax)
    freqs = np.linspace(0, 12000, 1025)
    for i in range(80):
        nz = np.flatnonzero(fb[i])
        assert nz.size > 0
        peak_freq = freqs[fb[i].argmax()]
        assert 80 <= peak_freq <= 7600
    # slaney norm: area (in Hz) of each triangle is ~2/(width) * width/2 = 1
    mel_edges = sp.mel_to_hz(
        np.linspace(sp.hz_to_mel(80), sp.hz_to_mel(7600), 82))
    widths = mel_edges[2:] - mel_edges[:-2]
    approx_area = fb.sum(axis=1) * (freqs[1] - freqs[0])
    np.testing.assert_allclose(approx_area, np.ones(80), rtol=0.15)


def test_hz_mel_roundtrip():
    f = np.array([0.0, 100.0, 999.0, 1000.0, 4000.0, 7600.0, 12000.0])
    np.testing.assert_allclose(sp.mel_to_hz(sp.hz_to_mel(f)), f, rtol=1e-10)


def test_log_mel_fbank_layout_and_range():
    rng = np.random.default_rng(3)
    wav = rng.standard_normal(24000).astype(np.float32) * 0.1
    fbank = LogMelFBank()
    mel = fbank.get_log_mel_fbank(wav)
    assert mel.shape == (1 + 24000 // 300, 80)
    assert mel.dtype == np.float32
    assert np.isfinite(mel).all()
    # log10 of clipped >= 1e-10 magnitude
    assert (mel >= -10.0 - 1e-6).all()


def test_energy_matches_formula():
    rng = np.random.default_rng(4)
    wav = rng.standard_normal(24000).astype(np.float32) * 0.3
    e = Energy().get_energy(wav, use_token_averaged_energy=False)
    mag = np.abs(sp.stft(wav.astype(np.float32), n_fft=2048, hop_length=300))
    ref = np.sqrt(np.clip((mag ** 2).sum(0), 1e-10, None))
    np.testing.assert_allclose(e, ref, rtol=1e-4)


def test_average_by_duration():
    vals = np.arange(10, dtype=np.float64)
    durs = np.array([2, 3, 0, 5])
    out = average_by_duration(vals, durs)
    assert out.shape == (4, 1)
    np.testing.assert_allclose(out[:, 0], [0.5, 3.0, 0.0, 7.0])


def test_pitch_detects_sine():
    sr = 24000
    t = np.arange(sr) / sr
    for f0 in (110.0, 220.0, 440.0):
        wav = 0.5 * np.sin(2 * np.pi * f0 * t)
        p = Pitch(sr=sr, hop_length=300, f0min=80, f0max=600)
        f0_track = p.get_pitch(wav, use_continuous_f0=False,
                               use_log_f0=False,
                               use_token_averaged_f0=False)
        voiced = f0_track[f0_track > 0]
        assert voiced.size > 0.8 * f0_track.size
        med = np.median(voiced)
        assert abs(med - f0) / f0 < 0.03, (f0, med)


def test_pitch_silence_is_unvoiced():
    p = Pitch(sr=24000, hop_length=300)
    f0 = p.get_pitch(np.zeros(24000), use_continuous_f0=False,
                     use_log_f0=False, use_token_averaged_f0=False)
    assert (f0 == 0).all()


def test_pitch_continuous_log_token_avg():
    sr = 24000
    t = np.arange(sr) / sr
    wav = 0.4 * np.sin(2 * np.pi * 200.0 * t)
    wav[:6000] = 0  # leading silence
    p = Pitch(sr=sr, hop_length=300, f0min=80, f0max=600)
    durs = np.array([20, 30, 31])
    out = p.get_pitch(wav, duration=durs)
    assert out.shape == (3, 1)
    # voiced region tokens should be near log(200)
    assert abs(out[-1, 0] - np.log(200.0)) < 0.1


def test_griffin_lim_and_mel_inversion():
    """inverse_mel (pinv, reference audio.py:52) + fast Griffin-Lim
    reconstruct a tone whose spectrum matches the target."""
    from parakeet_tpu.audio.spectrum import (griffin_lim, inverse_mel,
                                             logmel_to_wav,
                                             mel_filterbank, stft)
    sr, n_fft, hop = 16000, 512, 128
    t = np.arange(sr) / sr
    x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    mag = np.abs(stft(x, n_fft=n_fft, hop_length=hop))
    y = griffin_lim(mag, hop, n_iter=32, length=len(x))
    magy = np.abs(stft(y, n_fft=n_fft, hop_length=hop))[:, :mag.shape[1]]
    err = np.linalg.norm(magy - mag) / np.linalg.norm(mag)
    assert err < 0.12, err

    fb = mel_filterbank(sr, n_fft, 80)
    lin = inverse_mel(fb @ mag, sr, n_fft)
    assert np.corrcoef(lin.ravel(), mag.ravel())[0, 1] > 0.9

    logmel = np.log10(np.maximum(fb @ mag, 1e-10)).T  # (T, n_mels)
    wav = logmel_to_wav(logmel, sr, n_fft, hop, n_iter=8)
    assert wav.dtype == np.float32 and len(wav) > 0
    # dominant frequency survives the round trip
    spec = np.abs(np.fft.rfft(wav * np.hanning(len(wav))))
    freq = np.argmax(spec) * sr / len(wav)
    assert abs(freq - 440) < 15, freq


def test_stft_matches_torch_stft():
    """Golden parity vs torch.stft (the reference's test pattern,
    tests/unit/test_stft.py:25-60): same framing, window, and complex
    values."""
    import torch
    from scipy import signal as _sig
    from parakeet_tpu.audio.spectrum import stft
    rng = np.random.default_rng(0)
    x = rng.uniform(-1.0, 1.0, size=4096)
    n_fft, hop, win = 1024, 256, 1024
    ours = stft(x, n_fft=n_fft, hop_length=hop, win_length=win)
    window = torch.as_tensor(_sig.get_window("hann", win, fftbins=True))
    ref = torch.stft(torch.as_tensor(x), n_fft=n_fft, hop_length=hop,
                     win_length=win, window=window, center=True,
                     pad_mode="reflect", return_complex=True).numpy()
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-7, atol=1e-7)


def test_in_graph_stft_loss_matches_host_stft():
    """The device-side STFT magnitude used by the multi-resolution loss
    matches the host (numpy/torch-parity) STFT."""
    import jax.numpy as jnp
    from parakeet_tpu.audio.spectrum import stft as np_stft
    from parakeet_tpu.ops.stft import stft_magnitude
    rng = np.random.default_rng(1)
    x = rng.uniform(-1.0, 1.0, size=(2, 4096)).astype(np.float32)
    n_fft, hop, win = 512, 128, 512
    dev = np.asarray(stft_magnitude(jnp.asarray(x), n_fft=n_fft,
                                    hop_length=hop, win_length=win))
    host = np.abs(np_stft(x[0], n_fft=n_fft, hop_length=hop,
                          win_length=win)).T
    assert dev.shape[1:] == host.shape
    np.testing.assert_allclose(dev[0], host, rtol=2e-4, atol=2e-4)
