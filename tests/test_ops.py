"""Device-op tests: STFT parity with host DSP, losses, masks, regulator."""
import jax
import jax.numpy as jnp
import numpy as np

from parakeet_tpu import ops
from parakeet_tpu.audio import spectrum as host_sp


def test_device_stft_matches_host():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 4096)).astype(np.float32)
    mag_dev = ops.stft_magnitude(jnp.asarray(x), n_fft=1024, hop_length=256,
                                 win_length=600)
    for b in range(2):
        ref = np.abs(host_sp.stft(x[b], n_fft=1024, hop_length=256,
                                  win_length=600)).T
        np.testing.assert_allclose(
            np.asarray(mag_dev[b]), np.sqrt(np.clip(ref ** 2, 1e-7, None)),
            atol=2e-3, rtol=1e-3)


def test_device_log_mel_matches_host_fbank():
    from parakeet_tpu.audio.features import LogMelFBank
    rng = np.random.default_rng(1)
    wav = (rng.standard_normal(12000) * 0.2).astype(np.float32)
    host = LogMelFBank(sr=24000, n_fft=2048, hop_length=300, fmin=80,
                       fmax=7600).get_log_mel_fbank(wav)
    dev = ops.log_mel_spectrogram(
        jnp.asarray(wav)[None], sr=24000, n_fft=2048, hop_length=300,
        n_mels=80, fmin=80, fmax=7600)[0]
    assert dev.shape == host.shape
    np.testing.assert_allclose(np.asarray(dev), host, atol=5e-3)


def test_multi_resolution_stft_loss_zero_for_identical():
    x = jnp.asarray(np.random.default_rng(2).standard_normal(
        (2, 8000)).astype(np.float32))
    sc, mag = ops.multi_resolution_stft_loss(x, x)
    assert float(sc) < 1e-6
    assert float(mag) < 1e-6


def test_multi_resolution_stft_loss_positive_and_differentiable():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 4000)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((1, 4000)).astype(np.float32))

    def loss_fn(x):
        sc, mag = ops.multi_resolution_stft_loss(x, y)
        return sc + mag

    val, grad = jax.value_and_grad(loss_fn)(x)
    assert float(val) > 0
    assert np.isfinite(np.asarray(grad)).all()


def test_masks():
    lens = jnp.array([5, 3, 2])
    m = ops.make_non_pad_mask(lens, 5)
    expected = np.array([[1, 1, 1, 1, 1],
                         [1, 1, 1, 0, 0],
                         [1, 1, 0, 0, 0]], dtype=bool)
    np.testing.assert_array_equal(np.asarray(m), expected)
    np.testing.assert_array_equal(np.asarray(ops.make_pad_mask(lens, 5)),
                                  ~expected)
    fm = ops.future_mask(3)
    np.testing.assert_array_equal(
        np.asarray(fm),
        np.array([[1, 0, 0], [1, 1, 0], [1, 1, 1]], dtype=bool))


def test_masked_fill_and_weighted_mean():
    x = jnp.ones((2, 3))
    mask = jnp.array([[True, False, False], [False, False, True]])
    y = ops.masked_fill(x, mask, -1.0)
    assert float(y.sum()) == 4.0 - 2.0
    w = jnp.array([[1, 1, 0], [1, 0, 0]], dtype=jnp.float32)
    vals = jnp.array([[1.0, 2.0, 99.0], [3.0, 99.0, 99.0]])
    assert abs(float(ops.weighted_mean(vals, w)) - 2.0) < 1e-6


def test_length_regulate_matches_repeat():
    enc = jnp.asarray(np.arange(12, dtype=np.float32).reshape(1, 4, 3))
    durs = jnp.asarray(np.array([[2, 0, 3, 1]], dtype=np.int32))
    frames, total = ops.length_regulate(enc, durs, max_len=8)
    assert int(total[0]) == 6
    ref = np.repeat(np.asarray(enc[0]), np.asarray(durs[0]), axis=0)
    np.testing.assert_allclose(np.asarray(frames[0, :6]), ref)
    np.testing.assert_allclose(np.asarray(frames[0, 6:]), 0.0)


def test_length_regulate_alpha():
    enc = jnp.ones((1, 3, 2))
    durs = jnp.asarray(np.array([[2, 2, 2]], dtype=np.int32))
    _, total = ops.length_regulate(enc, durs, max_len=16, alpha=2.0)
    assert int(total[0]) == 12


def test_guided_attention_loss_prefers_diagonal():
    n = 8
    diag = jnp.eye(n)[None]
    anti = jnp.asarray(np.eye(n)[::-1].copy())[None]
    lens = jnp.array([n])
    l_diag = ops.guided_attention_loss(diag, lens, lens, 0.2)
    l_anti = ops.guided_attention_loss(anti, lens, lens, 0.2)
    assert float(l_diag) < float(l_anti)


def test_sinusoid_position_encoding():
    pe = ops.sinusoid_position_encoding(10, 8)
    assert pe.shape == (10, 8)
    np.testing.assert_allclose(np.asarray(pe[0, 0::2]), 0.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(pe[0, 1::2]), 1.0, atol=1e-7)
    # pos 1, channel 0: sin(1)
    assert abs(float(pe[1, 0]) - np.sin(1.0)) < 1e-6


def test_zscore_roundtrip():
    z = ops.ZScore(mu=jnp.array([1.0, 2.0]), sigma=jnp.array([2.0, 4.0]))
    x = jnp.asarray(np.random.default_rng(5).standard_normal((3, 2)))
    np.testing.assert_allclose(np.asarray(z.inverse(z(x))), np.asarray(x),
                               atol=1e-6)


def test_ssim_identity_and_bounds():
    rng = np.random.default_rng(6)
    img = jnp.asarray(rng.random((2, 1, 32, 32)).astype(np.float32))
    assert abs(float(ops.ssim(img, img)) - 1.0) < 1e-5
    other = jnp.asarray(rng.random((2, 1, 32, 32)).astype(np.float32))
    val = float(ops.ssim(img, other))
    assert -1.0 <= val < 1.0


def test_stop_token_bce():
    logits = jnp.array([10.0, -10.0])
    labels = jnp.array([1.0, 0.0])
    assert float(ops.stop_token_bce(logits, labels)) < 1e-3
    bad = float(ops.stop_token_bce(-logits, labels))
    assert bad > 1.0
