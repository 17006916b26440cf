"""Parity of the PWG shifted-matmul convs / polyphase upsampler against
the naive XLA formulations they replace (reference semantics:
parakeet/models/parallel_wavegan/parallel_wavegan.py:26-316)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy lane: run via plain `pytest tests/`

from parakeet_tpu.models.parallel_wavegan import (UpsampleNet, WNConv1d,
                                                  conv1d_taps)


@pytest.mark.parametrize("dilation", [1, 2, 4])
@pytest.mark.parametrize("padding", ["SAME", "VALID"])
def test_conv1d_taps_matches_lax_conv(dilation, padding):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 50, 6)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((3, 6, 8)).astype(np.float32))
    got = conv1d_taps(x, k, dilation, padding)
    ref = jax.lax.conv_general_dilated(
        x, k, window_strides=(1,), padding=padding,
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_wnconv1d_matches_flax_weightnorm_conv():
    import flax.linen as nn
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 40, 5)).astype(np.float32))

    ours = WNConv1d(7, kernel_size=3, dilation=2)
    ov = ours.init(jax.random.PRNGKey(0), x)

    ref_mod = nn.WeightNorm(nn.Conv(7, (3,), kernel_dilation=(2,),
                                    padding="SAME", name="conv"),
                            name="conv_wn")
    rv = ref_mod.init(jax.random.PRNGKey(1), x)
    # copy our params into the flax WeightNorm parameterization
    flat = {"params": {
        "layer_instance": {"kernel": ov["params"]["kernel"],
                           "bias": ov["params"]["bias"]},
        "layer_instance/kernel/scale": ov["params"]["scale"]}}
    np.testing.assert_allclose(
        np.asarray(ours.apply(ov, x)),
        np.asarray(ref_mod.apply(flat, x)), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("kf", [1, 3])
def test_upsamplenet_polyphase_matches_stretch_fir(kf):
    """Polyphase frame-rate form == nearest-stretch + SAME 2D conv."""
    rng = np.random.default_rng(2)
    scales = (2, 3)
    mel = jnp.asarray(rng.standard_normal((2, 7, 5)).astype(np.float32))

    net = UpsampleNet(scales, freq_axis_kernel_size=kf)
    v = net.init(jax.random.PRNGKey(0), mel)
    got = net.apply(v, mel)

    x = np.asarray(mel)[..., None]  # (B, T, F, 1)
    for i, s in enumerate(scales):
        kt = 2 * s + 1
        kernel = np.asarray(v["params"][f"conv_{i}_kernel"])  # (kt,kf,1,1)
        g = float(np.asarray(v["params"][f"conv_{i}_scale"])[0])
        w = kernel * (g / np.sqrt((kernel ** 2).sum() + 1e-12))
        x = np.repeat(x, s, axis=1)
        x = np.asarray(jax.lax.conv_general_dilated(
            jnp.asarray(x), jnp.asarray(w), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")))
    np.testing.assert_allclose(np.asarray(got), x[..., 0],
                               rtol=1e-4, atol=1e-4)


def test_pwg_streaming_matches_full():
    """Chunked inference == full-utterance inference, including the
    edge chunks (replicate mel pad + SAME-conv zero boundary)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from parakeet_tpu.models.parallel_wavegan import (
        PWGGenerator, pwg_inference, pwg_streaming_inference)

    gen = PWGGenerator(layers=6, stacks=2, residual_channels=8,
                       gate_channels=16, skip_channels=8, aux_channels=10,
                       aux_context_window=2, upsample_scales=(2, 2))
    t_mel = 50
    hop = 4
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((1, t_mel, 10)).astype(np.float32))
    noise = jnp.asarray(rng.standard_normal(
        (1, t_mel * hop, 1)).astype(np.float32))
    variables = gen.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 16, 1)), jnp.zeros((1, 8, 10)))

    full = pwg_inference(gen, variables, mel, noise=noise)
    for chunk in (16, 23):   # aligned and ragged chunking
        stream = pwg_streaming_inference(gen, variables, mel, noise=noise,
                                         chunk_frames=chunk)
        assert stream.shape == full.shape
        np.testing.assert_allclose(np.asarray(stream), np.asarray(full),
                                   rtol=1e-5, atol=1e-5)
    # 2-D (unbatched) surface
    full1 = pwg_inference(gen, variables, mel[0], noise=noise)
    s1 = pwg_streaming_inference(gen, variables, mel[0], noise=noise,
                                 chunk_frames=16)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(full1),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("dilation", [1, 2, 4])
def test_conv1d_taps_causal_matches_padded_valid(dilation):
    """CAUSAL == left-pad (k-1)*d then VALID (reference ResidualBlock
    causal branch, parallel_wavegan.py:255-305)."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 50, 6)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((3, 6, 8)).astype(np.float32))
    got = conv1d_taps(x, k, dilation, "CAUSAL")
    pad = (k.shape[0] - 1) * dilation
    ref = conv1d_taps(jnp.pad(x, ((0, 0), (pad, 0), (0, 0))), k,
                      dilation, "VALID")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_upsamplenet_causal_matches_stretch_causal_fir():
    """Causal polyphase == nearest-stretch + left-padded conv trimmed to
    input length (reference Stretch2D+Conv2D causal,
    parallel_wavegan.py:107-137)."""
    rng = np.random.default_rng(4)
    scales = (2, 3)
    mel = jnp.asarray(rng.standard_normal((2, 7, 5)).astype(np.float32))
    net = UpsampleNet(scales, use_causal_conv=True)
    v = net.init(jax.random.PRNGKey(0), mel)
    got = net.apply(v, mel)

    x = np.asarray(mel)[..., None]
    for i, s in enumerate(scales):
        kt = 2 * s + 1
        kernel = np.asarray(v["params"][f"conv_{i}_kernel"])
        g = float(np.asarray(v["params"][f"conv_{i}_scale"])[0])
        w = kernel * (g / np.sqrt((kernel ** 2).sum() + 1e-12))
        x = np.repeat(x, s, axis=1)
        t = x.shape[1]
        xp = np.pad(x, ((0, 0), (kt - 1, 0), (0, 0), (0, 0)))
        x = np.asarray(jax.lax.conv_general_dilated(
            jnp.asarray(xp), jnp.asarray(w), (1, 1),
            [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")))[:, :t]
    np.testing.assert_allclose(np.asarray(got), x[..., 0],
                               rtol=1e-4, atol=1e-4)


def test_causal_generator_is_causal():
    """use_causal_conv=True: future mel frames cannot affect past output
    samples."""
    from parakeet_tpu.models.parallel_wavegan import PWGGenerator
    rng = np.random.default_rng(5)
    gen = PWGGenerator(layers=4, stacks=2, residual_channels=4,
                       gate_channels=8, skip_channels=4, aux_channels=6,
                       aux_context_window=2, upsample_scales=(4, 5),
                       use_causal_conv=True)
    n_mel, hop = 14, 20
    noise = jnp.asarray(rng.standard_normal((1, (n_mel - 4) * hop, 1))
                        .astype(np.float32))
    mel = rng.standard_normal((1, n_mel, 6)).astype(np.float32)
    v = gen.init(jax.random.PRNGKey(0), noise, jnp.asarray(mel))
    y0 = np.asarray(gen.apply(v, noise, jnp.asarray(mel)))
    mel2 = mel.copy()
    mel2[:, 8:] += 10.0  # frames >= 8 (output samples >= (8-2)*hop)
    y1 = np.asarray(gen.apply(v, noise, jnp.asarray(mel2)))
    # generous margin before the perturbed frame: receptive field of the
    # causal stack only looks backward, so early samples are identical
    np.testing.assert_allclose(y0[:, :4 * hop], y1[:, :4 * hop],
                               rtol=1e-6, atol=1e-6)
    assert not np.allclose(y0, y1)
