"""Conv1dCell step==parallel parity, LightweightConvolution, GLU,
shuffle_dim, drop_head (reference modules: conv.py:23-135, lightconv.py,
glu, geometry.py:18, attention.py drop_head)."""
import jax
import jax.numpy as jnp
import numpy as np

from parakeet_tpu.nn import Conv1dBatchNorm, Conv1dCell, GLU, \
    LightweightConvolution
from parakeet_tpu.nn.attention import scaled_dot_product_attention
from parakeet_tpu.ops import shuffle_dim


def test_conv1d_cell_step_matches_parallel():
    cell = Conv1dCell(features=6, kernel_size=3, dilation=2)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 12, 4)).astype(np.float32))
    v = cell.init(jax.random.PRNGKey(0), x)
    y_par = cell.apply(v, x)

    state = cell.apply(v, 2, 4, method=Conv1dCell.initial_state)
    ys = []
    for t in range(x.shape[1]):
        state, y = cell.apply(v, state, x[:, t], method=Conv1dCell.step)
        ys.append(y)
    y_seq = jnp.stack(ys, axis=1)
    np.testing.assert_allclose(np.asarray(y_seq), np.asarray(y_par),
                               rtol=1e-5, atol=1e-5)


def test_conv1d_batchnorm_shapes():
    m = Conv1dBatchNorm(features=8, kernel_size=5)
    x = jnp.zeros((2, 10, 4))
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.shape == (2, 10, 8)
    y2, mut = m.apply(v, x, train=True, mutable=["batch_stats"])
    assert "batch_stats" in mut


def test_glu():
    x = jnp.asarray(np.random.default_rng(1).standard_normal(
        (3, 4, 8)).astype(np.float32))
    y = GLU().apply({}, x)
    np.testing.assert_allclose(
        np.asarray(y),
        np.asarray(x[..., :4] * jax.nn.sigmoid(x[..., 4:])), rtol=1e-6)


def test_lightconv_shapes_and_mask():
    m = LightweightConvolution(wshare=2, n_feat=8, kernel_size=5)
    x = jnp.asarray(np.random.default_rng(2).standard_normal(
        (2, 9, 8)).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x, x, x)
    y = m.apply(v, x, x, x)
    assert y.shape == x.shape
    causal = LightweightConvolution(wshare=2, n_feat=8, kernel_size=5,
                                    use_kernel_mask=True)
    vc = causal.init(jax.random.PRNGKey(0), x, x, x)
    # causal: output at t must not depend on inputs after t
    y1 = causal.apply(vc, x, x, x)
    x2 = x.at[:, -1].set(100.0)
    y2 = causal.apply(vc, x2, x2, x2)
    np.testing.assert_allclose(np.asarray(y1[:, :-1]),
                               np.asarray(y2[:, :-1]), rtol=1e-4,
                               atol=1e-4)


def test_shuffle_dim():
    x = jnp.arange(12).reshape(3, 4)
    y = shuffle_dim(x, 0, perm=[2, 0, 1])
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x)[[2, 0, 1]])
    z = shuffle_dim(x, 1, rng=jax.random.PRNGKey(0))
    assert sorted(np.asarray(z)[0].tolist()) == sorted(
        np.asarray(x)[0].tolist())


def test_drop_head():
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((4, 8, 6, 16)).astype(np.float32))
    out, _ = scaled_dot_product_attention(q, q, q, drop_n_heads=2,
                                          rng=jax.random.PRNGKey(1))
    # exactly 2 of 8 heads zeroed per example
    zeroed = (np.abs(np.asarray(out)).sum(axis=(2, 3)) == 0).sum(axis=1)
    assert (zeroed == 2).all()


def test_style_encoder_gst():
    """GST: reference mel -> fixed-size style vector; token attention
    mixes a learned bank (reference style_encoder.py:24-308)."""
    from parakeet_tpu.nn.style_encoder import StyleEncoder
    enc = StyleEncoder(gst_tokens=4, gst_token_dim=16, gst_heads=2,
                       conv_layers=2, conv_chans_list=(4, 8),
                       gru_units=12)
    mel = jnp.asarray(np.random.default_rng(0).standard_normal(
        (3, 37, 20)).astype(np.float32))
    v = enc.init(jax.random.PRNGKey(0), mel)
    out = enc.apply(v, mel)
    assert out.shape == (3, 16)
    assert np.isfinite(np.asarray(out)).all()
    # different references give different styles
    out2 = enc.apply(v, mel[:, ::-1, :])
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_transformer_tts_gst_integration():
    """TransformerTTS(use_gst=True): style from the reference mel is
    added to the encoder output (reference transformer_tts.py:239-241,
    519-529); zero-speech inference falls back to a zero style."""
    from parakeet_tpu.models.transformer_tts import TransformerTTS
    model = TransformerTTS(idim=11, odim=6, adim=16, aheads=2, elayers=1,
                           eunits=24, dlayers=1, dunits=24,
                           eprenet_conv_layers=0, dprenet_units=8,
                           postnet_layers=2, postnet_chans=8,
                           postnet_filts=3, use_gst=True, gst_tokens=3,
                           gst_heads=2, gst_conv_layers=2,
                           gst_conv_chans_list=(4, 8), gst_gru_units=12)
    rng = np.random.default_rng(1)
    text = jnp.asarray(rng.integers(1, 11, (2, 5)).astype(np.int32))
    tl = jnp.full((2,), 5)
    mels = jnp.asarray(rng.standard_normal((2, 8, 6)).astype(np.float32))
    ol = jnp.full((2,), 8)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           text, tl, mels, ol, deterministic=False)
    assert "gst" in variables["params"]
    out = model.apply(variables, text, tl, mels, ol, deterministic=True,
                      rngs={"dropout": jax.random.PRNGKey(2)})
    assert out["after_outs"].shape == (2, 8, 6)
    # style conditioning must change the prediction
    out_rev = model.apply(variables, text, tl, mels[:, ::-1, :], ol,
                          deterministic=True,
                          rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(out["after_outs"]),
                           np.asarray(out_rev["after_outs"]))


def test_initialize_pytree_dispatch():
    """Global init dispatch (reference nets_utils.py:128-165): rank>=2
    leaves are redrawn from the scheme, rank<2 leaves are untouched."""
    import pytest
    from parakeet_tpu.nn.initializer import initialize_pytree
    params = {"dense": {"kernel": jnp.ones((64, 32)), "bias": jnp.ones(32)},
              "conv": {"kernel": jnp.ones((3, 8, 16))},
              "norm": {"scale": jnp.ones(16)},
              "pos": {"alpha": jnp.ones(1)}}
    out = initialize_pytree(params, jax.random.PRNGKey(0), "xavier_uniform")
    k = np.asarray(out["dense"]["kernel"])
    limit = np.sqrt(6.0 / (64 + 32))
    assert k.std() > 0 and np.abs(k).max() <= limit + 1e-6
    np.testing.assert_array_equal(np.asarray(out["dense"]["bias"]), 1.0)
    np.testing.assert_array_equal(np.asarray(out["norm"]["scale"]), 1.0)
    np.testing.assert_array_equal(np.asarray(out["pos"]["alpha"]), 1.0)
    # conv fans include the receptive field: 3*8 in, 3*16 out
    c = np.asarray(out["conv"]["kernel"])
    assert np.abs(c).max() <= np.sqrt(6.0 / (24 + 48)) + 1e-6
    # kaiming differs from xavier
    out2 = initialize_pytree(params, jax.random.PRNGKey(0),
                             "kaiming_normal")
    assert not np.allclose(np.asarray(out2["dense"]["kernel"]), k)
    with pytest.raises(ValueError):
        initialize_pytree(params, jax.random.PRNGKey(0), "bogus")


def test_init_alpha_plumbing():
    """init_enc_alpha/init_dec_alpha set the initial scaled-positional-
    encoding alpha (reference fastspeech2.py:115-116, transformer_tts.py
    _reset_parameters)."""
    from parakeet_tpu.models.fastspeech2 import FastSpeech2
    model = FastSpeech2(idim=11, odim=6, adim=16, aheads=2, elayers=1,
                        eunits=24, dlayers=1, dunits=24,
                        postnet_layers=1, postnet_chans=8, postnet_filts=3,
                        duration_predictor_chans=8,
                        pitch_predictor_chans=8, energy_predictor_chans=8,
                        init_enc_alpha=2.0, init_dec_alpha=0.5)
    rng = np.random.default_rng(0)
    text = jnp.asarray(rng.integers(1, 11, (2, 5)).astype(np.int32))
    tl = jnp.full((2,), 5)
    mels = jnp.asarray(rng.standard_normal((2, 8, 6)).astype(np.float32))
    ol = jnp.full((2,), 8)
    durs = jnp.asarray([[2, 2, 2, 1, 1]] * 2, jnp.int32)
    pitch = jnp.zeros((2, 5, 1))
    energy = jnp.zeros((2, 5, 1))
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           text, tl, mels, ol, durs, pitch, energy,
                           deterministic=True)
    enc_a = np.asarray(
        variables["params"]["encoder"]["pos_enc"]["alpha"])
    dec_a = np.asarray(
        variables["params"]["decoder"]["pos_enc"]["alpha"])
    np.testing.assert_allclose(enc_a, 2.0)
    np.testing.assert_allclose(dec_a, 0.5)
