"""Paddle->parakeet_tpu PWG checkpoint conversion: fabricate a state
dict with the reference's key names and tensor layouts
(parallel_wavegan.py:401-496), convert, and check it is a drop-in for
``PWGGenerator.init`` params (identical tree + shapes, generator runs)."""
import pytest

pytestmark = pytest.mark.slow  # heavy lane: run via plain `pytest tests/`

import jax
import jax.numpy as jnp
import numpy as np
from pathlib import Path

from parakeet_tpu.models import PWGGenerator
from parakeet_tpu.utils.convert import convert_pwg_generator

LAYERS, CR, CG, CS, CA = 4, 8, 16, 8, 12
SCALES = (2, 3)


def fake_paddle_state(rng):
    state = {}

    def wn_conv1d(prefix, out, cin, k, bias=True):
        state[f"{prefix}.weight_v"] = rng.standard_normal(
            (out, cin, k)).astype(np.float32)
        state[f"{prefix}.weight_g"] = rng.standard_normal(
            (out, 1, 1)).astype(np.float32)
        if bias:
            state[f"{prefix}.bias"] = rng.standard_normal(
                (out,)).astype(np.float32)

    wn_conv1d("first_conv", CR, 1, 1)
    wn_conv1d("upsample_net.conv_in", CA, CA, 5, bias=False)
    for i, s in enumerate(SCALES):
        idx = i * 2 + 1
        state[f"upsample_net.upsample.up_layers.{idx}.weight_v"] = \
            rng.standard_normal((1, 1, 1, 2 * s + 1)).astype(np.float32)
        state[f"upsample_net.upsample.up_layers.{idx}.weight_g"] = \
            rng.standard_normal((1,)).astype(np.float32)
    for i in range(LAYERS):
        wn_conv1d(f"conv_layers.{i}.conv", CG, CR, 3)
        wn_conv1d(f"conv_layers.{i}.conv1x1_aux", CG, CA, 1, bias=False)
        wn_conv1d(f"conv_layers.{i}.conv1x1_skip", CS, CG // 2, 1)
        wn_conv1d(f"conv_layers.{i}.conv1x1_out", CR, CG // 2, 1)
    wn_conv1d("last_conv_layers.1", CS, CS, 1)
    wn_conv1d("last_conv_layers.3", 1, CS, 1)
    return state


def test_convert_pwg_generator_drop_in():
    rng = np.random.default_rng(0)
    state = fake_paddle_state(rng)
    params = convert_pwg_generator(state, layers=LAYERS,
                                   upsample_scales=SCALES)

    gen = PWGGenerator(layers=LAYERS, stacks=2, residual_channels=CR,
                       gate_channels=CG, skip_channels=CS,
                       aux_channels=CA, aux_context_window=2,
                       upsample_scales=SCALES)
    noise = jnp.zeros((1, 5 * 6, 1))
    mel = jnp.zeros((1, 9, CA))
    ref = gen.init(jax.random.PRNGKey(0), noise, mel)["params"]

    ref_shapes = jax.tree_util.tree_map(lambda a: a.shape, ref)
    got_shapes = jax.tree_util.tree_map(lambda a: a.shape, params)
    assert ref_shapes == got_shapes, (
        f"tree mismatch:\nref: {ref_shapes}\ngot: {got_shapes}")

    wav = gen.apply({"params": jax.tree_util.tree_map(jnp.asarray,
                                                      params)}, noise, mel)
    assert wav.shape == (1, 30, 1)
    assert bool(jnp.isfinite(wav).all())

    # weight-norm fold equivalence on one conv: paddle computes
    # g * v / ||v|| with the norm over (in, k) per out channel
    v = state["conv_layers.0.conv.weight_v"]
    g = state["conv_layers.0.conv.weight_g"].reshape(-1)
    norm = np.sqrt((v ** 2).sum(axis=(1, 2), keepdims=True) + 1e-12)
    expected = (v * (g[:, None, None] / norm)).transpose(2, 1, 0)
    from parakeet_tpu.models.parallel_wavegan import _wn
    got = np.asarray(_wn(jnp.asarray(params["stack"]["conv_kernel"][0]),
                         jnp.asarray(params["stack"]["conv_scale"][0])))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def test_convert_waveflow_drop_in():
    from parakeet_tpu.models.waveflow import ConditionalWaveFlow
    from parakeet_tpu.utils.convert import convert_waveflow

    rng = np.random.default_rng(2)
    n_flows, n_layers, n_group, channels, n_mels = 2, 2, 4, 6, 5
    factors = (2, 2)

    state = {}

    def wn_conv2d(prefix, out, cin, kh, kw):
        state[f"{prefix}.weight_v"] = rng.standard_normal(
            (out, cin, kh, kw)).astype(np.float32)
        state[f"{prefix}.weight_g"] = rng.standard_normal(
            (out, 1, 1, 1)).astype(np.float32)
        state[f"{prefix}.bias"] = rng.standard_normal(
            (out,)).astype(np.float32)

    for i, f in enumerate(factors):
        state[f"encoder.{i}.weight_v"] = rng.standard_normal(
            (1, 1, 3, 2 * f)).astype(np.float32)
        state[f"encoder.{i}.weight_g"] = rng.standard_normal(
            (1,)).astype(np.float32)
        state[f"encoder.{i}.bias"] = rng.standard_normal(
            (1,)).astype(np.float32)
    for fl in range(n_flows):
        wn_conv2d(f"decoder.{fl}.input_proj", channels, 1, 1, 1)
        for la in range(n_layers):
            lp = f"decoder.{fl}.resnet.{la}"
            wn_conv2d(f"{lp}.conv", 2 * channels, channels, 3, 3)
            wn_conv2d(f"{lp}.condition_proj", 2 * channels, n_mels, 1, 1)
            wn_conv2d(f"{lp}.out_proj", 2 * channels, channels, 1, 1)
        state[f"decoder.{fl}.output_proj.weight"] = np.zeros(
            (2, channels, 1, 1), np.float32)
        state[f"decoder.{fl}.output_proj.bias"] = np.zeros(
            (2,), np.float32)

    params = convert_waveflow(state, n_flows=n_flows, n_layers=n_layers,
                              upsample_factors=factors)

    model = ConditionalWaveFlow(upsample_factors=factors, n_flows=n_flows,
                                n_layers=n_layers, n_group=n_group,
                                channels=channels, n_mels=n_mels)
    audio = jnp.zeros((1, 64))
    mel = jnp.zeros((1, 16, n_mels))
    ref = model.init(jax.random.PRNGKey(0), audio, mel)["params"]

    ref_shapes = jax.tree_util.tree_map(lambda a: a.shape, ref)
    got_shapes = jax.tree_util.tree_map(lambda a: a.shape, params)
    assert ref_shapes == got_shapes, (
        f"tree mismatch:\nref: {ref_shapes}\ngot: {got_shapes}")

    variables = {"params": jax.tree_util.tree_map(jnp.asarray, params)}
    z, logs_sum = model.apply(variables, audio, mel)
    assert z.shape == (1, 64) and bool(jnp.isfinite(z).all())

    # weight-norm fold equivalence on one conv (norm over all axes but 0)
    v = state["decoder.0.resnet.0.conv.weight_v"]
    g = state["decoder.0.resnet.0.conv.weight_g"].reshape(-1)
    norm = np.sqrt((v ** 2).sum(axis=(1, 2, 3), keepdims=True) + 1e-12)
    expected = (v * (g[:, None, None, None] / norm)).transpose(2, 3, 1, 0)
    np.testing.assert_allclose(
        params["decoder"]["flows_0"]["resnet_0"]["conv"]["kernel"],
        expected, rtol=1e-5, atol=1e-6)

    # ConvTranspose kernels are spatially flipped (paddle convolves the
    # dilated input with the flipped kernel; our upsampler does not)
    w0 = state["encoder.0.weight_v"][0, 0]
    g0 = state["encoder.0.weight_g"].reshape(-1)[0]
    folded = w0 * (g0 / np.sqrt((w0 ** 2).sum() + 1e-12))
    np.testing.assert_allclose(
        params["encoder"]["deconv_0_kernel"][..., 0, 0],
        folded[::-1, ::-1], rtol=1e-5, atol=1e-6)

    # odd upsample factors have a different implied padding: reject
    import pytest
    with pytest.raises(ValueError):
        convert_waveflow(state, n_flows=n_flows, n_layers=n_layers,
                         upsample_factors=(2, 3))


def test_convert_ge2e_drop_in():
    """LSTM gate mapping: a converted paddle dict must reproduce the
    paddle LSTM recurrence (i,f,c,o chunks, double bias) exactly."""
    from parakeet_tpu.models.lstm_speaker_encoder import LSTMSpeakerEncoder
    from parakeet_tpu.utils.convert import convert_ge2e

    rng = np.random.default_rng(3)
    n_mels, layers, hidden, out_dim = 5, 2, 6, 4

    state = {}
    for la in range(layers):
        cin = n_mels if la == 0 else hidden
        state[f"lstm.weight_ih_l{la}"] = rng.standard_normal(
            (4 * hidden, cin)).astype(np.float32)
        state[f"lstm.weight_hh_l{la}"] = rng.standard_normal(
            (4 * hidden, hidden)).astype(np.float32)
        state[f"lstm.bias_ih_l{la}"] = rng.standard_normal(
            (4 * hidden,)).astype(np.float32)
        state[f"lstm.bias_hh_l{la}"] = rng.standard_normal(
            (4 * hidden,)).astype(np.float32)
    state["linear.weight"] = rng.standard_normal(
        (hidden, out_dim)).astype(np.float32)
    state["linear.bias"] = rng.standard_normal((out_dim,)).astype(
        np.float32)
    state["similarity_weight"] = np.full((1,), 10.0, np.float32)
    state["similarity_bias"] = np.full((1,), -5.0, np.float32)

    params = convert_ge2e(state, num_layers=layers)

    model = LSTMSpeakerEncoder(n_mels=n_mels, num_layers=layers,
                               hidden_size=hidden, output_size=out_dim)
    x = jnp.asarray(rng.standard_normal((2, 7, n_mels)).astype(np.float32))
    ref = model.init(jax.random.PRNGKey(0), x)["params"]
    ref_shapes = jax.tree_util.tree_map(lambda a: a.shape, ref)
    got_shapes = jax.tree_util.tree_map(lambda a: a.shape, params)
    assert ref_shapes == got_shapes, (
        f"tree mismatch:\nref: {ref_shapes}\ngot: {got_shapes}")

    emb = model.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)}, x)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(emb), axis=-1),
                               1.0, rtol=1e-5)

    # numpy golden of the paddle recurrence (rnn.py LSTMCell: chunks
    # i,f,c,o; c' = f*c + i*tanh(g); h = o*tanh(c'))
    def paddle_lstm(x1):
        h_seq = x1
        for la in range(layers):
            w_ih = state[f"lstm.weight_ih_l{la}"]
            w_hh = state[f"lstm.weight_hh_l{la}"]
            b = state[f"lstm.bias_ih_l{la}"] + state[f"lstm.bias_hh_l{la}"]
            h = np.zeros(hidden, np.float32)
            c = np.zeros(hidden, np.float32)
            outs = []
            for t in range(h_seq.shape[0]):
                gates = w_ih @ h_seq[t] + w_hh @ h + b
                i, f, g, o = np.split(gates, 4)
                sig = lambda a: 1.0 / (1.0 + np.exp(-a))  # noqa: E731
                c = sig(f) * c + sig(i) * np.tanh(g)
                h = sig(o) * np.tanh(c)
                outs.append(h)
            h_seq = np.stack(outs)
        return h  # final hidden state of the last layer

    last = paddle_lstm(np.asarray(x[0]))
    e = np.maximum(last @ state["linear.weight"] + state["linear.bias"], 0)
    expected = e / np.linalg.norm(e)
    np.testing.assert_allclose(np.asarray(emb[0]), expected,
                               rtol=1e-4, atol=1e-5)


def test_convert_speedyspeech_drop_in():
    from parakeet_tpu.models.speedyspeech import SpeedySpeech
    from parakeet_tpu.utils.convert import convert_speedyspeech

    rng = np.random.default_rng(4)
    vocab, tones, hidden, odim = 12, 5, 8, 6
    enc_dil, dec_dil = (1, 3), (1, 3, 1)

    state = {}

    def dense(prefix, i, o):
        state[f"{prefix}.weight"] = rng.standard_normal(
            (i, o)).astype(np.float32)
        state[f"{prefix}.bias"] = rng.standard_normal((o,)).astype(
            np.float32)

    def res_block(prefix, k, n):
        for j in range(n):
            state[f"{prefix}.blocks.{j}.0.weight"] = rng.standard_normal(
                (hidden, hidden, k)).astype(np.float32)
            state[f"{prefix}.blocks.{j}.0.bias"] = rng.standard_normal(
                (hidden,)).astype(np.float32)
            bn = f"{prefix}.blocks.{j}.2"
            state[f"{bn}.weight"] = rng.standard_normal((hidden,)).astype(
                np.float32)
            state[f"{bn}.bias"] = rng.standard_normal((hidden,)).astype(
                np.float32)
            state[f"{bn}._mean"] = np.zeros((hidden,), np.float32)
            state[f"{bn}._variance"] = np.ones((hidden,), np.float32)

    state["encoder.embedding.text_embedding.weight"] = rng.standard_normal(
        (vocab, hidden)).astype(np.float32)
    state["encoder.embedding.tone_embedding.weight"] = rng.standard_normal(
        (tones, hidden)).astype(np.float32)
    dense("encoder.prenet.0", hidden, hidden)
    for i in range(len(enc_dil)):
        res_block(f"encoder.res_blocks.{i}", 3, 2)
    dense("encoder.postnet1.0", hidden, hidden)
    bn = "encoder.postnet2.1"
    state[f"{bn}.weight"] = rng.standard_normal((hidden,)).astype(np.float32)
    state[f"{bn}.bias"] = rng.standard_normal((hidden,)).astype(np.float32)
    state[f"{bn}._mean"] = np.zeros((hidden,), np.float32)
    state[f"{bn}._variance"] = np.ones((hidden,), np.float32)
    dense("encoder.postnet2.2", hidden, hidden)
    for i, k in enumerate((4, 3, 1)):
        res_block(f"duration_predictor.layers.{i}", k, 1)
    dense("duration_predictor.layers.3", hidden, 1)
    for i in range(len(dec_dil)):
        res_block(f"decoder.res_blocks.{i}", 3, 2)
    dense("decoder.postnet1.0", hidden, hidden)
    res_block("decoder.postnet2.0", 3, 2)
    dense("decoder.postnet2.1", hidden, odim)

    params, batch_stats = convert_speedyspeech(
        state, encoder_dilations=enc_dil, decoder_dilations=dec_dil)

    model = SpeedySpeech(
        vocab_size=vocab, encoder_hidden_size=hidden,
        encoder_dilations=enc_dil, duration_predictor_hidden_size=hidden,
        decoder_hidden_size=hidden, decoder_output_size=odim,
        decoder_dilations=dec_dil, tone_size=tones)
    text = jnp.ones((1, 7), jnp.int32)
    tone_ids = jnp.ones((1, 7), jnp.int32)
    durs = jnp.full((1, 7), 2, jnp.int32)
    ref = model.init(jax.random.PRNGKey(0), text, durs, tone_ids,
                     max_frames=16)
    for col, got in (("params", params), ("batch_stats", batch_stats)):
        ref_shapes = jax.tree_util.tree_map(lambda a: a.shape, ref[col])
        got_shapes = jax.tree_util.tree_map(lambda a: a.shape, got)
        assert ref_shapes == got_shapes, (
            f"{col} tree mismatch:\nref: {ref_shapes}\ngot: {got_shapes}")

    variables = {
        "params": jax.tree_util.tree_map(jnp.asarray, params),
        "batch_stats": jax.tree_util.tree_map(jnp.asarray, batch_stats)}
    out = model.apply(variables, text, tone_ids, max_frames=16,
                      method=SpeedySpeech.inference)
    assert out["mel"].shape == (1, 16, odim)
    assert bool(jnp.isfinite(out["mel"]).all())


def test_convert_tacotron2_drop_in():
    from parakeet_tpu.models.tacotron2 import Tacotron2
    from parakeet_tpu.utils.convert import convert_tacotron2

    rng = np.random.default_rng(5)
    vocab, d_mels, d_enc, d_att_rnn, d_dec_rnn, d_att = 10, 6, 8, 8, 8, 8
    d_prenet, filters, k_att = 8, 4, 5

    state = {}

    def dense(prefix, i, o, bias=True):
        state[f"{prefix}.weight"] = rng.standard_normal(
            (i, o)).astype(np.float32)
        if bias:
            state[f"{prefix}.bias"] = rng.standard_normal((o,)).astype(
                np.float32)

    def conv_bn(prefix, o, i, k):
        state[f"{prefix}.conv.weight"] = rng.standard_normal(
            (o, i, k)).astype(np.float32)
        state[f"{prefix}.conv.bias"] = rng.standard_normal((o,)).astype(
            np.float32)
        state[f"{prefix}.bn.weight"] = rng.standard_normal((o,)).astype(
            np.float32)
        state[f"{prefix}.bn.bias"] = rng.standard_normal((o,)).astype(
            np.float32)
        state[f"{prefix}.bn._mean"] = rng.standard_normal((o,)).astype(
            np.float32)
        state[f"{prefix}.bn._variance"] = np.ones((o,), np.float32)

    def lstm(prefix, cin, h, suffix=""):
        state[f"{prefix}.weight_ih{suffix}"] = rng.standard_normal(
            (4 * h, cin)).astype(np.float32)
        state[f"{prefix}.weight_hh{suffix}"] = rng.standard_normal(
            (4 * h, h)).astype(np.float32)
        state[f"{prefix}.bias_ih{suffix}"] = rng.standard_normal(
            (4 * h,)).astype(np.float32)
        state[f"{prefix}.bias_hh{suffix}"] = rng.standard_normal(
            (4 * h,)).astype(np.float32)

    state["embedding.weight"] = rng.standard_normal(
        (vocab, d_enc)).astype(np.float32)
    for i in range(2):
        conv_bn(f"encoder.conv_batchnorms.{i}", d_enc, d_enc, 3)
    lstm("encoder.lstm", d_enc, d_enc // 2, "_l0")
    lstm("encoder.lstm", d_enc, d_enc // 2, "_l0_reverse")
    dense("decoder.prenet.linear1", d_mels, d_prenet, bias=False)
    dense("decoder.prenet.linear2", d_prenet, d_prenet, bias=False)
    lstm("decoder.attention_rnn", d_prenet + d_enc, d_att_rnn)
    lstm("decoder.decoder_rnn", d_att_rnn + d_enc, d_dec_rnn)
    dense("decoder.attention_layer.query_layer", d_att_rnn, d_att,
          bias=False)
    dense("decoder.attention_layer.key_layer", d_enc, d_att, bias=False)
    dense("decoder.attention_layer.value", d_att, 1, bias=False)
    dense("decoder.attention_layer.location_layer", filters, d_att,
          bias=False)
    state["decoder.attention_layer.location_conv.weight"] = \
        rng.standard_normal((filters, 2, k_att)).astype(np.float32)
    dense("decoder.linear_projection", d_dec_rnn + d_enc, d_mels)
    dense("decoder.stop_layer", d_dec_rnn + d_enc, 1)
    for i, (ic, oc) in enumerate(((d_mels, 8), (8, d_mels))):
        conv_bn(f"postnet.conv_batchnorms.{i}", oc, ic, 3)

    params, batch_stats = convert_tacotron2(
        state, encoder_conv_layers=2, postnet_conv_layers=2,
        use_stop_token=True)

    model = Tacotron2(vocab_size=vocab, d_mels=d_mels, d_encoder=d_enc,
                      encoder_conv_layers=2, encoder_kernel_size=3,
                      d_prenet=d_prenet, d_attention_rnn=d_att_rnn,
                      d_decoder_rnn=d_dec_rnn, attention_filters=filters,
                      attention_kernel_size=k_att, d_attention=d_att,
                      d_postnet=8, postnet_kernel_size=3,
                      postnet_conv_layers=2, reduction_factor=1,
                      use_stop_token=True)
    text = jnp.ones((1, 5), jnp.int32)
    tl = jnp.full((1,), 5)
    mels = jnp.zeros((1, 8, d_mels))
    ol = jnp.full((1,), 8)
    ref = model.init({"params": jax.random.PRNGKey(0),
                      "dropout": jax.random.PRNGKey(1)},
                     text, tl, mels, ol, deterministic=False)
    for col, got in (("params", params), ("batch_stats", batch_stats)):
        ref_shapes = jax.tree_util.tree_map(lambda a: a.shape, ref[col])
        got_shapes = jax.tree_util.tree_map(lambda a: a.shape, got)
        assert ref_shapes == got_shapes, (
            f"{col} tree mismatch:\nref: {ref_shapes}\ngot: {got_shapes}")

    variables = {
        "params": jax.tree_util.tree_map(jnp.asarray, params),
        "batch_stats": jax.tree_util.tree_map(jnp.asarray, batch_stats)}
    out = model.apply(variables, text, tl, mels, ol, deterministic=True,
                      rngs={"dropout": jax.random.PRNGKey(2)})
    assert bool(jnp.isfinite(out["mel_outputs_postnet"]).all())

    # conv-bias -> BN-mean fold: BN((conv(x)+b)) == BN'(conv(x)) with
    # mean' = mean - b
    b = state["encoder.conv_batchnorms.0.conv.bias"]
    mean = state["encoder.conv_batchnorms.0.bn._mean"]
    np.testing.assert_allclose(
        batch_stats["encoder"]["bn_0"]["mean"], mean - b, rtol=1e-6)


def test_convert_transformer_tts_drop_in():
    from parakeet_tpu.models.transformer_tts import TransformerTTS
    from parakeet_tpu.utils.convert import convert_transformer_tts

    rng = np.random.default_rng(6)
    idim, odim, adim, heads, units, dp_units = 12, 6, 16, 2, 32, 8

    state = {}

    def dense(prefix, i, o):
        state[f"{prefix}.weight"] = rng.standard_normal(
            (i, o)).astype(np.float32)
        state[f"{prefix}.bias"] = rng.standard_normal((o,)).astype(
            np.float32)

    def conv(prefix, o, i, k, bias=True):
        state[f"{prefix}.weight"] = rng.standard_normal(
            (o, i, k)).astype(np.float32)
        if bias:
            state[f"{prefix}.bias"] = rng.standard_normal((o,)).astype(
                np.float32)

    def ln(prefix, d):
        state[f"{prefix}.weight"] = rng.standard_normal((d,)).astype(
            np.float32)
        state[f"{prefix}.bias"] = rng.standard_normal((d,)).astype(
            np.float32)

    def mha(prefix):
        for nm in ("q", "k", "v", "out"):
            dense(f"{prefix}.linear_{nm}", adim, adim)

    # encoder: Embedding input + scaled pos enc + 1 layer (conv1d FF)
    state["encoder.embed.0.weight"] = rng.standard_normal(
        (idim, adim)).astype(np.float32)
    state["encoder.embed.1.alpha"] = np.ones((1,), np.float32)
    mha("encoder.encoders.0.self_attn")
    ln("encoder.encoders.0.norm1", adim)
    ln("encoder.encoders.0.norm2", adim)
    conv("encoder.encoders.0.feed_forward.w_1", units, adim, 1)
    conv("encoder.encoders.0.feed_forward.w_2", adim, units, 1)
    ln("encoder.after_norm", adim)

    # decoder: prenet + proj input, 1 layer (linear FF), after_norm
    state["decoder.embed.1.alpha"] = np.ones((1,), np.float32)
    dense("decoder.embed.0.0.prenet.0.0", odim, dp_units)
    dense("decoder.embed.0.0.prenet.1.0", dp_units, dp_units)
    dense("decoder.embed.0.1", dp_units, adim)
    mha("decoder.decoders.0.self_attn")
    mha("decoder.decoders.0.src_attn")
    for n in ("norm1", "norm2", "norm3"):
        ln(f"decoder.decoders.0.{n}", adim)
    dense("decoder.decoders.0.feed_forward.w_1", adim, units)
    dense("decoder.decoders.0.feed_forward.w_2", units, adim)
    ln("decoder.after_norm", adim)

    dense("feat_out", adim, odim)
    dense("prob_out", adim, 1)
    for i, (ic, oc) in enumerate(((odim, 8), (8, odim))):
        conv(f"postnet.postnet.{i}.0", oc, ic, 3, bias=False)
        ln(f"postnet.postnet.{i}.1", oc)
        state[f"postnet.postnet.{i}.1._mean"] = np.zeros((oc,), np.float32)
        state[f"postnet.postnet.{i}.1._variance"] = np.ones((oc,),
                                                            np.float32)

    params, batch_stats = convert_transformer_tts(
        state, elayers=1, dlayers=1, aheads=heads, dprenet_layers=2,
        postnet_layers=2)

    model = TransformerTTS(idim=idim, odim=odim, adim=adim, aheads=heads,
                           elayers=1, eunits=units, dlayers=1, dunits=units,
                           eprenet_conv_layers=0, dprenet_units=dp_units,
                           postnet_layers=2, postnet_chans=8,
                           postnet_filts=3, reduction_factor=1)
    text = jnp.ones((1, 5), jnp.int32)
    tl = jnp.full((1,), 5)
    mels = jnp.zeros((1, 8, odim))
    ol = jnp.full((1,), 8)
    ref = model.init({"params": jax.random.PRNGKey(0),
                      "dropout": jax.random.PRNGKey(1)},
                     text, tl, mels, ol, deterministic=False)
    for col, got in (("params", params), ("batch_stats", batch_stats)):
        ref_shapes = jax.tree_util.tree_map(lambda a: a.shape, ref[col])
        got_shapes = jax.tree_util.tree_map(lambda a: a.shape, got)
        assert ref_shapes == got_shapes, (
            f"{col} tree mismatch:\nref: {ref_shapes}\ngot: {got_shapes}")

    variables = {
        "params": jax.tree_util.tree_map(jnp.asarray, params),
        "batch_stats": jax.tree_util.tree_map(jnp.asarray, batch_stats)}
    out = model.apply(variables, text, tl, mels, ol, deterministic=True,
                      rngs={"dropout": jax.random.PRNGKey(2)})
    assert bool(jnp.isfinite(out["after_outs"]).all())


def test_convert_fastspeech2_drop_in():
    import jax.numpy as jnp
    from parakeet_tpu.models import FastSpeech2
    from parakeet_tpu.utils.convert import convert_fastspeech2

    rng = np.random.default_rng(1)
    adim, heads, odim, vocab = 16, 2, 10, 30
    eunits = 32

    state = {}

    def dense(prefix, i, o):
        state[f"{prefix}.weight"] = rng.standard_normal(
            (i, o)).astype(np.float32)
        state[f"{prefix}.bias"] = rng.standard_normal((o,)).astype(
            np.float32)

    def conv(prefix, o, i, k, bias=True):
        state[f"{prefix}.weight"] = rng.standard_normal(
            (o, i, k)).astype(np.float32)
        if bias:
            state[f"{prefix}.bias"] = rng.standard_normal((o,)).astype(
                np.float32)

    def ln(prefix, d):
        state[f"{prefix}.weight"] = rng.standard_normal((d,)).astype(
            np.float32)
        state[f"{prefix}.bias"] = rng.standard_normal((d,)).astype(
            np.float32)

    def stack(prefix, alpha_idx):
        state[f"{prefix}.embed.{alpha_idx}.alpha"] = np.ones(
            (1,), np.float32)
        if alpha_idx == 1:
            state[f"{prefix}.embed.0.weight"] = rng.standard_normal(
                (vocab, adim)).astype(np.float32)
        lp = f"{prefix}.encoders.0"
        for nm in ("q", "k", "v", "out"):
            dense(f"{lp}.self_attn.linear_{nm}", adim, adim)
        ln(f"{lp}.norm1", adim)
        ln(f"{lp}.norm2", adim)
        conv(f"{lp}.feed_forward.w_1", eunits, adim, 1)
        conv(f"{lp}.feed_forward.w_2", adim, eunits, 1)
        ln(f"{prefix}.after_norm", adim)

    stack("encoder", 1)
    stack("decoder", 0)
    for pred in ("duration_predictor", "pitch_predictor",
                 "energy_predictor"):
        for i in range(2):
            conv(f"{pred}.conv.{i}.0", adim, adim, 3)
            ln(f"{pred}.conv.{i}.2", adim)
        dense(f"{pred}.linear", adim, 1)
    conv("pitch_embed.0", adim, 1, 9)
    conv("energy_embed.0", adim, 1, 9)
    dense("feat_out", adim, odim)
    for i, (ich, och) in enumerate(((odim, 8), (8, odim))):
        conv(f"postnet.postnet.{i}.0", och, ich, 5, bias=False)
        ln(f"postnet.postnet.{i}.1", och)
        state[f"postnet.postnet.{i}.1._mean"] = np.zeros((och,),
                                                         np.float32)
        state[f"postnet.postnet.{i}.1._variance"] = np.ones((och,),
                                                            np.float32)

    params, batch_stats = convert_fastspeech2(
        state, elayers=1, dlayers=1, aheads=heads, postnet_layers=2,
        predictor_layers=2, pitch_predictor_layers=2,
        energy_predictor_layers=2)

    model = FastSpeech2(idim=vocab, odim=odim, adim=adim, aheads=heads,
                        elayers=1, eunits=eunits, dlayers=1, dunits=eunits,
                        postnet_layers=2, postnet_chans=8, postnet_filts=5,
                        duration_predictor_chans=adim,
                        pitch_predictor_layers=2,
                        pitch_predictor_chans=adim,
                        energy_predictor_chans=adim)
    text = jnp.ones((1, 8), jnp.int64)
    ref = model.init(jax.random.PRNGKey(0), text, jnp.full((1,), 8),
                     jnp.zeros((1, 32, odim)), jnp.full((1,), 32),
                     jnp.ones((1, 8), jnp.int64), jnp.zeros((1, 8, 1)),
                     jnp.zeros((1, 8, 1)))

    shapes = jax.tree_util.tree_map(lambda a: a.shape, ref["params"])
    got = jax.tree_util.tree_map(lambda a: a.shape, params)
    assert shapes == got, f"params tree mismatch\nref {shapes}\ngot {got}"
    bs_shapes = jax.tree_util.tree_map(lambda a: a.shape,
                                       ref["batch_stats"])
    got_bs = jax.tree_util.tree_map(lambda a: a.shape, batch_stats)
    assert bs_shapes == got_bs

    variables = {"params": jax.tree_util.tree_map(jnp.asarray, params),
                 "batch_stats": jax.tree_util.tree_map(jnp.asarray,
                                                       batch_stats)}
    out = model.apply(variables, text, jnp.full((1,), 8), max_frames=32,
                      method=FastSpeech2.inference)
    assert bool(jnp.isfinite(out["after_outs"]).all())


def test_verify_parity_cli(tmp_path):
    """tools/verify_parity.py: MSE 0 on a self-golden, fail + exit 1 on
    a perturbed one (the BASELINE mel-MSE acceptance harness)."""
    import json
    import subprocess
    import sys
    import jax
    import jax.numpy as jnp
    from parakeet_tpu.models import FastSpeech2
    from parakeet_tpu.training.checkpoint import save_pytree
    m = FastSpeech2(idim=11, odim=6, adim=16, aheads=2, elayers=1,
                    eunits=24, dlayers=1, dunits=24, postnet_layers=1,
                    postnet_chans=8, postnet_filts=3,
                    duration_predictor_chans=8, pitch_predictor_chans=8,
                    energy_predictor_chans=8)
    text = jnp.asarray(np.random.default_rng(0).integers(1, 11, (1, 5)))
    tl = jnp.asarray([5])
    v = m.init({"params": jax.random.PRNGKey(0)}, text, tl,
               method=FastSpeech2.inference, max_frames=16)
    out = m.apply(v, text, tl, max_frames=16, min_duration=0,
                  method=FastSpeech2.inference)  # match the tool's
                  # reference-exact duration semantics
    save_pytree(tmp_path / "ck.npz", v)
    np.savez(tmp_path / "golden.npz", text=np.asarray(text),
             text_lengths=[5],
             mel=np.asarray(out["after_outs"])[0])
    (tmp_path / "conf.yaml").write_text(
        "n_mels: 6\nmodel:\n  adim: 16\n  aheads: 2\n  elayers: 1\n"
        "  eunits: 24\n  dlayers: 1\n  dunits: 24\n  postnet_layers: 1\n"
        "  postnet_chans: 8\n  postnet_filts: 3\n"
        "  duration_predictor_chans: 8\n  pitch_predictor_chans: 8\n"
        "  energy_predictor_chans: 8\n")

    import os
    env = dict(os.environ)
    repo = str(Path(__file__).resolve().parent.parent)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    cmd = [sys.executable, f"{repo}/tools/verify_parity.py",
           "--model", "fastspeech2", "--config", tmp_path / "conf.yaml",
           "--checkpoint", tmp_path / "ck.npz",
           "--golden", tmp_path / "golden.npz", "--device", "cpu"]
    p = subprocess.run([str(c) for c in cmd], capture_output=True,
                       text=True, env=env, timeout=600)
    assert p.returncode == 0, p.stderr[-1500:]
    assert json.loads(p.stdout.strip().splitlines()[-1])["pass"] is True
