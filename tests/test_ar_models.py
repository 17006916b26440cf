"""Tacotron2 / TransformerTTS / SpeedySpeech model tests (tiny shapes).

Mirrors the reference's unit-test strategy of exercising forward/backward
and inference termination on small configs (SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy lane: run via plain `pytest tests/`

from parakeet_tpu.models.speedyspeech import SpeedySpeech, speedyspeech_loss
from parakeet_tpu.models.tacotron2 import Tacotron2, tacotron2_loss
from parakeet_tpu.models.transformer_tts import (
    TransformerTTS, guided_multihead_attention_loss, transformer_tts_loss)


@pytest.fixture(scope="module")
def t2():
    model = Tacotron2(
        vocab_size=30, d_mels=8, d_encoder=16, encoder_conv_layers=2,
        d_prenet=8, d_attention_rnn=16, d_decoder_rnn=16,
        attention_filters=4, attention_kernel_size=5, d_attention=8,
        d_postnet=8, postnet_conv_layers=2, reduction_factor=2)
    rng = np.random.default_rng(0)
    text = jnp.asarray(rng.integers(1, 30, (2, 10)))
    tl = jnp.asarray([10, 7])
    mels = jnp.asarray(rng.standard_normal((2, 12, 8)).astype(np.float32))
    ol = jnp.asarray([12, 8])
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        text, tl, mels, ol, deterministic=False)
    return model, variables, (text, tl, mels, ol)


def test_tacotron2_teacher_forced_shapes(t2):
    model, variables, (text, tl, mels, ol) = t2
    out, _ = model.apply(variables, text, tl, mels, ol,
                         deterministic=False,
                         rngs={"dropout": jax.random.PRNGKey(2)},
                         mutable=["batch_stats"])
    assert out["mel_output"].shape == (2, 12, 8)
    assert out["mel_outputs_postnet"].shape == (2, 12, 8)
    assert out["stop_logits"].shape == (2, 6)      # reduction_factor 2
    assert out["alignments"].shape == (2, 6, 10)
    losses = tacotron2_loss(out, mels, ol, tl,
                            use_guided_attention_loss=True)
    for v in losses.values():
        assert np.isfinite(float(v))


def test_tacotron2_loss_grad_finite(t2):
    model, variables, (text, tl, mels, ol) = t2

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            text, tl, mels, ol, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(2)},
            mutable=["batch_stats"])
        return tacotron2_loss(out, mels, ol, tl)["loss"]

    grads = jax.grad(loss_fn)(variables["params"])
    flat = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.all(jnp.isfinite(g))) for g in flat)
    assert any(float(jnp.max(jnp.abs(g))) > 0 for g in flat)


def test_tacotron2_infer_masks_after_stop(t2):
    model, variables, (text, tl, _, _) = t2
    out = model.apply(variables, text, tl, max_decoder_steps=9,
                      deterministic=True, method=Tacotron2.infer,
                      rngs={"dropout": jax.random.PRNGKey(3)})
    mel = out["mel_outputs_postnet"]
    assert mel.shape == (2, 18, 8)
    lengths = np.asarray(out["lengths"])
    # frames past the reported length are masked to zero
    for b in range(2):
        assert np.allclose(np.asarray(mel)[b, lengths[b]:], 0.0)


@pytest.fixture(scope="module")
def ttts():
    model = TransformerTTS(
        idim=30, odim=8, embed_dim=16, eprenet_conv_layers=2,
        eprenet_conv_chans=8, eprenet_conv_filts=3, dprenet_layers=2,
        dprenet_units=8, elayers=2, eunits=16, adim=16, aheads=2,
        dlayers=2, dunits=16, postnet_layers=2, postnet_chans=8,
        postnet_filts=3, reduction_factor=1)
    rng = np.random.default_rng(0)
    text = jnp.asarray(rng.integers(1, 30, (2, 10)))
    tl = jnp.asarray([10, 7])
    speech = jnp.asarray(rng.standard_normal((2, 12, 8)).astype(np.float32))
    sl = jnp.asarray([12, 8])
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        text, tl, speech, sl, deterministic=False)
    return model, variables, (text, tl, speech, sl)


def test_transformer_tts_forward_and_loss(ttts):
    model, variables, (text, tl, speech, sl) = ttts
    out, _ = model.apply(variables, text, tl, speech, sl,
                         deterministic=False,
                         rngs={"dropout": jax.random.PRNGKey(2)},
                         mutable=["batch_stats"])
    assert out["after_outs"].shape == (2, 12, 8)
    assert out["stop_logits"].shape == (2, 12)
    losses = transformer_tts_loss(out, speech, sl, loss_type="L1+L2")
    for v in losses.values():
        assert np.isfinite(float(v))
    ga = guided_multihead_attention_loss(
        out["dec_cross_attns"], sl, tl, num_layers=1, num_heads=2)
    assert np.isfinite(float(ga))


def test_transformer_tts_causality(ttts):
    """Future target frames must not affect earlier decoder outputs."""
    model, variables, (text, tl, speech, sl) = ttts
    out1, _ = model.apply(variables, text, tl, speech, sl,
                          deterministic=True,
                          rngs={"dropout": jax.random.PRNGKey(9)},
                          mutable=["batch_stats"])
    speech2 = speech.at[:, -1].add(100.0)       # poke the last frame
    out2, _ = model.apply(variables, text, tl, speech2, sl,
                          deterministic=True,
                          rngs={"dropout": jax.random.PRNGKey(9)},
                          mutable=["batch_stats"])
    # decoder input is shifted right, so frames < T-1 see identical inputs
    np.testing.assert_allclose(
        np.asarray(out1["before_outs"])[:, :11],
        np.asarray(out2["before_outs"])[:, :11], rtol=2e-4, atol=2e-4)


def test_transformer_tts_inference_shapes(ttts):
    model, variables, (text, tl, _, _) = ttts
    out = model.apply(variables, text, tl, max_decoder_steps=7,
                      deterministic=True,
                      method=TransformerTTS.inference,
                      rngs={"dropout": jax.random.PRNGKey(3)})
    assert out["mel"].shape == (2, 7, 8)
    assert out["lengths"].shape == (2,)


def test_speedyspeech_forward_inference_loss():
    model = SpeedySpeech(
        vocab_size=30, encoder_hidden_size=16, encoder_dilations=(1, 3, 1),
        duration_predictor_hidden_size=16, decoder_hidden_size=16,
        decoder_output_size=8, decoder_dilations=(1, 3, 1), tone_size=5)
    rng = np.random.default_rng(0)
    text = jnp.asarray(rng.integers(1, 30, (2, 10)))
    tones = jnp.asarray(rng.integers(0, 5, (2, 10)))
    durations = jnp.asarray(rng.integers(1, 3, (2, 10)))
    variables = model.init({"params": jax.random.PRNGKey(0)}, text,
                           durations, tones, max_frames=24,
                           deterministic=False)
    out, _ = model.apply(variables, text, durations, tones, max_frames=24,
                         deterministic=False, mutable=["batch_stats"])
    assert out["mel"].shape == (2, 24, 8)
    # expansion respects total durations
    np.testing.assert_array_equal(np.asarray(out["frame_lengths"]),
                                  np.asarray(durations.sum(axis=-1)))
    batch = {"feats": jnp.zeros((2, 24, 8)),
             "num_frames": out["frame_lengths"],
             "durations": durations, "num_phones": jnp.asarray([10, 7])}
    losses = speedyspeech_loss(out, batch)
    for v in losses.values():
        assert np.isfinite(float(v))
    inf = model.apply(variables, text, tones, max_frames=40,
                      deterministic=True, method=SpeedySpeech.inference)
    assert inf["mel"].shape == (2, 40, 8)


def test_transformer_tts_appends_eos():
    """The model appends <eos> (idim-1) at each text end before encoding
    (reference transformer_tts.py:420-424)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from parakeet_tpu.models.transformer_tts import TransformerTTS
    model = TransformerTTS(idim=11, odim=6, adim=16, aheads=2, elayers=1,
                           eunits=24, dlayers=1, dunits=24,
                           eprenet_conv_layers=0, dprenet_units=8,
                           postnet_layers=2, postnet_chans=8,
                           postnet_filts=3)
    rng = np.random.default_rng(0)
    text = jnp.asarray(rng.integers(1, 10, (2, 5)).astype(np.int32))
    tl = jnp.asarray([5, 3])
    mels = jnp.asarray(rng.standard_normal((2, 8, 6)).astype(np.float32))
    ol = jnp.full((2,), 8)
    v = model.init({"params": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(1)},
                   text, tl, mels, ol, deterministic=True)
    hs, mask, _ = model.apply(v, text, tl, deterministic=True,
                              method=TransformerTTS.encode)
    assert hs.shape[1] == 6          # T_enc + 1 eos slot
    # mask covers length+1 positions
    np.testing.assert_array_equal(np.asarray(mask[0]), [1] * 6)
    np.testing.assert_array_equal(np.asarray(mask[1]), [1] * 4 + [0] * 2)
    # the eos embedding is the same regardless of what padding held
    text2 = text.at[1, 3:].set(7)    # garbage beyond length 3
    hs2, _, _ = model.apply(v, text2, tl, deterministic=True,
                            method=TransformerTTS.encode)
    np.testing.assert_allclose(np.asarray(hs[1, :4]),
                               np.asarray(hs2[1, :4]), atol=2e-5)


def test_tacotron2_bf16_decode():
    """bf16 compute: the infer scan carry keeps a fixed dtype (fp32
    stable-softmax attention weights are cast back) and the output is
    finite."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from parakeet_tpu.models import Tacotron2
    model = Tacotron2(vocab_size=12, d_mels=8, d_encoder=16,
                      encoder_conv_layers=1, encoder_kernel_size=3,
                      d_prenet=8, d_attention_rnn=16, d_decoder_rnn=16,
                      d_attention=16, attention_filters=4,
                      attention_kernel_size=5, d_postnet=8,
                      postnet_kernel_size=3, postnet_conv_layers=2,
                      dtype=jnp.bfloat16)
    text = jnp.asarray(np.random.default_rng(0).integers(
        1, 12, (2, 6)).astype(np.int64))
    tl = jnp.asarray([6, 4])
    v = model.init({"params": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(1)},
                   text, tl, max_decoder_steps=8,
                   method=Tacotron2.infer)
    out = jax.jit(lambda v, t, l: model.apply(
        v, t, l, max_decoder_steps=8,
        rngs={"dropout": jax.random.PRNGKey(2)},
        method=Tacotron2.infer))(v, text, tl)
    mel = np.asarray(out["mel_outputs_postnet"], np.float32)
    assert np.isfinite(mel).all()


@pytest.mark.parametrize("r", [1, 2])
def test_transformer_tts_cached_decode_matches_prefix_recompute(r):
    """The scan decode (fixed KV caches, fused QKV step, hoisted PE
    rows and cross-K/V) must equal the definitionally-correct AR loop
    that re-runs the decoder on the full generated prefix each step
    with no caches — at reduction_factor 1 AND 2 (the reference thins
    frames at transformer_tts.py:462-510).  Prenet dropout is disabled
    so both paths are deterministic."""
    from parakeet_tpu.ops.masking import future_mask

    odim, steps, b = 8, 5, 2
    model = TransformerTTS(
        idim=11, odim=odim, adim=16, aheads=2, elayers=2, dlayers=2,
        eunits=32, dunits=32, postnet_layers=2, postnet_chans=8,
        postnet_filts=3, eprenet_conv_layers=0, dprenet_layers=2,
        dprenet_units=8, reduction_factor=r, dprenet_dropout_rate=0.0)
    rng = np.random.default_rng(3)
    text = jnp.asarray(rng.integers(1, 10, (b, 6)))
    tl = jnp.asarray([6, 4])
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        text, tl, max_decoder_steps=2, method=TransformerTTS.inference)

    out = model.apply(variables, text, tl, max_decoder_steps=steps,
                      threshold=2.0,  # sigmoid < 1: never stops early
                      deterministic=True, method=TransformerTTS.inference,
                      rngs={"dropout": jax.random.PRNGKey(7)})
    assert out["mel"].shape == (b, steps * r, odim)

    def prefix_step(mdl, text, tl, prev):
        """One AR step, no caches: full prefix through the decoder."""
        hs, enc_mask, _ = mdl.encode(text, tl, None, None,
                                     deterministic=True)
        d_in = mdl._decoder_input(prev, deterministic=True)
        t = prev.shape[1]
        self_mask = future_mask(t)[None, None]
        zs, _, _ = mdl.decoder(d_in, hs, self_mask,
                               enc_mask[:, None, None, :],
                               deterministic=True)
        return mdl.feat_out(zs[:, -1]).reshape(b, r, odim)

    prev = jnp.zeros((b, 1, odim))
    frames = []
    for _ in range(steps):
        f = model.apply(variables, text, tl, prev, method=prefix_step,
                        rngs={"dropout": jax.random.PRNGKey(7)})
        frames.append(f)
        prev = jnp.concatenate([prev, f[:, -1:, :]], axis=1)
    mel_before = jnp.concatenate(frames, axis=1)       # (b, steps*r, odim)
    mel_ref = model.apply(
        variables, mel_before, deterministic=True,
        method=lambda mdl, x, deterministic: x + mdl.postnet(
            x, deterministic=deterministic))
    np.testing.assert_allclose(np.asarray(out["mel"]),
                               np.asarray(mel_ref), atol=2e-4, rtol=2e-4)
