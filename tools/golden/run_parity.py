#!/usr/bin/env python
"""Run every golden-parity comparison and emit the PARITY.md table.

For each model family: build a paddle-layout state dict
(``fixtures.py``), convert it with ``parakeet_tpu.utils.convert``, run
our JAX model and the independent torch oracle on the same inputs, and
report max-abs-diff / MSE over the valid regions.

Usage: PYTHONPATH=. python tools/golden/run_parity.py [--write PARITY.md]
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _tree_diff(ours, gold):
    """(max abs diff, mse) over two pytrees with identical structure,
    matched by key path."""
    flat_gold = dict(
        (jax.tree_util.keystr(p), l) for p, l in
        jax.tree_util.tree_leaves_with_path(gold))
    diffs = []
    for path, leaf in jax.tree_util.tree_leaves_with_path(ours):
        gl = flat_gold[jax.tree_util.keystr(path)]
        diffs.append(np.abs(np.asarray(leaf, np.float64)
                            - np.asarray(gl, np.float64)).reshape(-1))
    flat = np.concatenate(diffs)
    return float(flat.max()), float((flat ** 2).mean())


def _metrics(ours, gold, valid_lens=None):
    ours, gold = np.asarray(ours, np.float64), np.asarray(gold, np.float64)
    if valid_lens is not None:
        diffs = [ours[b, :valid_lens[b]] - gold[b, :valid_lens[b]]
                 for b in range(len(valid_lens))]
        flat = np.concatenate([d.reshape(-1) for d in diffs])
    else:
        flat = (ours - gold).reshape(-1)
    return float(np.abs(flat).max()), float((flat ** 2).mean())


def check_pwg():
    from parakeet_tpu.models import PWGGenerator
    from parakeet_tpu.utils.convert import convert_pwg_generator
    from tools.golden.fixtures import pwg_state
    from tools.golden.pwg import golden_pwg_forward

    state, cfg = pwg_state()
    params = convert_pwg_generator(state, layers=cfg["layers"],
                                   upsample_scales=cfg["upsample_scales"])
    gen = PWGGenerator(layers=cfg["layers"], stacks=cfg["stacks"],
                       residual_channels=cfg["residual_channels"],
                       gate_channels=cfg["gate_channels"],
                       skip_channels=cfg["skip_channels"],
                       aux_channels=cfg["aux_channels"],
                       aux_context_window=cfg["aux_context_window"],
                       upsample_scales=cfg["upsample_scales"])
    rng = np.random.default_rng(0)
    up = int(np.prod(cfg["upsample_scales"]))
    w = cfg["aux_context_window"]
    noise = rng.standard_normal((1, 5 * up, 1)).astype(np.float32)
    mel = rng.standard_normal(
        (1, 5 + 2 * w, cfg["aux_channels"])).astype(np.float32)
    ours = gen.apply({"params": jax.tree_util.tree_map(jnp.asarray,
                                                       params)},
                     jnp.asarray(noise), jnp.asarray(mel))
    gold = golden_pwg_forward(
        state, noise.transpose(0, 2, 1), mel.transpose(0, 2, 1),
        layers=cfg["layers"], stacks=cfg["stacks"],
        upsample_scales=cfg["upsample_scales"],
        aux_context_window=w).transpose(0, 2, 1)
    return {"waveform": _metrics(ours, gold)}


def check_fastspeech2():
    from parakeet_tpu.models import FastSpeech2
    from parakeet_tpu.utils.convert import convert_fastspeech2
    from tools.golden.fastspeech2 import golden_fastspeech2_forward
    from tools.golden.fixtures import fastspeech2_state

    state, cfg = fastspeech2_state()
    params, batch_stats = convert_fastspeech2(
        state, elayers=cfg["elayers"], dlayers=cfg["dlayers"],
        aheads=cfg["heads"], postnet_layers=cfg["postnet_layers"],
        predictor_layers=2, pitch_predictor_layers=2,
        energy_predictor_layers=2)
    model = FastSpeech2(
        idim=cfg["vocab"], odim=cfg["odim"], adim=cfg["adim"],
        aheads=cfg["heads"], elayers=1, eunits=cfg["eunits"], dlayers=1,
        dunits=cfg["eunits"], postnet_layers=2, postnet_chans=8,
        postnet_filts=5, duration_predictor_chans=cfg["adim"],
        pitch_predictor_layers=2, pitch_predictor_chans=cfg["adim"],
        energy_predictor_chans=cfg["adim"])
    rng = np.random.default_rng(0)
    B, Tmax = 2, 8
    text = rng.integers(1, cfg["vocab"], (B, Tmax))
    ilens = np.array([8, 5])
    text[1, 5:] = 0
    dur = rng.integers(1, 5, (B, Tmax))
    dur = dur * (np.arange(Tmax)[None] < ilens[:, None])
    olens = dur.sum(1)
    pitch = rng.standard_normal((B, Tmax, 1)).astype(np.float32)
    energy = rng.standard_normal((B, Tmax, 1)).astype(np.float32)
    speech = np.zeros((B, int(olens.max()), cfg["odim"]), np.float32)
    variables = {
        "params": jax.tree_util.tree_map(jnp.asarray, params),
        "batch_stats": jax.tree_util.tree_map(jnp.asarray, batch_stats)}
    out = model.apply(variables, jnp.asarray(text), jnp.asarray(ilens),
                      jnp.asarray(speech), jnp.asarray(olens),
                      jnp.asarray(dur), jnp.asarray(pitch),
                      jnp.asarray(energy), deterministic=True)
    gold = golden_fastspeech2_forward(state, text, ilens, dur, pitch,
                                      energy, odim=cfg["odim"],
                                      heads=cfg["heads"])
    res = {}
    for k in ("before_outs", "after_outs"):
        res[k] = _metrics(out[k], gold[k], gold["olens"])
    for k in ("d_outs", "p_outs", "e_outs"):
        res[k] = _metrics(out[k], gold[k], ilens)
    return res


def check_pwg_gan_grads():
    """Training-numerics parity for the GAN step: generator AND
    discriminator gradients through the full adversarial loss
    (multi-res STFT + lambda_adv * MSE(D(fake),1); MSE(D(real),1) +
    MSE(D(stopgrad fake),0)) vs the fp64 torch oracle — the reference
    updater semantics (parallel_wavegan_updater.py:76-151) with the
    discriminator past warmup."""
    from parakeet_tpu.models import PWGDiscriminator, PWGGenerator
    from parakeet_tpu.ops.stft_loss import multi_resolution_stft_loss
    from parakeet_tpu.utils.convert import (convert_pwg_discriminator,
                                            convert_pwg_generator)
    from tools.golden.fixtures import pwg_disc_state, pwg_state
    from tools.golden.pwg import golden_pwg_gan_grads

    gen_state, gcfg = pwg_state()
    disc_state, dcfg = pwg_disc_state()
    gen_params = convert_pwg_generator(
        gen_state, layers=gcfg["layers"],
        upsample_scales=gcfg["upsample_scales"])
    disc_params = convert_pwg_discriminator(disc_state,
                                            layers=dcfg["layers"])
    gen = PWGGenerator(layers=gcfg["layers"], stacks=gcfg["stacks"],
                       residual_channels=gcfg["residual_channels"],
                       gate_channels=gcfg["gate_channels"],
                       skip_channels=gcfg["skip_channels"],
                       aux_channels=gcfg["aux_channels"],
                       aux_context_window=gcfg["aux_context_window"],
                       upsample_scales=gcfg["upsample_scales"])
    disc = PWGDiscriminator(layers=dcfg["layers"],
                            conv_channels=dcfg["conv_channels"])
    rng = np.random.default_rng(2)
    up = int(np.prod(gcfg["upsample_scales"]))
    w = gcfg["aux_context_window"]
    t_frames = 24
    noise = rng.standard_normal((1, t_frames * up, 1)).astype(np.float32)
    mel = rng.standard_normal(
        (1, t_frames + 2 * w, gcfg["aux_channels"])).astype(np.float32)
    wav = rng.standard_normal((1, t_frames * up)).astype(np.float32)
    lambda_adv = 4.0
    ffts, hops, wins = (256, 128), (64, 32), (128, 64)

    gp = jax.tree_util.tree_map(jnp.asarray, gen_params)
    dp = jax.tree_util.tree_map(jnp.asarray, disc_params)

    def mse(x, target):
        return jnp.mean(jnp.square(x.astype(jnp.float32) - target))

    def gen_loss_fn(p):
        fake = gen.apply({"params": p}, jnp.asarray(noise),
                         jnp.asarray(mel), deterministic=False,
                         rngs={"dropout": jax.random.PRNGKey(0)})
        sc, mag = multi_resolution_stft_loss(
            fake[..., 0], jnp.asarray(wav), ffts, hops, wins)
        adv = mse(disc.apply({"params": dp}, fake), 1.0)
        return sc + mag + lambda_adv * adv

    def disc_loss_fn(p):
        fake = jax.lax.stop_gradient(
            gen.apply({"params": gp}, jnp.asarray(noise),
                      jnp.asarray(mel), deterministic=False,
                      rngs={"dropout": jax.random.PRNGKey(0)}))
        real = mse(disc.apply({"params": p},
                              jnp.asarray(wav)[..., None]), 1.0)
        fk = mse(disc.apply({"params": p}, fake), 0.0)
        return real + fk

    gen_loss, gen_grads = jax.value_and_grad(gen_loss_fn)(gp)
    disc_loss, disc_grads = jax.value_and_grad(disc_loss_fn)(dp)

    gold_metrics, gold_gen_paddle, gold_disc_paddle = golden_pwg_gan_grads(
        gen_state, disc_state, noise.transpose(0, 2, 1),
        mel.transpose(0, 2, 1), wav,
        gen_cfg=dict(layers=gcfg["layers"], stacks=gcfg["stacks"],
                     upsample_scales=gcfg["upsample_scales"],
                     aux_context_window=gcfg["aux_context_window"]),
        disc_layers=dcfg["layers"], lambda_adv=lambda_adv,
        fft_sizes=ffts, hop_sizes=hops, win_lengths=wins)
    gold_gen = convert_pwg_generator(
        gold_gen_paddle, layers=gcfg["layers"],
        upsample_scales=gcfg["upsample_scales"])
    gold_disc = convert_pwg_discriminator(gold_disc_paddle,
                                          layers=dcfg["layers"])

    return {
        "gen_loss": _metrics(np.asarray([float(gen_loss)]),
                             np.asarray([gold_metrics["generator_loss"]])),
        "disc_loss": _metrics(
            np.asarray([float(disc_loss)]),
            np.asarray([gold_metrics["discriminator_loss"]])),
        "gen_grads": _tree_diff(gen_grads, gold_gen),
        "disc_grads": _tree_diff(disc_grads, gold_disc),
    }


def check_fastspeech2_grads():
    """Training-numerics parity: d loss / d params vs the fp64 torch
    oracle through the FULL masked FastSpeech2 loss (train-mode postnet
    BN, dropout 0).  Verdict-round-3 item: golden parity was
    forward-only; this pins the backward."""
    from parakeet_tpu.models import FastSpeech2
    from parakeet_tpu.models.fastspeech2 import fastspeech2_loss
    from parakeet_tpu.utils.convert import convert_fastspeech2
    from tools.golden.fastspeech2 import golden_fastspeech2_loss_and_grads
    from tools.golden.fixtures import fastspeech2_state

    state, cfg = fastspeech2_state()
    params, batch_stats = convert_fastspeech2(
        state, elayers=cfg["elayers"], dlayers=cfg["dlayers"],
        aheads=cfg["heads"], postnet_layers=cfg["postnet_layers"],
        predictor_layers=2, pitch_predictor_layers=2,
        energy_predictor_layers=2)
    model = FastSpeech2(
        idim=cfg["vocab"], odim=cfg["odim"], adim=cfg["adim"],
        aheads=cfg["heads"], elayers=1, eunits=cfg["eunits"], dlayers=1,
        dunits=cfg["eunits"], postnet_layers=2, postnet_chans=8,
        postnet_filts=5, duration_predictor_chans=cfg["adim"],
        pitch_predictor_layers=2, pitch_predictor_chans=cfg["adim"],
        energy_predictor_chans=cfg["adim"],
        transformer_enc_dropout_rate=0.0,
        transformer_enc_positional_dropout_rate=0.0,
        transformer_enc_attn_dropout_rate=0.0,
        transformer_dec_dropout_rate=0.0,
        transformer_dec_positional_dropout_rate=0.0,
        transformer_dec_attn_dropout_rate=0.0,
        postnet_dropout_rate=0.0, duration_predictor_dropout_rate=0.0,
        energy_predictor_dropout=0.0, energy_embed_dropout=0.0,
        pitch_predictor_dropout=0.0, pitch_embed_dropout=0.0)
    rng = np.random.default_rng(1)
    B, Tmax = 2, 8
    text = rng.integers(1, cfg["vocab"], (B, Tmax))
    ilens = np.array([8, 5])
    text[1, 5:] = 0
    dur = rng.integers(1, 5, (B, Tmax))
    dur = dur * (np.arange(Tmax)[None] < ilens[:, None])
    olens = dur.sum(1)
    pitch = rng.standard_normal((B, Tmax, 1)).astype(np.float32)
    energy = rng.standard_normal((B, Tmax, 1)).astype(np.float32)
    speech = rng.standard_normal(
        (B, int(olens.max()), cfg["odim"])).astype(np.float32)
    batch = {"speech": jnp.asarray(speech),
             "text_lengths": jnp.asarray(ilens),
             "durations": jnp.asarray(dur),
             "pitch": jnp.asarray(pitch), "energy": jnp.asarray(energy)}

    def loss_fn(p):
        outputs, _ = model.apply(
            {"params": p,
             "batch_stats": jax.tree_util.tree_map(jnp.asarray,
                                                   batch_stats)},
            jnp.asarray(text), jnp.asarray(ilens), jnp.asarray(speech),
            jnp.asarray(olens), jnp.asarray(dur), jnp.asarray(pitch),
            jnp.asarray(energy), deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(0)},
            mutable=["batch_stats"])
        return fastspeech2_loss(outputs, batch, True, False)["loss"]

    loss, grads = jax.value_and_grad(loss_fn)(
        jax.tree_util.tree_map(jnp.asarray, params))

    gold_loss, gold_grads_paddle = golden_fastspeech2_loss_and_grads(
        state, text, ilens, speech, dur, pitch, energy,
        odim=cfg["odim"], heads=cfg["heads"])
    # the converter's layout transforms are pure reindexings, so they
    # map gradients exactly as they map weights
    gold_grads, _ = convert_fastspeech2(
        gold_grads_paddle, elayers=cfg["elayers"], dlayers=cfg["dlayers"],
        aheads=cfg["heads"], postnet_layers=cfg["postnet_layers"],
        predictor_layers=2, pitch_predictor_layers=2,
        energy_predictor_layers=2)

    return {"loss": _metrics(np.asarray([float(loss)]),
                             np.asarray([gold_loss])),
            "grads": _tree_diff(grads, gold_grads)}


def check_tacotron2():
    from parakeet_tpu.models.tacotron2 import Tacotron2
    from parakeet_tpu.utils.convert import convert_tacotron2
    from tools.golden.fixtures import tacotron2_state
    from tools.golden.tacotron2 import golden_tacotron2_forward

    state, cfg = tacotron2_state()
    params, batch_stats = convert_tacotron2(
        state, encoder_conv_layers=cfg["encoder_conv_layers"],
        postnet_conv_layers=cfg["postnet_conv_layers"],
        use_stop_token=True)
    model = Tacotron2(
        vocab_size=cfg["vocab"], d_mels=cfg["d_mels"],
        d_encoder=cfg["d_enc"],
        encoder_conv_layers=cfg["encoder_conv_layers"],
        encoder_kernel_size=3, d_prenet=cfg["d_prenet"],
        d_attention_rnn=cfg["d_att_rnn"], d_decoder_rnn=cfg["d_dec_rnn"],
        attention_filters=cfg["filters"],
        attention_kernel_size=cfg["k_att"], d_attention=cfg["d_att"],
        d_postnet=8, postnet_kernel_size=3,
        postnet_conv_layers=cfg["postnet_conv_layers"],
        reduction_factor=1, use_stop_token=True, p_prenet_dropout=0.0,
        p_encoder_dropout=0.0, p_attention_dropout=0.0,
        p_decoder_dropout=0.0, p_postnet_dropout=0.0)
    rng = np.random.default_rng(0)
    B, T_text, T_mel = 2, 5, 8
    text = rng.integers(1, cfg["vocab"], (B, T_text))
    mels = rng.standard_normal((B, T_mel, cfg["d_mels"])).astype(
        np.float32)
    variables = {
        "params": jax.tree_util.tree_map(jnp.asarray, params),
        "batch_stats": jax.tree_util.tree_map(jnp.asarray, batch_stats)}
    out = model.apply(variables, jnp.asarray(text),
                      jnp.full((B,), T_text), jnp.asarray(mels),
                      jnp.full((B,), T_mel), deterministic=True,
                      rngs={"dropout": jax.random.PRNGKey(2)})
    gold = golden_tacotron2_forward(state, text, mels)
    res = {}
    for k in ("mel_output", "mel_outputs_postnet", "alignments"):
        res[k] = _metrics(out[k], gold[k])
    res["stop_logits"] = _metrics(
        np.asarray(out["stop_logits"]).reshape(B, -1),
        gold["stop_logits"].reshape(B, -1))
    return res


def check_speedyspeech():
    from parakeet_tpu.models.speedyspeech import SpeedySpeech
    from parakeet_tpu.utils.convert import convert_speedyspeech
    from tools.golden.fixtures import speedyspeech_state
    from tools.golden.speedyspeech import golden_speedyspeech_forward

    state, cfg = speedyspeech_state()
    params, batch_stats = convert_speedyspeech(
        state, encoder_dilations=cfg["enc_dil"],
        decoder_dilations=cfg["dec_dil"])
    model = SpeedySpeech(
        vocab_size=cfg["vocab"], encoder_hidden_size=cfg["hidden"],
        encoder_dilations=cfg["enc_dil"],
        duration_predictor_hidden_size=cfg["hidden"],
        decoder_hidden_size=cfg["hidden"],
        decoder_output_size=cfg["odim"],
        decoder_dilations=cfg["dec_dil"], tone_size=cfg["tones"])
    rng = np.random.default_rng(0)
    B, T = 2, 7
    text = rng.integers(1, cfg["vocab"], (B, T))
    tone_ids = rng.integers(1, cfg["tones"], (B, T))
    durs = rng.integers(1, 3, (B, T))
    tot = int(durs.sum(1).max())
    variables = {
        "params": jax.tree_util.tree_map(jnp.asarray, params),
        "batch_stats": jax.tree_util.tree_map(jnp.asarray, batch_stats)}
    out = model.apply(variables, jnp.asarray(text), jnp.asarray(durs),
                      jnp.asarray(tone_ids), max_frames=tot,
                      deterministic=True)
    g_mel, g_logd = golden_speedyspeech_forward(
        state, text, tone_ids, durs, encoder_dilations=cfg["enc_dil"],
        decoder_dilations=cfg["dec_dil"])
    return {"mel": _metrics(out["mel"], g_mel, durs.sum(1)),
            "log_durations": _metrics(out["log_durations"], g_logd)}


def check_waveflow():
    from parakeet_tpu.models.waveflow import ConditionalWaveFlow
    from parakeet_tpu.utils.convert import convert_waveflow
    from tools.golden.fixtures import waveflow_state
    from tools.golden.waveflow import golden_waveflow_forward

    state, cfg = waveflow_state()
    params = convert_waveflow(state, n_flows=cfg["n_flows"],
                              n_layers=cfg["n_layers"],
                              upsample_factors=cfg["factors"])
    model = ConditionalWaveFlow(
        upsample_factors=cfg["factors"], n_flows=cfg["n_flows"],
        n_layers=cfg["n_layers"], n_group=cfg["n_group"],
        channels=cfg["channels"], n_mels=cfg["n_mels"])
    rng = np.random.default_rng(0)
    audio = rng.standard_normal((1, 64)).astype(np.float32)
    mel = rng.standard_normal((1, 16, cfg["n_mels"])).astype(np.float32)
    z, logdet = model.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.asarray(audio), jnp.asarray(mel))
    gz, glogdet = golden_waveflow_forward(
        state, audio, mel.transpose(0, 2, 1), n_flows=cfg["n_flows"],
        n_layers=cfg["n_layers"], n_group=cfg["n_group"],
        upsample_factors=cfg["factors"])
    return {"z": _metrics(z, gz),
            "log_det": _metrics(np.asarray(logdet).sum(), glogdet)}


def check_transformer_tts():
    from parakeet_tpu.models.transformer_tts import TransformerTTS
    from parakeet_tpu.utils.convert import convert_transformer_tts
    from tools.golden.fixtures import transformer_tts_state
    from tools.golden.transformer_tts import golden_transformer_tts_forward

    state, cfg = transformer_tts_state()
    params, batch_stats = convert_transformer_tts(
        state, elayers=1, dlayers=1, aheads=cfg["heads"],
        dprenet_layers=2, postnet_layers=2)
    model = TransformerTTS(
        idim=cfg["idim"], odim=cfg["odim"], adim=cfg["adim"],
        aheads=cfg["heads"], elayers=1, eunits=cfg["units"], dlayers=1,
        dunits=cfg["units"], eprenet_conv_layers=0,
        dprenet_units=cfg["dp_units"], postnet_layers=2, postnet_chans=8,
        postnet_filts=3, reduction_factor=1, dprenet_dropout_rate=0.0)
    rng = np.random.default_rng(0)
    B = 2
    text = rng.integers(1, cfg["idim"] - 1, (B, 6))
    text[1, 4:] = 0
    tl = np.array([6, 4])
    mels = rng.standard_normal((B, 8, cfg["odim"])).astype(np.float32)
    ol = np.array([8, 6])
    variables = {
        "params": jax.tree_util.tree_map(jnp.asarray, params),
        "batch_stats": jax.tree_util.tree_map(jnp.asarray, batch_stats)}
    out = model.apply(variables, jnp.asarray(text), jnp.asarray(tl),
                      jnp.asarray(mels), jnp.asarray(ol),
                      deterministic=True,
                      rngs={"dropout": jax.random.PRNGKey(2)})
    gold = golden_transformer_tts_forward(
        state, text, tl, mels, ol, odim=cfg["odim"],
        eos=cfg["idim"] - 1, heads=cfg["heads"])
    return {k: _metrics(out[k], gold[k], ol)
            for k in ("before_outs", "after_outs", "stop_logits")}


def check_ge2e():
    from parakeet_tpu.models.lstm_speaker_encoder import (
        LSTMSpeakerEncoder, ge2e_loss)
    from parakeet_tpu.utils.convert import convert_ge2e
    from tools.golden.fixtures import ge2e_state
    from tools.golden.ge2e import golden_ge2e_forward

    state, cfg = ge2e_state()
    params = convert_ge2e(state, num_layers=cfg["num_layers"])
    model = LSTMSpeakerEncoder(n_mels=cfg["n_mels"],
                               num_layers=cfg["num_layers"],
                               hidden_size=cfg["hidden_size"],
                               output_size=cfg["output_size"])
    rng = np.random.default_rng(0)
    n, m, t = 4, 5, 16
    utts = rng.standard_normal((n * m, t, cfg["n_mels"])).astype(
        np.float32)
    variables = {"params": jax.tree_util.tree_map(jnp.asarray, params)}
    embeds, (w, b) = model.apply(variables, jnp.asarray(utts),
                                 n_speakers=n,
                                 method=LSTMSpeakerEncoder.embed_sequences)
    loss, aux = ge2e_loss(embeds, w, b)
    gold = golden_ge2e_forward(state, utts, n,
                               num_layers=cfg["num_layers"])
    ours = {
        "embeds": embeds.reshape(n * m, -1),
        "sim": aux["sim"].reshape(n * m, n),
        "loss": jnp.asarray(loss).reshape(1),
    }
    return {k: _metrics(ours[k], gold[k]) for k in ours}


def check_waveflow_grads():
    """Training-numerics parity: d WaveFlowLoss / d params vs the fp64
    torch oracle.  The oracle folds weight norm first (our model trains
    plain convs), so the gradient mapping through convert_waveflow is a
    pure reindexing."""
    from parakeet_tpu.models.waveflow import (ConditionalWaveFlow,
                                              waveflow_loss)
    from parakeet_tpu.utils.convert import convert_waveflow
    from tools.golden.fixtures import waveflow_state
    from tools.golden.waveflow import golden_waveflow_loss_and_grads

    state, cfg = waveflow_state()
    params = convert_waveflow(state, n_flows=cfg["n_flows"],
                              n_layers=cfg["n_layers"],
                              upsample_factors=cfg["factors"])
    model = ConditionalWaveFlow(
        upsample_factors=cfg["factors"], n_flows=cfg["n_flows"],
        n_layers=cfg["n_layers"], n_group=cfg["n_group"],
        channels=cfg["channels"], n_mels=cfg["n_mels"])
    rng = np.random.default_rng(3)
    audio = rng.standard_normal((2, 64)).astype(np.float32)
    mel = rng.standard_normal((2, 16, cfg["n_mels"])).astype(np.float32)

    def loss_fn(p):
        z, logdet = model.apply({"params": p}, jnp.asarray(audio),
                                jnp.asarray(mel))
        return waveflow_loss(z, logdet)["loss"]

    loss, grads = jax.value_and_grad(loss_fn)(
        jax.tree_util.tree_map(jnp.asarray, params))

    gold_loss, gold_paddle = golden_waveflow_loss_and_grads(
        state, audio, mel.transpose(0, 2, 1), n_flows=cfg["n_flows"],
        n_layers=cfg["n_layers"], n_group=cfg["n_group"],
        upsample_factors=cfg["factors"])
    gold_grads = convert_waveflow(gold_paddle, n_flows=cfg["n_flows"],
                                  n_layers=cfg["n_layers"],
                                  upsample_factors=cfg["factors"])
    return {"loss": _metrics(np.asarray([float(loss)]),
                             np.asarray([gold_loss])),
            "grads": _tree_diff(grads, gold_grads)}


def check_ge2e_grads():
    """Training-numerics parity: d GE2E loss / d params (including the
    reference do_gradient_ops x0.01 (w, b) scaling) vs torch.nn.LSTM
    autograd in fp64."""
    from parakeet_tpu.models.lstm_speaker_encoder import (
        LSTMSpeakerEncoder, ge2e_loss, scale_wb_gradients)
    from parakeet_tpu.utils.convert import convert_ge2e
    from tools.golden.fixtures import ge2e_state
    from tools.golden.ge2e import golden_ge2e_loss_and_grads

    state, cfg = ge2e_state()
    params = convert_ge2e(state, num_layers=cfg["num_layers"])
    model = LSTMSpeakerEncoder(n_mels=cfg["n_mels"],
                               num_layers=cfg["num_layers"],
                               hidden_size=cfg["hidden_size"],
                               output_size=cfg["output_size"])
    rng = np.random.default_rng(4)
    n, m, t = 4, 5, 16
    utts = rng.standard_normal((n * m, t, cfg["n_mels"])).astype(
        np.float32)

    def loss_fn(p):
        embeds, (w, b) = model.apply(
            {"params": p}, jnp.asarray(utts), n_speakers=n,
            method=LSTMSpeakerEncoder.embed_sequences)
        loss, _ = ge2e_loss(embeds, w, b)
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(
        jax.tree_util.tree_map(jnp.asarray, params))
    grads = scale_wb_gradients(grads)

    gold_loss, gold_paddle = golden_ge2e_loss_and_grads(
        state, utts, n, num_layers=cfg["num_layers"])
    gold_grads = convert_ge2e(gold_paddle, num_layers=cfg["num_layers"])
    return {"loss": _metrics(np.asarray([float(loss)]),
                             np.asarray([gold_loss])),
            "grads": _tree_diff(grads, gold_grads)}


def check_tacotron2_grads():
    """Training-numerics parity: d Tacotron2Loss (mel MSE + postnet MSE
    + stop BCE + guided attention) / d params vs the fp64 torch oracle,
    with train-mode BatchNorm — pins the LSTM-cell backward, the
    location-sensitive-attention backward, and the stop/guided terms."""
    from parakeet_tpu.models.tacotron2 import Tacotron2, tacotron2_loss
    from parakeet_tpu.utils.convert import convert_tacotron2
    from tools.golden.fixtures import tacotron2_state
    from tools.golden.tacotron2 import golden_tacotron2_loss_and_grads

    state, cfg = tacotron2_state()
    params, batch_stats = convert_tacotron2(
        state, encoder_conv_layers=cfg["encoder_conv_layers"],
        postnet_conv_layers=cfg["postnet_conv_layers"],
        use_stop_token=True)
    model = Tacotron2(
        vocab_size=cfg["vocab"], d_mels=cfg["d_mels"],
        d_encoder=cfg["d_enc"],
        encoder_conv_layers=cfg["encoder_conv_layers"],
        encoder_kernel_size=3, d_prenet=cfg["d_prenet"],
        d_attention_rnn=cfg["d_att_rnn"], d_decoder_rnn=cfg["d_dec_rnn"],
        attention_filters=cfg["filters"],
        attention_kernel_size=cfg["k_att"], d_attention=cfg["d_att"],
        d_postnet=8, postnet_kernel_size=3,
        postnet_conv_layers=cfg["postnet_conv_layers"],
        reduction_factor=1, use_stop_token=True, p_prenet_dropout=0.0,
        p_encoder_dropout=0.0, p_attention_dropout=0.0,
        p_decoder_dropout=0.0, p_postnet_dropout=0.0)
    rng = np.random.default_rng(5)
    B, T_text, T_mel = 2, 5, 8
    text = rng.integers(1, cfg["vocab"], (B, T_text))
    mels = rng.standard_normal((B, T_mel, cfg["d_mels"])).astype(
        np.float32)
    ilens = np.full((B,), T_text)
    olens = np.full((B,), T_mel)

    def loss_fn(p):
        outputs, _ = model.apply(
            {"params": p,
             "batch_stats": jax.tree_util.tree_map(jnp.asarray,
                                                   batch_stats)},
            jnp.asarray(text), jnp.asarray(ilens), jnp.asarray(mels),
            jnp.asarray(olens), deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(0)},
            mutable=["batch_stats"])
        return tacotron2_loss(
            outputs, jnp.asarray(mels), jnp.asarray(olens),
            jnp.asarray(ilens), use_stop_token_loss=True,
            use_guided_attention_loss=True)["loss"]

    loss, grads = jax.value_and_grad(loss_fn)(
        jax.tree_util.tree_map(jnp.asarray, params))

    gold_loss, gold_paddle = golden_tacotron2_loss_and_grads(
        state, text, mels)
    gold_grads, _ = convert_tacotron2(
        gold_paddle, encoder_conv_layers=cfg["encoder_conv_layers"],
        postnet_conv_layers=cfg["postnet_conv_layers"],
        use_stop_token=True)
    return {"loss": _metrics(np.asarray([float(loss)]),
                             np.asarray([gold_loss])),
            "grads": _tree_diff(grads, gold_grads)}


def check_transformer_tts_grads():
    """Training-numerics parity: d TransformerTTSLoss (masked L1 +
    pos-weighted stop BCE) / d params vs the fp64 torch oracle with
    train-mode postnet BN.  Equal speech lengths keep the train-mode BN
    statistics padding-free; the encoder masking is still exercised by
    unequal text lengths."""
    from parakeet_tpu.models.transformer_tts import (TransformerTTS,
                                                     transformer_tts_loss)
    from parakeet_tpu.utils.convert import convert_transformer_tts
    from tools.golden.fixtures import transformer_tts_state
    from tools.golden.transformer_tts import (
        golden_transformer_tts_loss_and_grads)

    state, cfg = transformer_tts_state()
    params, batch_stats = convert_transformer_tts(
        state, elayers=1, dlayers=1, aheads=cfg["heads"],
        dprenet_layers=2, postnet_layers=2)
    model = TransformerTTS(
        idim=cfg["idim"], odim=cfg["odim"], adim=cfg["adim"],
        aheads=cfg["heads"], elayers=1, eunits=cfg["units"], dlayers=1,
        dunits=cfg["units"], eprenet_conv_layers=0,
        dprenet_units=cfg["dp_units"], postnet_layers=2, postnet_chans=8,
        postnet_filts=3, reduction_factor=1,
        transformer_enc_dropout_rate=0.0,
        transformer_enc_positional_dropout_rate=0.0,
        transformer_enc_attn_dropout_rate=0.0,
        transformer_dec_dropout_rate=0.0,
        transformer_dec_positional_dropout_rate=0.0,
        transformer_dec_attn_dropout_rate=0.0,
        transformer_enc_dec_attn_dropout_rate=0.0,
        dprenet_dropout_rate=0.0, postnet_dropout_rate=0.0)
    rng = np.random.default_rng(6)
    B = 2
    text = rng.integers(1, cfg["idim"] - 1, (B, 6))
    text[1, 4:] = 0
    tl = np.array([6, 4])
    mels = rng.standard_normal((B, 8, cfg["odim"])).astype(np.float32)
    ol = np.array([8, 8])

    def loss_fn(p):
        outputs, _ = model.apply(
            {"params": p,
             "batch_stats": jax.tree_util.tree_map(jnp.asarray,
                                                   batch_stats)},
            jnp.asarray(text), jnp.asarray(tl), jnp.asarray(mels),
            jnp.asarray(ol), deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(0)},
            mutable=["batch_stats"])
        return transformer_tts_loss(outputs, jnp.asarray(mels),
                                    jnp.asarray(ol))["loss"]

    loss, grads = jax.value_and_grad(loss_fn)(
        jax.tree_util.tree_map(jnp.asarray, params))

    gold_loss, gold_paddle = golden_transformer_tts_loss_and_grads(
        state, text, tl, mels, ol, odim=cfg["odim"], eos=cfg["idim"] - 1,
        heads=cfg["heads"])
    gold_grads, _ = convert_transformer_tts(
        gold_paddle, elayers=1, dlayers=1, aheads=cfg["heads"],
        dprenet_layers=2, postnet_layers=2)
    return {"loss": _metrics(np.asarray([float(loss)]),
                             np.asarray([gold_loss])),
            "grads": _tree_diff(grads, gold_grads)}


def check_speedyspeech_grads():
    """Training-numerics parity: d SpeedySpeech loss (L1 + (1 - SSIM) +
    huber log-duration with the stop-gradient'd duration head) /
    d params vs the fp64 torch oracle with train-mode NLC BatchNorm.
    Equal total durations keep the BN statistics padding-free."""
    from parakeet_tpu.models.speedyspeech import (SpeedySpeech,
                                                  speedyspeech_loss)
    from parakeet_tpu.utils.convert import convert_speedyspeech
    from tools.golden.fixtures import speedyspeech_state
    from tools.golden.speedyspeech import golden_speedyspeech_loss_and_grads

    state, cfg = speedyspeech_state()
    params, batch_stats = convert_speedyspeech(
        state, encoder_dilations=cfg["enc_dil"],
        decoder_dilations=cfg["dec_dil"])
    model = SpeedySpeech(
        vocab_size=cfg["vocab"], encoder_hidden_size=cfg["hidden"],
        encoder_dilations=cfg["enc_dil"],
        duration_predictor_hidden_size=cfg["hidden"],
        decoder_hidden_size=cfg["hidden"],
        decoder_output_size=cfg["odim"],
        decoder_dilations=cfg["dec_dil"], tone_size=cfg["tones"])
    rng = np.random.default_rng(7)
    B, T = 2, 7
    text = rng.integers(1, cfg["vocab"], (B, T))
    tone_ids = rng.integers(1, cfg["tones"], (B, T))
    durs = rng.integers(1, 3, (B, T))
    durs[:, -1] += durs.sum(1).max() - durs.sum(1)  # equal totals
    tot = int(durs.sum(1).max())
    feats = rng.standard_normal((B, tot, cfg["odim"])).astype(np.float32)
    batch = {"feats": jnp.asarray(feats),
             "num_frames": jnp.full((B,), tot),
             "num_phones": jnp.full((B,), T),
             "durations": jnp.asarray(durs)}

    def loss_fn(p):
        out, _ = model.apply(
            {"params": p,
             "batch_stats": jax.tree_util.tree_map(jnp.asarray,
                                                   batch_stats)},
            jnp.asarray(text), jnp.asarray(durs), jnp.asarray(tone_ids),
            max_frames=tot, deterministic=False,
            mutable=["batch_stats"])
        return speedyspeech_loss(out, batch)["loss"]

    loss, grads = jax.value_and_grad(loss_fn)(
        jax.tree_util.tree_map(jnp.asarray, params))

    gold_loss, gold_paddle = golden_speedyspeech_loss_and_grads(
        state, text, tone_ids, durs, feats,
        encoder_dilations=cfg["enc_dil"],
        decoder_dilations=cfg["dec_dil"])
    gold_grads, _ = convert_speedyspeech(
        gold_paddle, encoder_dilations=cfg["enc_dil"],
        decoder_dilations=cfg["dec_dil"])
    return {"loss": _metrics(np.asarray([float(loss)]),
                             np.asarray([gold_loss])),
            "grads": _tree_diff(grads, gold_grads)}


CHECKS = {
    "fastspeech2": check_fastspeech2,
    "fastspeech2_grads": check_fastspeech2_grads,
    "parallel_wavegan": check_pwg,
    "pwg_gan_grads": check_pwg_gan_grads,
    "tacotron2": check_tacotron2,
    "tacotron2_grads": check_tacotron2_grads,
    "transformer_tts": check_transformer_tts,
    "transformer_tts_grads": check_transformer_tts_grads,
    "speedyspeech": check_speedyspeech,
    "speedyspeech_grads": check_speedyspeech_grads,
    "waveflow": check_waveflow,
    "waveflow_grads": check_waveflow_grads,
    "ge2e": check_ge2e,
    "ge2e_grads": check_ge2e_grads,
}


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--write", type=Path, default=None,
                        help="markdown file to append the table to")
    args = parser.parse_args()
    jax.config.update("jax_platforms", "cpu")

    rows = []
    for family, fn in CHECKS.items():
        for output, (maxdiff, mse) in fn().items():
            rows.append((family, output, maxdiff, mse))
            print(f"{family:18s} {output:22s} max|d| {maxdiff:9.3e} "
                  f"mse {mse:9.3e}")
    if args.write:
        marker = "<!-- run_parity.py results -->"
        lines = [marker, "", "| family | output | max abs diff | MSE |",
                 "|---|---|---|---|"]
        for family, output, maxdiff, mse in rows:
            lines.append(f"| {family} | {output} | {maxdiff:.3e} "
                         f"| {mse:.3e} |")
        # append to the file (replacing only a previously-appended
        # results block), never clobber hand-written content
        prev = args.write.read_text() if args.write.exists() else ""
        if marker in prev:
            prev = prev[:prev.index(marker)].rstrip() + "\n"
        elif prev and not prev.endswith("\n"):
            prev += "\n"
        args.write.write_text(prev + "\n".join(lines) + "\n")
    return rows


if __name__ == "__main__":
    main()
