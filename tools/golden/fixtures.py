"""Paddle-layout state-dict builders shared by the golden-parity tests
and the PARITY.md generator.

Each builder returns (state_dict, config) where ``state_dict`` uses the
reference's parameter names and tensor layouts with realistic scaled
random values (embedding padding rows zeroed, as real paddle checkpoints
keep them), and ``config`` carries the model hyperparameters both sides
need.
"""
from __future__ import annotations

import numpy as np


class _B:
    """Small helper collecting paddle-layout arrays."""

    def __init__(self, rng):
        self.rng = rng
        self.state = {}

    def dense(self, prefix, i, o, bias=True):
        self.state[f"{prefix}.weight"] = (
            self.rng.standard_normal((i, o)) / np.sqrt(i)).astype(np.float32)
        if bias:
            self.state[f"{prefix}.bias"] = (
                0.1 * self.rng.standard_normal((o,))).astype(np.float32)

    def conv(self, prefix, o, i, k, bias=True):
        self.state[f"{prefix}.weight"] = (
            self.rng.standard_normal((o, i, k))
            / np.sqrt(i * k)).astype(np.float32)
        if bias:
            self.state[f"{prefix}.bias"] = (
                0.1 * self.rng.standard_normal((o,))).astype(np.float32)

    def ln(self, prefix, d):
        self.state[f"{prefix}.weight"] = (
            1 + 0.1 * self.rng.standard_normal((d,))).astype(np.float32)
        self.state[f"{prefix}.bias"] = (
            0.1 * self.rng.standard_normal((d,))).astype(np.float32)

    def bn(self, prefix, d):
        self.ln(prefix, d)
        self.state[f"{prefix}._mean"] = (
            0.1 * self.rng.standard_normal((d,))).astype(np.float32)
        self.state[f"{prefix}._variance"] = (
            1 + 0.1 * self.rng.random((d,))).astype(np.float32)

    def wn_conv(self, prefix, shape, bias=True):
        fan_in = int(np.prod(shape[1:]))
        self.state[f"{prefix}.weight_v"] = (
            self.rng.standard_normal(shape)
            / np.sqrt(fan_in)).astype(np.float32)
        self.state[f"{prefix}.weight_g"] = (
            1 + 0.1 * self.rng.standard_normal(
                (shape[0],) + (1,) * (len(shape) - 1))).astype(np.float32)
        if bias:
            self.state[f"{prefix}.bias"] = (
                0.1 * self.rng.standard_normal((shape[0],))).astype(
                    np.float32)

    def lstm(self, prefix, cin, h, suffix=""):
        self.state[f"{prefix}.weight_ih{suffix}"] = (
            self.rng.standard_normal((4 * h, cin))
            / np.sqrt(cin)).astype(np.float32)
        self.state[f"{prefix}.weight_hh{suffix}"] = (
            self.rng.standard_normal((4 * h, h))
            / np.sqrt(h)).astype(np.float32)
        for nm in ("bias_ih", "bias_hh"):
            self.state[f"{prefix}.{nm}{suffix}"] = (
                0.1 * self.rng.standard_normal((4 * h,))).astype(np.float32)

    def embed(self, prefix, n, d, zero_row0=True):
        e = self.rng.standard_normal((n, d)).astype(np.float32)
        if zero_row0:
            e[0] = 0.0
        self.state[f"{prefix}.weight"] = e


def pwg_state(seed=42):
    cfg = dict(layers=4, stacks=2, residual_channels=8, gate_channels=16,
               skip_channels=8, aux_channels=12, aux_context_window=2,
               upsample_scales=(2, 3))
    b = _B(np.random.default_rng(seed))
    cr, cg, cs, ca = (cfg["residual_channels"], cfg["gate_channels"],
                      cfg["skip_channels"], cfg["aux_channels"])
    b.wn_conv("first_conv", (cr, 1, 1))
    b.wn_conv("upsample_net.conv_in", (ca, ca, 5), bias=False)
    for i, s in enumerate(cfg["upsample_scales"]):
        b.wn_conv(f"upsample_net.upsample.up_layers.{i * 2 + 1}",
                  (1, 1, 1, 2 * s + 1), bias=False)
        # paddle stores 2D up-layer g as (1,) not (1,1,1,1)
        b.state[f"upsample_net.upsample.up_layers.{i * 2 + 1}.weight_g"] = \
            b.state[
                f"upsample_net.upsample.up_layers.{i * 2 + 1}.weight_g"
            ].reshape(1)
    for i in range(cfg["layers"]):
        b.wn_conv(f"conv_layers.{i}.conv", (cg, cr, 3))
        b.wn_conv(f"conv_layers.{i}.conv1x1_aux", (cg, ca, 1), bias=False)
        b.wn_conv(f"conv_layers.{i}.conv1x1_skip", (cs, cg // 2, 1))
        b.wn_conv(f"conv_layers.{i}.conv1x1_out", (cr, cg // 2, 1))
    b.wn_conv("last_conv_layers.1", (cs, cs, 1))
    b.wn_conv("last_conv_layers.3", (1, cs, 1))
    return b.state, cfg


def fastspeech2_state(seed=7):
    cfg = dict(adim=16, heads=2, odim=10, vocab=30, eunits=32,
               elayers=1, dlayers=1, predictor_layers=2, postnet_layers=2)
    b = _B(np.random.default_rng(seed))
    adim, eunits, odim, vocab = (cfg["adim"], cfg["eunits"], cfg["odim"],
                                 cfg["vocab"])

    def stack(prefix, alpha_idx):
        b.state[f"{prefix}.embed.{alpha_idx}.alpha"] = np.ones(
            (1,), np.float32)
        if alpha_idx == 1:
            b.embed(f"{prefix}.embed.0", vocab, adim)
        lp = f"{prefix}.encoders.0"
        for nm in ("q", "k", "v", "out"):
            b.dense(f"{lp}.self_attn.linear_{nm}", adim, adim)
        b.ln(f"{lp}.norm1", adim)
        b.ln(f"{lp}.norm2", adim)
        b.conv(f"{lp}.feed_forward.w_1", eunits, adim, 1)
        b.conv(f"{lp}.feed_forward.w_2", adim, eunits, 1)
        b.ln(f"{prefix}.after_norm", adim)

    stack("encoder", 1)
    stack("decoder", 0)
    for pred in ("duration_predictor", "pitch_predictor",
                 "energy_predictor"):
        for i in range(2):
            b.conv(f"{pred}.conv.{i}.0", adim, adim, 3)
            b.ln(f"{pred}.conv.{i}.2", adim)
        b.dense(f"{pred}.linear", adim, 1)
    b.conv("pitch_embed.0", adim, 1, 9)
    b.conv("energy_embed.0", adim, 1, 9)
    b.dense("feat_out", adim, odim)
    for i, (ich, och) in enumerate(((odim, 8), (8, odim))):
        b.conv(f"postnet.postnet.{i}.0", och, ich, 5, bias=False)
        b.bn(f"postnet.postnet.{i}.1", och)
    return b.state, cfg


def tacotron2_state(seed=11):
    cfg = dict(vocab=10, d_mels=6, d_enc=8, d_att_rnn=8, d_dec_rnn=8,
               d_att=8, d_prenet=8, filters=4, k_att=5,
               encoder_conv_layers=2, postnet_conv_layers=2)
    b = _B(np.random.default_rng(seed))
    c = cfg
    b.embed("embedding", c["vocab"], c["d_enc"], zero_row0=False)

    def conv_bn(prefix, o, i, k):
        b.conv(f"{prefix}.conv", o, i, k)
        b.bn(f"{prefix}.bn", o)

    for i in range(c["encoder_conv_layers"]):
        conv_bn(f"encoder.conv_batchnorms.{i}", c["d_enc"], c["d_enc"], 3)
    b.lstm("encoder.lstm", c["d_enc"], c["d_enc"] // 2, "_l0")
    b.lstm("encoder.lstm", c["d_enc"], c["d_enc"] // 2, "_l0_reverse")
    b.dense("decoder.prenet.linear1", c["d_mels"], c["d_prenet"],
            bias=False)
    b.dense("decoder.prenet.linear2", c["d_prenet"], c["d_prenet"],
            bias=False)
    b.lstm("decoder.attention_rnn", c["d_prenet"] + c["d_enc"],
           c["d_att_rnn"])
    b.lstm("decoder.decoder_rnn", c["d_att_rnn"] + c["d_enc"],
           c["d_dec_rnn"])
    b.dense("decoder.attention_layer.query_layer", c["d_att_rnn"],
            c["d_att"], bias=False)
    b.dense("decoder.attention_layer.key_layer", c["d_enc"], c["d_att"],
            bias=False)
    b.dense("decoder.attention_layer.value", c["d_att"], 1, bias=False)
    b.dense("decoder.attention_layer.location_layer", c["filters"],
            c["d_att"], bias=False)
    b.state["decoder.attention_layer.location_conv.weight"] = (
        b.rng.standard_normal((c["filters"], 2, c["k_att"]))
        / np.sqrt(2 * c["k_att"])).astype(np.float32)
    b.dense("decoder.linear_projection", c["d_dec_rnn"] + c["d_enc"],
            c["d_mels"])
    b.dense("decoder.stop_layer", c["d_dec_rnn"] + c["d_enc"], 1)
    for i, (ic, oc) in enumerate(((c["d_mels"], 8), (8, c["d_mels"]))):
        conv_bn(f"postnet.conv_batchnorms.{i}", oc, ic, 3)
    return b.state, cfg


def speedyspeech_state(seed=17):
    cfg = dict(vocab=12, tones=5, hidden=8, odim=6,
               enc_dil=(1, 3), dec_dil=(1, 3, 1))
    b = _B(np.random.default_rng(seed))
    hidden, odim = cfg["hidden"], cfg["odim"]

    def res_block(prefix, k, n):
        for j in range(n):
            b.conv(f"{prefix}.blocks.{j}.0", hidden, hidden, k)
            b.bn(f"{prefix}.blocks.{j}.2", hidden)

    b.embed("encoder.embedding.text_embedding", cfg["vocab"], hidden)
    b.embed("encoder.embedding.tone_embedding", cfg["tones"], hidden)
    b.dense("encoder.prenet.0", hidden, hidden)
    for i in range(len(cfg["enc_dil"])):
        res_block(f"encoder.res_blocks.{i}", 3, 2)
    b.dense("encoder.postnet1.0", hidden, hidden)
    b.bn("encoder.postnet2.1", hidden)
    b.dense("encoder.postnet2.2", hidden, hidden)
    for i, k in enumerate((4, 3, 1)):
        res_block(f"duration_predictor.layers.{i}", k, 1)
    b.dense("duration_predictor.layers.3", hidden, 1)
    for i in range(len(cfg["dec_dil"])):
        res_block(f"decoder.res_blocks.{i}", 3, 2)
    b.dense("decoder.postnet1.0", hidden, hidden)
    res_block("decoder.postnet2.0", 3, 2)
    b.dense("decoder.postnet2.1", hidden, odim)
    return b.state, cfg


def waveflow_state(seed=13):
    cfg = dict(n_flows=2, n_layers=2, n_group=4, channels=6, n_mels=5,
               factors=(2, 2))
    b = _B(np.random.default_rng(seed))
    ch, nm = cfg["channels"], cfg["n_mels"]
    for i, f in enumerate(cfg["factors"]):
        b.wn_conv(f"encoder.{i}", (1, 1, 3, 2 * f))
        b.state[f"encoder.{i}.weight_g"] = \
            b.state[f"encoder.{i}.weight_g"].reshape(1)
    for fl in range(cfg["n_flows"]):
        b.wn_conv(f"decoder.{fl}.input_proj", (ch, 1, 1, 1))
        for la in range(cfg["n_layers"]):
            lp = f"decoder.{fl}.resnet.{la}"
            b.wn_conv(f"{lp}.conv", (2 * ch, ch, 3, 3))
            b.wn_conv(f"{lp}.condition_proj", (2 * ch, nm, 1, 1))
            b.wn_conv(f"{lp}.out_proj", (2 * ch, ch, 1, 1))
        b.state[f"decoder.{fl}.output_proj.weight"] = (
            0.1 * b.rng.standard_normal((2, ch, 1, 1))).astype(np.float32)
        b.state[f"decoder.{fl}.output_proj.bias"] = (
            0.1 * b.rng.standard_normal((2,))).astype(np.float32)
    return b.state, cfg


def transformer_tts_state(seed=23):
    cfg = dict(idim=12, odim=6, adim=16, heads=2, units=32, dp_units=8,
               elayers=1, dlayers=1, dprenet_layers=2, postnet_layers=2)
    b = _B(np.random.default_rng(seed))
    idim, odim, adim, units, dp_units = (cfg["idim"], cfg["odim"],
                                         cfg["adim"], cfg["units"],
                                         cfg["dp_units"])

    def mha(prefix):
        for nm in ("q", "k", "v", "out"):
            b.dense(f"{prefix}.linear_{nm}", adim, adim)

    b.embed("encoder.embed.0", idim, adim)
    b.state["encoder.embed.1.alpha"] = np.ones((1,), np.float32)
    mha("encoder.encoders.0.self_attn")
    b.ln("encoder.encoders.0.norm1", adim)
    b.ln("encoder.encoders.0.norm2", adim)
    b.conv("encoder.encoders.0.feed_forward.w_1", units, adim, 1)
    b.conv("encoder.encoders.0.feed_forward.w_2", adim, units, 1)
    b.ln("encoder.after_norm", adim)
    b.state["decoder.embed.1.alpha"] = np.ones((1,), np.float32)
    b.dense("decoder.embed.0.0.prenet.0.0", odim, dp_units)
    b.dense("decoder.embed.0.0.prenet.1.0", dp_units, dp_units)
    b.dense("decoder.embed.0.1", dp_units, adim)
    mha("decoder.decoders.0.self_attn")
    mha("decoder.decoders.0.src_attn")
    for n in ("norm1", "norm2", "norm3"):
        b.ln(f"decoder.decoders.0.{n}", adim)
    b.dense("decoder.decoders.0.feed_forward.w_1", adim, units)
    b.dense("decoder.decoders.0.feed_forward.w_2", units, adim)
    b.ln("decoder.after_norm", adim)
    b.dense("feat_out", adim, odim)
    b.dense("prob_out", adim, 1)
    for i, (ic, oc) in enumerate(((odim, 8), (8, odim))):
        b.conv(f"postnet.postnet.{i}.0", oc, ic, 3, bias=False)
        b.bn(f"postnet.postnet.{i}.1", oc)
    return b.state, cfg


def ge2e_state(seed=29):
    """Paddle-layout LSTMSpeakerEncoder state dict (reference:
    parakeet/models/lstm_speaker_encoder.py:24-33: nn.LSTM num_layers
    deep, weight_ih_l{k} (4H, in) / weight_hh_l{k} (4H, H) /
    bias_ih+bias_hh, gate order i,f,c,o; Linear (in, out);
    similarity_weight/bias scalars)."""
    cfg = dict(n_mels=8, num_layers=3, hidden_size=12, output_size=10)
    rng = np.random.default_rng(seed)
    state = {}
    h = cfg["hidden_size"]
    for la in range(cfg["num_layers"]):
        cin = cfg["n_mels"] if la == 0 else h
        state[f"lstm.weight_ih_l{la}"] = (
            rng.standard_normal((4 * h, cin)) / np.sqrt(cin)
        ).astype(np.float32)
        state[f"lstm.weight_hh_l{la}"] = (
            rng.standard_normal((4 * h, h)) / np.sqrt(h)
        ).astype(np.float32)
        state[f"lstm.bias_ih_l{la}"] = (
            0.1 * rng.standard_normal((4 * h,))).astype(np.float32)
        state[f"lstm.bias_hh_l{la}"] = (
            0.1 * rng.standard_normal((4 * h,))).astype(np.float32)
    state["linear.weight"] = (
        rng.standard_normal((h, cfg["output_size"])) / np.sqrt(h)
    ).astype(np.float32)
    state["linear.bias"] = (
        0.1 * rng.standard_normal((cfg["output_size"],))
    ).astype(np.float32)
    state["similarity_weight"] = np.full((1,), 10.0, np.float32)
    state["similarity_bias"] = np.full((1,), -5.0, np.float32)
    return state, cfg


def pwg_disc_state(seed=31):
    """Paddle-layout PWGDiscriminator state dict (reference:
    parallel_wavegan.py:554-598 — Sequential of [weight-normed conv,
    LeakyReLU] pairs + final conv, so convs sit at even indices)."""
    cfg = dict(layers=4, conv_channels=8, kernel_size=3)
    b = _B(np.random.default_rng(seed))
    cin = 1
    for i in range(cfg["layers"] - 1):
        b.wn_conv(f"conv_layers.{2 * i}",
                  (cfg["conv_channels"], cin, cfg["kernel_size"]))
        cin = cfg["conv_channels"]
    b.wn_conv(f"conv_layers.{2 * (cfg['layers'] - 1)}",
              (1, cin, cfg["kernel_size"]))
    return b.state, cfg
