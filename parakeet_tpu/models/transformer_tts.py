"""TransformerTTS (autoregressive transformer text -> mel), TPU-native.

Behavioral equivalent of the reference implementation (reference:
parakeet/models/transformer_tts/transformer_tts.py:172-1082): encoder
prenet (embedding + convs) -> transformer encoder; optional GST style
embedding and speaker-embedding integration; decoder prenet -> transformer
decoder with causal masking and reduction-factor thinning -> feat/stop
projections -> Postnet residual.

TPU-first design (not a port):
- inference is ONE ``lax.scan`` over decode steps with fixed-size
  preallocated KV caches written via ``dynamic_update_slice`` (see
  nn/transformer.py MultiHeadAttention) — static shapes, entire AR loop is
  a single XLA while-program.  The reference runs a python while-loop with
  growing cache lists (transformer_tts.py:600-660,
  fastspeech2_transformer/decoder.py:197-251).
- stop condition (sigmoid(prob) >= threshold after min length, reference
  transformer_tts.py:640-655) is a masked ``finished`` flag, not a python
  ``break``.
- teacher-forced training runs the full causal decoder in parallel (one
  batched attention) — exactly where the MXU wants to be.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.postnet import Postnet, Prenet
from ..ops.buffers import carry_buffer
from ..nn.style_encoder import StyleEncoder
from ..nn.transformer import TransformerEncoder, TransformerDecoder
from ..ops.losses import (attention_guide, stop_token_bce, weighted_mean)
from ..ops.masking import future_mask, sequence_mask

__all__ = ["TransformerTTS", "transformer_tts_loss",
           "guided_multihead_attention_loss"]


class EncoderPrenet(nn.Module):
    """Embedding -> conv stack -> projection (reference
    transformer_tts.py:239-303 'encoder_input_layer')."""
    vocab_size: int
    embed_dim: int = 512
    conv_layers: int = 3
    conv_chans: int = 256
    conv_filts: int = 5
    d_model: int = 512
    dropout_rate: float = 0.5
    use_batch_norm: bool = True
    padding_idx: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, text, *, deterministic: bool = True):
        emb = nn.Embed(self.vocab_size, self.embed_dim, dtype=self.dtype,
                       name="embed")(text)
        emb = emb * (text != self.padding_idx)[..., None].astype(emb.dtype)
        h = emb
        for i in range(self.conv_layers):
            h = nn.Conv(self.conv_chans, (self.conv_filts,), padding="SAME",
                        use_bias=not self.use_batch_norm, dtype=self.dtype,
                        name=f"conv_{i}")(h)
            if self.use_batch_norm:
                h = nn.BatchNorm(use_running_average=deterministic,
                                 dtype=self.dtype, name=f"bn_{i}")(h)
            h = nn.relu(h)
            h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        return nn.Dense(self.d_model, dtype=self.dtype, name="proj")(h)


class TransformerTTS(nn.Module):
    """Hyperparameter names follow the reference constructor
    (transformer_tts.py:172-238) so YAML configs carry over."""
    idim: int
    odim: int
    embed_dim: int = 512
    eprenet_conv_layers: int = 3
    eprenet_conv_chans: int = 256
    eprenet_conv_filts: int = 5
    dprenet_layers: int = 2
    dprenet_units: int = 256
    elayers: int = 6
    eunits: int = 1024
    adim: int = 512
    aheads: int = 4
    dlayers: int = 6
    dunits: int = 1024
    postnet_layers: int = 5
    postnet_chans: int = 256
    postnet_filts: int = 5
    positionwise_layer_type: str = "conv1d"
    positionwise_conv_kernel_size: int = 1
    use_scaled_pos_enc: bool = True
    use_batch_norm: bool = True
    encoder_normalize_before: bool = True
    decoder_normalize_before: bool = True
    encoder_concat_after: bool = False
    decoder_concat_after: bool = False
    reduction_factor: int = 1
    spk_embed_dim: Optional[int] = None
    spk_embed_integration_type: str = "add"
    use_gst: bool = False
    gst_tokens: int = 10
    gst_heads: int = 4
    gst_conv_layers: int = 6
    gst_conv_chans_list: tuple = (32, 32, 64, 64, 128, 128)
    gst_conv_kernel_size: int = 3
    gst_conv_stride: int = 2
    gst_gru_layers: int = 1
    gst_gru_units: int = 128
    transformer_enc_dropout_rate: float = 0.1
    transformer_enc_positional_dropout_rate: float = 0.1
    transformer_enc_attn_dropout_rate: float = 0.1
    transformer_dec_dropout_rate: float = 0.1
    transformer_dec_positional_dropout_rate: float = 0.1
    transformer_dec_attn_dropout_rate: float = 0.1
    transformer_enc_dec_attn_dropout_rate: float = 0.1
    init_enc_alpha: float = 1.0
    init_dec_alpha: float = 1.0
    eprenet_dropout_rate: float = 0.5
    dprenet_dropout_rate: float = 0.5
    postnet_dropout_rate: float = 0.5
    padding_idx: int = 0
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        if self.eprenet_conv_layers:
            self.encoder_prenet = EncoderPrenet(
                self.idim, self.embed_dim, self.eprenet_conv_layers,
                self.eprenet_conv_chans, self.eprenet_conv_filts, self.adim,
                self.eprenet_dropout_rate, self.use_batch_norm,
                self.padding_idx, dtype=self.dtype)
            enc_input = None
        else:
            self.encoder_prenet = None
            enc_input = "embed"
        self.encoder = TransformerEncoder(
            self.adim, self.aheads, self.eunits, self.elayers,
            input_layer=enc_input, vocab_size=self.idim,
            dropout_rate=self.transformer_enc_dropout_rate,
            positional_dropout_rate=(
                self.transformer_enc_positional_dropout_rate),
            attn_dropout_rate=self.transformer_enc_attn_dropout_rate,
            use_scaled_pos_enc=self.use_scaled_pos_enc,
            init_alpha=self.init_enc_alpha,
            normalize_before=self.encoder_normalize_before,
            concat_after=self.encoder_concat_after,
            positionwise_layer_type=self.positionwise_layer_type,
            positionwise_conv_kernel_size=(
                self.positionwise_conv_kernel_size),
            padding_idx=self.padding_idx, dtype=self.dtype)
        if self.use_gst:
            self.gst = StyleEncoder(
                self.gst_tokens, self.adim, self.gst_heads,
                self.gst_conv_layers, self.gst_conv_chans_list,
                self.gst_conv_kernel_size, self.gst_conv_stride,
                self.gst_gru_layers, self.gst_gru_units, dtype=self.dtype)
        if self.spk_embed_dim is not None:
            self.spk_projection = nn.Dense(self.adim, dtype=self.dtype)
        self.decoder_prenet = Prenet(
            self.dprenet_layers, self.dprenet_units,
            self.dprenet_dropout_rate, always_dropout=True, dtype=self.dtype)
        # the projection after the prenet carries a bias in the
        # reference (transformer_tts.py:151-157: nn.Linear default)
        self.decoder_prenet_proj = nn.Dense(self.adim, dtype=self.dtype)
        self.decoder = TransformerDecoder(
            self.adim, self.aheads, self.dunits, self.dlayers,
            dropout_rate=self.transformer_dec_dropout_rate,
            positional_dropout_rate=(
                self.transformer_dec_positional_dropout_rate),
            attn_dropout_rate=self.transformer_dec_attn_dropout_rate,
            src_attn_dropout_rate=(
                self.transformer_enc_dec_attn_dropout_rate),
            use_scaled_pos_enc=self.use_scaled_pos_enc,
            init_alpha=self.init_dec_alpha,
            normalize_before=self.decoder_normalize_before,
            concat_after=self.decoder_concat_after,
            input_layer=None, dtype=self.dtype)
        self.feat_out = nn.Dense(self.odim * self.reduction_factor,
                                 dtype=self.dtype)
        self.prob_out = nn.Dense(self.reduction_factor, dtype=self.dtype)
        self.postnet = Postnet(self.odim, self.postnet_layers,
                               self.postnet_chans, self.postnet_filts,
                               self.postnet_dropout_rate,
                               self.use_batch_norm, dtype=self.dtype)

    # ---- shared pieces -------------------------------------------------
    def encode(self, text, text_lengths, speech=None, spk_emb=None,
               *, deterministic: bool = True):
        # append <eos> = idim-1 at each sequence end (reference
        # transformer_tts.py:420-424 forward, 554-556 inference): one
        # static extra column, eos scattered at position text_lengths
        b = text.shape[0]
        text = jnp.pad(text, ((0, 0), (0, 1)))
        text = text.at[jnp.arange(b), text_lengths].set(self.idim - 1)
        text_lengths = text_lengths + 1
        mask = sequence_mask(text_lengths, text.shape[1])   # (B, T_enc)
        attn_mask = mask[:, None, None, :]                   # (B,1,1,T)
        if self.encoder_prenet is not None:
            x = self.encoder_prenet(text, deterministic=deterministic)
        else:
            x = text
        hs, enc_attns = self.encoder(x, attn_mask,
                                     deterministic=deterministic)
        if self.use_gst:
            if speech is None:
                style = jnp.zeros((hs.shape[0], self.adim), hs.dtype)
            else:
                style = self.gst(speech)
            hs = hs + style[:, None, :]
        if self.spk_embed_dim is not None and spk_emb is not None:
            if self.spk_embed_integration_type == "add":
                norm = spk_emb / jnp.maximum(
                    jnp.linalg.norm(spk_emb, axis=-1, keepdims=True), 1e-12)
                hs = hs + self.spk_projection(norm)[:, None, :]
            else:  # concat
                g = jnp.broadcast_to(
                    spk_emb[:, None, :],
                    (hs.shape[0], hs.shape[1], spk_emb.shape[-1]))
                hs = self.spk_projection(
                    jnp.concatenate([hs, g.astype(hs.dtype)], axis=-1))
        return hs, mask, enc_attns

    def _decoder_input(self, frames, *, deterministic: bool):
        h = self.decoder_prenet(frames, deterministic=deterministic)
        return self.decoder_prenet_proj(h)

    # ---- training forward ----------------------------------------------
    def __call__(self, text, text_lengths, speech, speech_lengths,
                 spk_emb=None, *, deterministic: bool = True):
        """Teacher-forced forward.  Returns dict with before/after outs,
        stop logits, and attention stacks for guided-attention losses."""
        hs, enc_mask, enc_attns = self.encode(
            text, text_lengths, speech, spk_emb,
            deterministic=deterministic)
        b = text.shape[0]
        r = self.reduction_factor
        t_dec = speech.shape[1]
        n_steps = t_dec // r
        # thin to the last frame of each reduction group, shift right
        ys_in = speech[:, r - 1::r, :]
        ys_in = jnp.concatenate(
            [jnp.zeros_like(ys_in[:, :1]), ys_in[:, :-1]], axis=1)
        d_in = self._decoder_input(ys_in, deterministic=deterministic)

        olens_steps = speech_lengths // r
        dec_mask = sequence_mask(olens_steps, n_steps)       # (B, n_steps)
        causal = future_mask(n_steps)                        # (T, T)
        self_mask = (dec_mask[:, None, None, :] & causal[None, None])
        cross_mask = enc_mask[:, None, None, :]
        zs, self_attns, cross_attns = self.decoder(
            d_in, hs, self_mask, cross_mask, deterministic=deterministic)
        before_outs = self.feat_out(zs).reshape(b, n_steps * r, self.odim)
        logits = self.prob_out(zs).reshape(b, n_steps * r)
        after_outs = before_outs + self.postnet(
            before_outs, deterministic=deterministic)
        return {
            "before_outs": before_outs,
            "after_outs": after_outs,
            "stop_logits": logits,
            "enc_attns": enc_attns,          # (L, B, H, T_enc, T_enc)
            "dec_self_attns": self_attns,    # (L, B, H, n_steps, n_steps)
            "dec_cross_attns": cross_attns,  # (L, B, H, n_steps, T_enc)
        }

    # ---- inference -------------------------------------------------------
    def inference(self, text, text_lengths, spk_emb=None, speech=None,
                  max_decoder_steps: int = 500, threshold: float = 0.5,
                  min_decoder_steps: int = 10,
                  *, deterministic: bool = True):
        """Free-running AR decode as one fixed-length scan with
        preallocated KV caches.  Returns mel (B, T_max*r, odim),
        lengths (B,), and per-step cross-attention weights."""
        hs, enc_mask, _ = self.encode(text, text_lengths, speech, spk_emb,
                                      deterministic=deterministic)
        b, t_enc = text.shape[0], hs.shape[1]
        r = self.reduction_factor
        dk = self.adim // self.aheads
        t_max = max_decoder_steps

        def empty_cache():
            # carry_buffer, NOT jnp.zeros: these caches are index-written
            # via dynamic_update_slice inside the scan, which triggers an
            # axon while-loop init miscompile for 16-bit dtypes
            # (ops/buffers.py; tools/diagnose_axon_carry_init.py)
            return {"k": carry_buffer((b, t_max, self.aheads, dk),
                                      self.dtype),
                    "v": carry_buffer((b, t_max, self.aheads, dk),
                                      self.dtype),
                    "index": jnp.zeros((), jnp.int32)}

        caches = [empty_cache() for _ in range(self.dlayers)]
        carry = (caches,
                 jnp.zeros((b, 1, self.odim), self.dtype),   # prev frame
                 jnp.zeros((b,), jnp.bool_),                 # finished
                 jnp.zeros((), jnp.int32))                   # step index

        cross_mask = enc_mask[:, None, None, :]
        positions = jnp.arange(t_max)
        # cross-attention K/V are loop-invariant: project the encoder
        # memory once here instead of 2*dlayers matmuls per decode step
        # (the reference recomputes them every step,
        # transformer_tts.py:600-660)
        cross_kvs = self.decoder.precompute_cross_kv(hs)
        # positional-encoding rows, hoisted: one table outside the loop,
        # a dynamic row slice per step (vs re-deriving sin/cos in-loop)
        from ..ops.positional import sinusoid_position_encoding
        pe_table = sinusoid_position_encoding(t_max, self.adim,
                                              dtype=self.dtype)

        def step(mdl, carry, _):
            caches, prev, finished, t = carry
            d_in = mdl._decoder_input(prev, deterministic=deterministic)
            # self-attention mask over the fixed cache: valid <= t
            self_mask = (positions[None, None, None, :] <= t)
            self_mask = jnp.broadcast_to(self_mask, (b, 1, 1, t_max))
            pe_row = jax.lax.dynamic_slice_in_dim(pe_table, t, 1)[None]
            zs, _, cross_attn, new_caches = mdl.decoder(
                d_in, hs, self_mask, cross_mask,
                deterministic=deterministic, caches=caches, start_pos=t,
                cross_kvs=cross_kvs, pos_pe=pe_row)
            frame = mdl.feat_out(zs[:, -1]).reshape(b, r, mdl.odim)
            logits = mdl.prob_out(zs[:, -1]).reshape(b, r)
            hit = jnp.any(jax.nn.sigmoid(logits) > threshold, axis=-1)
            hit = hit & (t + 1 >= min_decoder_steps)
            valid = ~finished
            new_finished = finished | hit
            new_carry = (new_caches, frame[:, -1:, :], new_finished, t + 1)
            return new_carry, (frame, cross_attn[:, :, :, -1, :], valid)

        scan = nn.scan(step, variable_broadcast="params",
                       split_rngs={"params": False, "dropout": True},
                       in_axes=0, out_axes=1, length=t_max)
        # nn.scan needs a Module target; route through self (method scan)
        _, (frames, cross_attns, valid) = scan(self, carry, None)

        mel = frames.reshape(b, t_max * r, self.odim)
        mel = mel + self.postnet(mel, deterministic=deterministic)
        valid_frames = jnp.repeat(valid, r, axis=1)
        mel = mel * valid_frames[..., None].astype(mel.dtype)
        lengths = jnp.sum(valid_frames.astype(jnp.int32), axis=1)
        return {"mel": mel, "lengths": lengths,
                "cross_attns": cross_attns}


def transformer_tts_loss(outputs, speech, speech_lengths,
                         *, loss_type: str = "L1",
                         bce_pos_weight: float = 5.0):
    """Masked L1 and/or L2 on before/after outs + stop BCE with one-hot
    labels at the final valid step (reference transformer_tts.py:770-873)."""
    t_dec = speech.shape[1]
    mask = sequence_mask(speech_lengths, t_dec).astype(speech.dtype)
    m3 = mask[..., None]

    def _l1(pred):
        return weighted_mean(jnp.abs(pred - speech),
                             jnp.broadcast_to(m3, pred.shape))

    def _l2(pred):
        return weighted_mean(jnp.square(pred - speech),
                             jnp.broadcast_to(m3, pred.shape))

    losses = {}
    loss = 0.0
    if loss_type in ("L1", "L1+L2"):
        l1 = _l1(outputs["before_outs"]) + _l1(outputs["after_outs"])
        losses["l1_loss"] = l1
        loss = loss + l1
    if loss_type in ("L2", "L1+L2"):
        l2 = _l2(outputs["before_outs"]) + _l2(outputs["after_outs"])
        losses["l2_loss"] = l2
        loss = loss + l2

    logits = outputs["stop_logits"]
    idx = jnp.arange(t_dec)[None, :]
    labels = (idx == (speech_lengths - 1)[:, None]).astype(logits.dtype)
    bce = stop_token_bce(logits, labels, mask=mask,
                         pos_weight=bce_pos_weight)
    losses["bce_loss"] = bce
    losses["loss"] = loss + bce
    return losses


def guided_multihead_attention_loss(attns, dec_lens, enc_lens, *,
                                    sigma: float = 0.4,
                                    num_layers: Optional[int] = None,
                                    num_heads: Optional[int] = None):
    """Guided loss over the LAST ``num_layers`` layers and FIRST
    ``num_heads`` heads of a (L, B, H, T_dec, T_enc) attention stack
    (reference transformer_tts.py:1038-1082)."""
    l_total, b, h_total, n_dec, n_enc = attns.shape
    nl = num_layers or l_total
    nh = num_heads or h_total
    sel = attns[l_total - nl:, :, :nh]          # (nl, B, nh, T_dec, T_enc)
    w = attention_guide(dec_lens, enc_lens, n_dec, n_enc, sigma,
                        attns.dtype)            # (B, T_dec, T_enc)
    valid = (sequence_mask(dec_lens, n_dec)[:, :, None]
             & sequence_mask(enc_lens, n_enc)[:, None, :])
    num = jnp.sum(sel * w[None, :, None], axis=(0, 2, 3, 4))
    den = jnp.maximum(
        jnp.sum(valid.astype(attns.dtype), axis=(1, 2)) * nl * nh, 1.0)
    return jnp.mean(num / den)
