"""SpeedySpeech (pure-conv non-autoregressive text -> mel), TPU-native.

Structural equivalent of the reference implementation (reference:
parakeet/models/speedyspeech/speedyspeech.py:20-232): phone+tone text
embedding -> prenet -> dilated residual-conv encoder (each residual
block = 2 x [conv -> ReLU -> BN]) with a linear postnet -> duration
predictor on stop-gradient encodings (log domain, kernel sizes 4/3/1)
-> duration expansion -> sinusoidal positional encoding -> dilated
residual-conv decoder with residual-block postnet -> mel.  The layer
tree matches the reference module-for-module so released checkpoints
convert weight-for-weight (tools/convert_speedyspeech_checkpoint.py).

TPU-first design:
- duration expansion is the on-device searchsorted length regulator
  (ops/length_regulator.py) to a static padded length — the reference
  builds an int64 expansion matrix in a python loop at inference
  (speedyspeech.py:186-220).
- NLC layout; BatchNorm over the channel axis.
- config keys follow the reference YAML (encoder_hidden_size,
  encoder_dilations, ...) so recipes carry over.
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.length_regulator import length_regulate
from ..ops.losses import masked_l1_loss, weighted_mean
from ..ops.masking import sequence_mask
from ..ops.positional import sinusoid_position_encoding
from ..ops.ssim import ssim

__all__ = ["SpeedySpeech", "speedyspeech_loss"]


class ResidualBlock(nn.Module):
    """x + [conv1d(dilated, SAME) -> ReLU -> BN] x n
    (reference speedyspeech.py:20-38)."""
    channels: int
    kernel_size: int = 3
    dilation: int = 1
    n: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        h = x
        for i in range(self.n):
            h = nn.Conv(self.channels, (self.kernel_size,),
                        kernel_dilation=(self.dilation,), padding="SAME",
                        dtype=self.dtype, name=f"conv_{i}")(h)
            h = nn.relu(h)
            h = nn.BatchNorm(use_running_average=deterministic,
                             dtype=self.dtype, name=f"bn_{i}")(h)
        return x + h


class TextEmbedding(nn.Module):
    """Phone embedding plus optional tone embedding, 'add' or 'concat'
    (reference speedyspeech.py:41-73)."""
    vocab_size: int
    embed_size: int
    tone_vocab_size: Optional[int] = None
    tone_embed_size: Optional[int] = None
    concat: bool = False
    padding_idx: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, text, tones=None):
        emb = nn.Embed(self.vocab_size, self.embed_size, dtype=self.dtype,
                       name="text_embed")(text)
        # paddle Embedding(padding_idx=0) pins row 0 to zeros
        emb = emb * (text != self.padding_idx)[..., None].astype(emb.dtype)
        if tones is not None and self.tone_vocab_size is not None:
            t_size = self.tone_embed_size or self.embed_size
            tone = nn.Embed(self.tone_vocab_size, t_size, dtype=self.dtype,
                            name="tone_embed")(tones)
            tone = tone * (tones != self.padding_idx)[..., None].astype(
                tone.dtype)
            if self.concat:
                emb = jnp.concatenate([emb, tone], axis=-1)
            else:
                emb = emb + tone
        return emb


class SpeedySpeechEncoder(nn.Module):
    """prenet -> residual dilated conv stack -> embedding-residual linear
    postnet -> ReLU -> BN -> linear (reference speedyspeech.py:75-106)."""
    hidden_size: int = 128
    kernel_size: int = 3
    dilations: Sequence[int] = (1, 3, 9, 27, 1, 3, 9, 27, 1, 1)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, emb, *, deterministic: bool = True):
        emb = nn.Dense(self.hidden_size, dtype=self.dtype,
                       name="prenet_fc")(emb)
        emb = nn.relu(emb)
        h = emb
        for i, d in enumerate(self.dilations):
            h = ResidualBlock(self.hidden_size, self.kernel_size, d, n=2,
                              dtype=self.dtype,
                              name=f"res_{i}")(h, deterministic=deterministic)
        x = emb + nn.Dense(self.hidden_size, dtype=self.dtype,
                           name="postnet1_fc")(h)
        x = nn.relu(x)
        x = nn.BatchNorm(use_running_average=deterministic, dtype=self.dtype,
                         name="postnet2_bn")(x)
        return nn.Dense(self.hidden_size, dtype=self.dtype,
                        name="postnet2_fc")(x)


class SSDurationPredictor(nn.Module):
    """Residual conv blocks (kernel 4/3/1, single sub-block each) ->
    linear; log-domain durations (reference speedyspeech.py:108-118)."""
    hidden_size: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        h = x
        for i, k in enumerate((4, 3, 1)):
            h = ResidualBlock(self.hidden_size, k, 1, n=1, dtype=self.dtype,
                              name=f"res_{i}")(h, deterministic=deterministic)
        return nn.Dense(1, dtype=self.dtype, name="fc")(h).squeeze(-1)


class SpeedySpeechDecoder(nn.Module):
    """Residual dilated conv stack -> input-residual linear postnet ->
    residual block -> mel projection (reference speedyspeech.py:120-138)."""
    hidden_size: int = 128
    output_size: int = 80
    kernel_size: int = 3
    dilations: Sequence[int] = (1, 3, 9, 27, 1, 3, 9, 27, 1, 3, 9, 27,
                                1, 3, 9, 27, 1, 1)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        h = x
        for i, d in enumerate(self.dilations):
            h = ResidualBlock(self.hidden_size, self.kernel_size, d, n=2,
                              dtype=self.dtype,
                              name=f"res_{i}")(h, deterministic=deterministic)
        x = x + nn.Dense(self.hidden_size, dtype=self.dtype,
                         name="postnet1_fc")(h)
        x = ResidualBlock(self.hidden_size, self.kernel_size, 1, n=2,
                          dtype=self.dtype,
                          name="postnet2_res")(x,
                                               deterministic=deterministic)
        return nn.Dense(self.output_size, dtype=self.dtype, name="fc")(x)


class SpeedySpeech(nn.Module):
    """Config keys follow the reference constructor
    (speedyspeech.py:141-165).  ``spk_num`` (speaker embedding added to
    the text embedding) is an extension beyond the reference."""
    vocab_size: int
    encoder_hidden_size: int = 128
    encoder_kernel_size: int = 3
    encoder_dilations: Sequence[int] = (1, 3, 9, 27, 1, 3, 9, 27, 1, 1)
    duration_predictor_hidden_size: int = 128
    decoder_hidden_size: int = 128
    decoder_output_size: int = 80
    decoder_kernel_size: int = 3
    decoder_dilations: Sequence[int] = (1, 3, 9, 27, 1, 3, 9, 27, 1, 3, 9,
                                        27, 1, 3, 9, 27, 1, 1)
    tone_size: Optional[int] = None
    spk_num: Optional[int] = None
    padding_idx: int = 0
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.embedding = TextEmbedding(
            self.vocab_size, self.encoder_hidden_size, self.tone_size,
            padding_idx=self.padding_idx, dtype=self.dtype)
        if self.spk_num is not None:
            self.spk_emb = nn.Embed(self.spk_num, self.encoder_hidden_size,
                                    dtype=self.dtype)
        self.encoder = SpeedySpeechEncoder(
            self.encoder_hidden_size, self.encoder_kernel_size,
            self.encoder_dilations, dtype=self.dtype)
        self.duration_predictor = SSDurationPredictor(
            self.duration_predictor_hidden_size, dtype=self.dtype)
        self.decoder = SpeedySpeechDecoder(
            self.decoder_hidden_size, self.decoder_output_size,
            self.decoder_kernel_size, self.decoder_dilations,
            dtype=self.dtype)

    def encode(self, text, tones=None, spk_id=None, *,
               deterministic: bool = True):
        emb = self.embedding(text, tones)
        if self.spk_num is not None and spk_id is not None:
            emb = emb + self.spk_emb(spk_id)[:, None, :]
        encodings = self.encoder(emb, deterministic=deterministic)
        # duration head sees stop-gradient encodings (reference
        # speedyspeech.py:172-173 uses .detach())
        log_d = self.duration_predictor(
            jax.lax.stop_gradient(encodings), deterministic=deterministic)
        return encodings, log_d

    def decode(self, expanded, *, deterministic: bool = True):
        t = expanded.shape[1]
        pe = sinusoid_position_encoding(t, expanded.shape[-1],
                                        dtype=expanded.dtype)
        return self.decoder(expanded + pe[None],
                            deterministic=deterministic)

    def __call__(self, text, durations, tones=None, spk_id=None,
                 max_frames: Optional[int] = None,
                 *, deterministic: bool = True):
        """Teacher-forced: expand by ground-truth durations.  Returns
        (mel (B, T_frames, odim), log_durations (B, T_text))."""
        encodings, log_d = self.encode(text, tones, spk_id,
                                       deterministic=deterministic)
        t_frames = max_frames or int(durations.sum(axis=-1).max())
        expanded, frame_lengths = length_regulate(encodings, durations,
                                                  t_frames)
        mel = self.decode(expanded, deterministic=deterministic)
        return {"mel": mel, "log_durations": log_d,
                "frame_lengths": frame_lengths}

    def inference(self, text, tones=None, spk_id=None,
                  max_frames: int = 1000, alpha: float = 1.0,
                  *, deterministic: bool = True):
        """Free-running: expand by predicted durations round(exp(.))
        (reference speedyspeech.py:186-198); ``alpha`` speed control is
        an extension (1.0 = reference behavior)."""
        encodings, log_d = self.encode(text, tones, spk_id,
                                       deterministic=deterministic)
        # clamp per-token durations to the frame budget so the float ->
        # int cast cannot overflow on untrained/extreme predictions
        d = jnp.clip(jnp.round(alpha * jnp.exp(log_d)), 0, max_frames)
        d = d.astype(jnp.int32)
        expanded, frame_lengths = length_regulate(encodings, d, max_frames)
        mel = self.decode(expanded, deterministic=deterministic)
        return {"mel": mel, "frame_lengths": frame_lengths}


def _huber(err, delta: float = 1.0):
    a = jnp.abs(err)
    return jnp.where(a <= delta, 0.5 * jnp.square(err),
                     delta * (a - 0.5 * delta))


def speedyspeech_loss(outputs, batch, *, ssim_weight: float = 1.0,
                      mel_weight: float = 1.0, duration_weight: float = 1.0):
    """masked L1 + (1 - SSIM) + huber(log-duration) (reference:
    parakeet/models/speedyspeech/speedyspeech_updater.py:49-95:
    duration target is log(max(d, 1)), huber delta 1.0)."""
    mel = outputs["mel"]
    target = batch["feats"]
    t = mel.shape[1]
    frame_mask = sequence_mask(batch["num_frames"], t).astype(mel.dtype)
    m3 = frame_mask[..., None]
    l1 = masked_l1_loss(mel, target, jnp.broadcast_to(m3, mel.shape))
    # SSIM over the masked spectrogram "image"
    ssim_val = ssim((mel * m3)[:, None], (target * m3)[:, None])
    ssim_loss = 1.0 - ssim_val
    tok_mask = sequence_mask(batch["num_phones"],
                             outputs["log_durations"].shape[1]).astype(
        mel.dtype)
    log_d_target = jnp.log(
        jnp.maximum(batch["durations"].astype(mel.dtype), 1.0))
    dur_loss = weighted_mean(
        _huber(outputs["log_durations"] - log_d_target), tok_mask)
    loss = (mel_weight * l1 + ssim_weight * ssim_loss
            + duration_weight * dur_loss)
    return {"loss": loss, "l1_loss": l1, "ssim_loss": ssim_loss,
            "duration_loss": dur_loss}
