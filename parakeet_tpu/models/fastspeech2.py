"""FastSpeech2 (non-autoregressive text -> mel), TPU-native.

Behavioral equivalent of the reference implementation (reference:
parakeet/models/fastspeech2/fastspeech2.py:37-812) with token-averaged
pitch/energy (FastPitch style).  TPU-first differences:

- fully static shapes: training expands to the padded target length,
  inference to a caller-chosen ``max_frames``; no host round-trips — the
  length regulator is the on-device searchsorted expansion
  (parakeet_tpu.ops.length_regulate) instead of the reference's numpy
  matrix construction (length_regulator.py:33-76).
- one flax module with pure ``__call__`` (train) / ``inference`` methods,
  jit/pjit-compatible, batch-axis shardable for DP.
- NLC layout throughout; compute dtype selectable (bfloat16 on TPU).
"""
from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.postnet import Postnet
from ..nn.predictors import (DurationPredictor, VariancePredictor,
                             VarianceEmbedding, duration_predictor_loss)
from ..nn.transformer import TransformerEncoder
from ..ops.length_regulator import length_regulate
from ..ops.masking import sequence_mask

__all__ = ["FastSpeech2", "fastspeech2_loss"]


def _l2_normalize(x, axis=-1, eps=1e-12):
    return x / jnp.sqrt(
        jnp.maximum(jnp.sum(jnp.square(x), axis=axis, keepdims=True), eps))


class FastSpeech2(nn.Module):
    """See module docstring.  Hyperparameter names follow the reference
    constructor (fastspeech2.py:52-120) so YAML configs carry over."""
    idim: int
    odim: int
    adim: int = 384
    aheads: int = 4
    elayers: int = 6
    eunits: int = 1536
    dlayers: int = 6
    dunits: int = 1536
    postnet_layers: int = 5
    postnet_chans: int = 512
    postnet_filts: int = 5
    positionwise_layer_type: str = "conv1d"
    positionwise_conv_kernel_size: int = 1
    use_scaled_pos_enc: bool = True
    init_enc_alpha: float = 1.0
    init_dec_alpha: float = 1.0
    use_batch_norm: bool = True
    encoder_normalize_before: bool = True
    decoder_normalize_before: bool = True
    encoder_concat_after: bool = False
    decoder_concat_after: bool = False
    reduction_factor: int = 1
    # duration predictor
    duration_predictor_layers: int = 2
    duration_predictor_chans: int = 384
    duration_predictor_kernel_size: int = 3
    duration_predictor_dropout_rate: float = 0.1
    # energy predictor
    energy_predictor_layers: int = 2
    energy_predictor_chans: int = 384
    energy_predictor_kernel_size: int = 3
    energy_predictor_dropout: float = 0.5
    energy_embed_kernel_size: int = 9
    energy_embed_dropout: float = 0.5
    stop_gradient_from_energy_predictor: bool = False
    # pitch predictor
    pitch_predictor_layers: int = 2
    pitch_predictor_chans: int = 384
    pitch_predictor_kernel_size: int = 3
    pitch_predictor_dropout: float = 0.5
    pitch_embed_kernel_size: int = 9
    pitch_embed_dropout: float = 0.5
    stop_gradient_from_pitch_predictor: bool = False
    # speaker / tone conditioning
    num_speakers: Optional[int] = None
    spk_embed_dim: Optional[int] = None
    spk_embed_integration_type: str = "add"
    num_tones: Optional[int] = None
    tone_embed_dim: Optional[int] = None
    tone_embed_integration_type: str = "add"
    # dropout
    transformer_enc_dropout_rate: float = 0.1
    transformer_enc_positional_dropout_rate: float = 0.1
    transformer_enc_attn_dropout_rate: float = 0.1
    transformer_dec_dropout_rate: float = 0.1
    transformer_dec_positional_dropout_rate: float = 0.1
    transformer_dec_attn_dropout_rate: float = 0.1
    postnet_dropout_rate: float = 0.5
    dtype: jnp.dtype = jnp.float32
    # optional replacement attention core for the decoder stack — e.g.
    # sequence-parallel ring attention for long-form synthesis
    # (parallel/ring_attention.py); (q, k, v, mask) -> (B, T, H, dk)
    decoder_attn_core: Optional[Callable] = None
    # attention implementation: "auto" (default — flash above the
    # measured T>=1024 crossover, dense below / with attention dropout
    # / with KV caches: never loses to either fixed choice,
    # docs/tpu_performance.md), "dense" (softmax scores in HBM;
    # supports attention-weight dropout and alignment plots), or
    # "flash" (always the fused Pallas online-softmax kernel,
    # nn/flash.py — scores stay in VMEM; requires
    # transformer_*_attn_dropout_rate == 0 for training)
    attn_impl: str = "auto"
    # optional pipeline-parallel runner for the encoder/decoder stacks
    # (parallel/pipeline.py make_pp_layer_runner; recipe flag --pp N).
    # Changes the transformer param layout to depth-stacked 'layers' —
    # convert with parallel.stack_layer_params / unstack_layer_params.
    layer_runner: Optional[Callable] = None

    def setup(self):
        if self.attn_impl == "flash":
            from ..nn.flash import make_flash_attn_core
            flash_core = make_flash_attn_core()
        elif self.attn_impl == "auto":
            from ..nn.flash import make_auto_attn_core
            flash_core = make_auto_attn_core()
        elif self.attn_impl == "dense":
            flash_core = None
        else:
            raise ValueError(f"unknown attn_impl {self.attn_impl!r}")
        self.encoder = TransformerEncoder(
            d_model=self.adim, n_heads=self.aheads, units=self.eunits,
            num_layers=self.elayers, input_layer="embed",
            vocab_size=self.idim,
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
            dtype=self.dtype, attn_core=flash_core,
            layer_runner=self.layer_runner)
        self.decoder = TransformerEncoder(
            d_model=self.adim, n_heads=self.aheads, units=self.dunits,
            num_layers=self.dlayers, input_layer=None,
            dropout_rate=self.transformer_dec_dropout_rate,
            positional_dropout_rate=(
                self.transformer_dec_positional_dropout_rate),
            attn_dropout_rate=self.transformer_dec_attn_dropout_rate,
            use_scaled_pos_enc=self.use_scaled_pos_enc,
            init_alpha=self.init_dec_alpha,
            normalize_before=self.decoder_normalize_before,
            concat_after=self.decoder_concat_after,
            positionwise_layer_type=self.positionwise_layer_type,
            positionwise_conv_kernel_size=(
                self.positionwise_conv_kernel_size),
            dtype=self.dtype,
            attn_core=self.decoder_attn_core or flash_core,
            layer_runner=self.layer_runner)
        self.duration_predictor = DurationPredictor(
            n_layers=self.duration_predictor_layers,
            n_chans=self.duration_predictor_chans,
            kernel_size=self.duration_predictor_kernel_size,
            dropout_rate=self.duration_predictor_dropout_rate,
            dtype=self.dtype)
        self.pitch_predictor = VariancePredictor(
            n_layers=self.pitch_predictor_layers,
            n_chans=self.pitch_predictor_chans,
            kernel_size=self.pitch_predictor_kernel_size,
            dropout_rate=self.pitch_predictor_dropout,
            dtype=self.dtype)
        self.energy_predictor = VariancePredictor(
            n_layers=self.energy_predictor_layers,
            n_chans=self.energy_predictor_chans,
            kernel_size=self.energy_predictor_kernel_size,
            dropout_rate=self.energy_predictor_dropout,
            dtype=self.dtype)
        self.pitch_embed = VarianceEmbedding(
            self.adim, self.pitch_embed_kernel_size,
            self.pitch_embed_dropout, dtype=self.dtype)
        self.energy_embed = VarianceEmbedding(
            self.adim, self.energy_embed_kernel_size,
            self.energy_embed_dropout, dtype=self.dtype)
        self.feat_out = nn.Dense(self.odim * self.reduction_factor,
                                 dtype=self.dtype)
        if self.postnet_layers > 0:
            self.postnet = Postnet(
                odim=self.odim, n_layers=self.postnet_layers,
                n_chans=self.postnet_chans, n_filts=self.postnet_filts,
                dropout_rate=self.postnet_dropout_rate,
                use_batch_norm=self.use_batch_norm, dtype=self.dtype)
        if self.spk_embed_dim is not None:
            if self.num_speakers is not None:
                self.spk_embedding_table = nn.Embed(
                    self.num_speakers, self.spk_embed_dim, dtype=self.dtype)
            in_features = (self.spk_embed_dim
                           if self.spk_embed_integration_type == "add"
                           else self.adim + self.spk_embed_dim)
            del in_features  # flax infers input dims
            self.spk_projection = nn.Dense(self.adim, dtype=self.dtype)
        if self.tone_embed_dim is not None:
            self.tone_embedding_table = nn.Embed(
                self.num_tones, self.tone_embed_dim, dtype=self.dtype)
            self.tone_projection = nn.Dense(self.adim, dtype=self.dtype)

    # ------------------------------------------------------------------
    def _integrate_spk(self, hs, spk_emb):
        spk_emb = _l2_normalize(spk_emb)
        if self.spk_embed_integration_type == "add":
            return hs + self.spk_projection(spk_emb)[:, None, :]
        tiled = jnp.broadcast_to(
            spk_emb[:, None, :], (hs.shape[0], hs.shape[1], spk_emb.shape[-1]))
        return self.spk_projection(jnp.concatenate([hs, tiled], axis=-1))

    def _integrate_tone(self, hs, tone_emb):
        tone_emb = _l2_normalize(tone_emb)
        if self.tone_embed_integration_type == "add":
            return hs + self.tone_projection(tone_emb)
        return self.tone_projection(jnp.concatenate([hs, tone_emb], axis=-1))

    def _encode(self, text, text_lengths, spk_id, spk_emb, tone_id,
                deterministic):
        t_max = text.shape[1]
        x_mask = sequence_mask(text_lengths, t_max)[:, None, :]  # (B,1,T)
        hs, _ = self.encoder(text, x_mask, deterministic=deterministic)
        if self.spk_embed_dim is not None:
            if spk_emb is None and spk_id is not None:
                spk_emb = self.spk_embedding_table(spk_id)
            if spk_emb is not None:
                hs = self._integrate_spk(hs, spk_emb)
        if self.tone_embed_dim is not None and tone_id is not None:
            hs = self._integrate_tone(hs, self.tone_embedding_table(tone_id))
        return hs

    def _decode(self, hs, frame_lengths, deterministic):
        max_frames = hs.shape[1]
        h_mask = sequence_mask(frame_lengths, max_frames)[:, None, :]
        zs, _ = self.decoder(hs, h_mask, deterministic=deterministic)
        before = self.feat_out(zs).reshape(zs.shape[0], -1, self.odim)
        if self.postnet_layers > 0:
            after = before + self.postnet(before,
                                          deterministic=deterministic)
        else:
            after = before
        return before, after

    # ------------------------------------------------------------------
    def __call__(self, text, text_lengths, speech, speech_lengths,
                 durations, pitch, energy, spk_id=None, spk_emb=None,
                 tone_id=None, *, deterministic: bool = False):
        """Teacher-forced training forward.

        Returns dict: before_outs, after_outs (B, Lmax, odim),
        d_outs (B, Tmax) log durations, p_outs/e_outs (B, Tmax, 1),
        olens (B,) target lengths trimmed to the reduction factor.
        """
        r = self.reduction_factor
        hs = self._encode(text, text_lengths, spk_id, spk_emb, tone_id,
                          deterministic)
        pad_mask = ~sequence_mask(text_lengths, text.shape[1])  # (B, T)

        p_in = jax.lax.stop_gradient(hs) \
            if self.stop_gradient_from_pitch_predictor else hs
        e_in = jax.lax.stop_gradient(hs) \
            if self.stop_gradient_from_energy_predictor else hs
        p_outs = self.pitch_predictor(p_in, pad_mask[..., None],
                                      deterministic=deterministic)
        e_outs = self.energy_predictor(e_in, pad_mask[..., None],
                                       deterministic=deterministic)
        d_outs = self.duration_predictor(hs, pad_mask,
                                         deterministic=deterministic)

        hs = hs + self.pitch_embed(pitch, deterministic=deterministic) \
                + self.energy_embed(energy, deterministic=deterministic)

        olens = speech_lengths - speech_lengths % r
        dec_len = speech.shape[1] // r
        hs, _ = length_regulate(hs, durations, max_len=dec_len)
        before, after = self._decode(hs, olens // r, deterministic)
        return {
            "before_outs": before,
            "after_outs": after,
            "d_outs": d_outs,
            "p_outs": p_outs,
            "e_outs": e_outs,
            "olens": olens,
        }

    def inference(self, text, text_lengths, *, max_frames: int,
                  durations=None, pitch=None, energy=None,
                  alpha: float = 1.0, spk_id=None, spk_emb=None,
                  tone_id=None, min_duration: int = 0,
                  deterministic: bool = True):
        """Free-running synthesis to a static ``max_frames`` capacity.

        ``min_duration`` > 0 floors each valid token's predicted duration
        (robustness for under-trained checkpoints; the reference allows
        zero-length tokens, fastspeech2.py:468-500).
        Returns dict: after_outs (B, max_frames, odim), frame_lengths (B,),
        d_outs (B, Tmax) predicted integer durations.
        """
        r = self.reduction_factor
        hs = self._encode(text, text_lengths, spk_id, spk_emb, tone_id,
                          deterministic)
        pad_mask = ~sequence_mask(text_lengths, text.shape[1])

        p_outs = pitch if pitch is not None else self.pitch_predictor(
            hs, pad_mask[..., None], deterministic=deterministic)
        e_outs = energy if energy is not None else self.energy_predictor(
            hs, pad_mask[..., None], deterministic=deterministic)
        if durations is not None:
            d_outs = durations
        else:
            d_outs = self.duration_predictor(
                hs, pad_mask, inference=True, deterministic=deterministic)
        if min_duration > 0:
            d_outs = jnp.where(pad_mask, d_outs,
                               jnp.maximum(d_outs, min_duration))

        hs = hs + self.pitch_embed(p_outs, deterministic=deterministic) \
                + self.energy_embed(e_outs, deterministic=deterministic)
        hs, total = length_regulate(hs, d_outs, max_len=max_frames // r,
                                    alpha=alpha)
        total = jnp.minimum(total, max_frames // r)
        _, after = self._decode(hs, total, deterministic)
        return {
            "after_outs": after,
            "frame_lengths": total * r,
            "d_outs": d_outs,
        }


def fastspeech2_loss(outputs, batch, use_masking: bool = True,
                     use_weighted_masking: bool = False):
    """L1 (before+after) + log-duration MSE + pitch/energy MSE.

    Mirrors FastSpeech2Loss (reference: fastspeech2.py:674-812).  Returns a
    dict of scalars: loss, l1_loss, duration_loss, pitch_loss, energy_loss.
    """
    ys = batch["speech"]
    olens = outputs["olens"]
    ilens = batch["text_lengths"]
    before, after = outputs["before_outs"], outputs["after_outs"]
    d_outs, p_outs, e_outs = (outputs["d_outs"], outputs["p_outs"],
                              outputs["e_outs"])
    ds = batch["durations"]
    ps, es = batch["pitch"], batch["energy"]

    if use_masking or use_weighted_masking:
        out_mask = sequence_mask(olens, ys.shape[1])[..., None]  # (B, L, 1)
        in_mask = sequence_mask(ilens, ds.shape[1])              # (B, T)
    else:  # no masking at all: every element weighs in
        out_mask = jnp.ones((*ys.shape[:2], 1), dtype=jnp.bool_)
        in_mask = jnp.ones(ds.shape, dtype=jnp.bool_)

    if use_weighted_masking:
        # per-sequence weights: each sequence contributes equally
        out_w = out_mask.astype(jnp.float32)
        out_w = out_w / jnp.maximum(out_w.sum(axis=1, keepdims=True), 1.0)
        out_w = out_w / (ys.shape[0] * ys.shape[2])
        in_w = in_mask.astype(jnp.float32)
        in_w = in_w / jnp.maximum(in_w.sum(axis=1, keepdims=True), 1.0)
        in_w = in_w / ds.shape[0]

        l1 = (jnp.abs(before - ys) * out_w).sum() \
            + (jnp.abs(after - ys) * out_w).sum()
        log_ds = jnp.log(ds.astype(jnp.float32) + 1.0)
        dur = (jnp.square(d_outs - log_ds) * in_w).sum()
        pitch = (jnp.square(p_outs - ps) * in_w[..., None]).sum()
        energy = (jnp.square(e_outs - es) * in_w[..., None]).sum()
    else:
        m = out_mask.astype(jnp.float32)
        denom = jnp.maximum(m.sum() * ys.shape[2], 1.0)
        l1 = (jnp.abs(before - ys) * m).sum() / denom \
            + (jnp.abs(after - ys) * m).sum() / denom
        dur = duration_predictor_loss(d_outs, ds, in_mask)
        im = in_mask.astype(jnp.float32)[..., None]
        pitch = (jnp.square(p_outs - ps) * im).sum() / jnp.maximum(
            im.sum(), 1.0)
        energy = (jnp.square(e_outs - es) * im).sum() / jnp.maximum(
            im.sum(), 1.0)

    total = l1 + dur + pitch + energy
    return {"loss": total, "l1_loss": l1, "duration_loss": dur,
            "pitch_loss": pitch, "energy_loss": energy}
