"""Tacotron2 (autoregressive attention seq2seq text -> mel), TPU-native.

Behavioral equivalent of the reference implementation (reference:
parakeet/models/tacotron2.py:82-982): embedding (+optional tone embedding,
+optional global condition) -> conv+BiLSTM encoder -> autoregressive decoder
(prenet, attention LSTM, location-sensitive attention, decoder LSTM) ->
linear frame/stop projection -> 5-conv Postnet residual.

TPU-first design (not a port):
- the decoder is a single ``lax.scan`` (via ``nn.scan``) over time with an
  explicit carried state tuple — both teacher-forced training and
  free-running inference stay one XLA computation on device (the reference
  runs a python loop holding state in layer attributes,
  tacotron2.py:352-536).
- at training time the prenet over the (known) teacher-forced inputs runs
  **outside** the scan as one batched matmul over all timesteps — MXU-sized
  work instead of T tiny per-step matmuls.
- inference termination (stop-token sigmoid / attention-peak-at-end with a
  grace window, reference tacotron2.py:519-536) is a masked ``finished``
  flag carried through a fixed-length scan, not a python ``break``.
- static shapes throughout: text padded to T_enc with a length mask,
  decode runs ``max_decoder_steps`` and returns per-utterance lengths.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..nn.attention import LocationSensitiveAttention
from ..nn.postnet import Postnet, Prenet
from ..ops.losses import guided_attention_loss, stop_token_bce
from ..ops.masking import sequence_mask

__all__ = ["Tacotron2", "tacotron2_loss"]


class Tacotron2Encoder(nn.Module):
    """Embedding is applied by the caller; this is convs + BiLSTM
    (reference tacotron2.py:174-238)."""
    d_encoder: int = 512
    conv_layers: int = 3
    kernel_size: int = 5
    dropout_rate: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, input_mask, *, deterministic: bool = True):
        """x (B, T, d_embed), input_mask (B, T) True = valid."""
        h = x
        for i in range(self.conv_layers):
            h = nn.Conv(self.d_encoder, (self.kernel_size,), padding="SAME",
                        use_bias=False, dtype=self.dtype,
                        name=f"conv_{i}")(h)
            h = nn.BatchNorm(use_running_average=deterministic,
                             dtype=self.dtype, name=f"bn_{i}")(h)
            h = nn.relu(h)
            h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        # zero out padding so the BiLSTM does not leak across utterances
        h = h * input_mask[..., None].astype(h.dtype)
        half = self.d_encoder // 2
        fwd = nn.RNN(nn.OptimizedLSTMCell(half, dtype=self.dtype),
                     name="lstm_fwd")
        bwd = nn.RNN(nn.OptimizedLSTMCell(half, dtype=self.dtype),
                     reverse=True, keep_order=True, name="lstm_bwd")
        lengths = jnp.sum(input_mask.astype(jnp.int32), axis=-1)
        out_f = fwd(h, seq_lengths=lengths)
        out_b = bwd(h, seq_lengths=lengths)
        return jnp.concatenate([out_f, out_b], axis=-1)


class Tacotron2DecoderCell(nn.Module):
    """One decoder step: attention LSTM -> LSA -> decoder LSTM -> frame/stop
    projection (reference tacotron2.py:378-418).  Called under ``nn.scan``.

    Carry: (attn_lstm_state, dec_lstm_state, context (B, d_v),
    attention_weights (B, T), cum_attention_weights (B, T)).
    """
    d_mels: int = 80
    reduction_factor: int = 1
    d_attention_rnn: int = 1024
    d_decoder_rnn: int = 1024
    d_attention: int = 128
    attention_filters: int = 32
    attention_kernel_size: int = 31
    p_attention_dropout: float = 0.1
    p_decoder_dropout: float = 0.1
    use_stop_token: bool = True
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.attention_rnn = nn.OptimizedLSTMCell(self.d_attention_rnn,
                                                  dtype=self.dtype)
        self.decoder_rnn = nn.OptimizedLSTMCell(self.d_decoder_rnn,
                                                dtype=self.dtype)
        self.attention = LocationSensitiveAttention(
            self.d_attention, self.attention_filters,
            self.attention_kernel_size, dtype=self.dtype)
        self.frame_proj = nn.Dense(self.d_mels * self.reduction_factor,
                                   dtype=self.dtype)
        self.stop_proj = nn.Dense(1, dtype=self.dtype)
        self.attn_dropout = nn.Dropout(self.p_attention_dropout)
        self.dec_dropout = nn.Dropout(self.p_decoder_dropout)

    def process_keys(self, keys):
        return self.attention.process_keys(keys)

    def __call__(self, carry, prenet_out, processed_keys, values, key_mask,
                 *, deterministic: bool = True):
        (attn_state, dec_state, context, weights, cum_weights) = carry
        cell_in = jnp.concatenate([prenet_out, context], axis=-1)
        attn_state, attn_h = self.attention_rnn(attn_state, cell_in)
        attn_h = self.attn_dropout(attn_h, deterministic=deterministic)
        context, weights = self.attention(attn_h, processed_keys, values,
                                          weights, cum_weights,
                                          mask=key_mask)
        # accumulate attention mass in fp32: under bf16 compute, per-step
        # increments below the ulp of a grown cumulative sum would be
        # dropped, stalling the location feature on long decodes
        weights = weights.astype(jnp.float32)
        cum_weights = cum_weights.astype(jnp.float32) + weights
        dec_in = jnp.concatenate([attn_h, context], axis=-1)
        dec_state, dec_h = self.decoder_rnn(dec_state, dec_in)
        dec_h = self.dec_dropout(dec_h, deterministic=deterministic)
        proj_in = jnp.concatenate([dec_h, context], axis=-1)
        frame = self.frame_proj(proj_in)        # (B, r * d_mels)
        stop_logit = self.stop_proj(proj_in).squeeze(-1)  # (B,)
        # pin state/context leaves to the compute dtype (lax.scan needs
        # carry-in == carry-out types); weights/cum_weights stay fp32
        new_carry = (*jax.tree_util.tree_map(
            lambda x: x.astype(self.dtype),
            (attn_state, dec_state, context)), weights, cum_weights)
        return new_carry, (frame, stop_logit, weights)

    def initial_carry(self, batch, t_enc, d_values):
        z = lambda *s: jnp.zeros(s, self.dtype)
        attn_state = (z(batch, self.d_attention_rnn),
                      z(batch, self.d_attention_rnn))
        dec_state = (z(batch, self.d_decoder_rnn),
                     z(batch, self.d_decoder_rnn))
        return (attn_state, dec_state, z(batch, d_values),
                jnp.zeros((batch, t_enc), jnp.float32),
                jnp.zeros((batch, t_enc), jnp.float32))


class Tacotron2(nn.Module):
    """Full model.  Hyperparameter names follow the reference constructor
    (tacotron2.py:626-690) so configs carry over."""
    vocab_size: int
    n_tones: Optional[int] = None
    d_mels: int = 80
    d_encoder: int = 512
    encoder_conv_layers: int = 3
    encoder_kernel_size: int = 5
    d_prenet: int = 256
    d_attention_rnn: int = 1024
    d_decoder_rnn: int = 1024
    attention_filters: int = 32
    attention_kernel_size: int = 31
    d_attention: int = 128
    d_postnet: int = 512
    postnet_kernel_size: int = 5
    postnet_conv_layers: int = 5
    reduction_factor: int = 1
    p_encoder_dropout: float = 0.5
    p_prenet_dropout: float = 0.5
    p_attention_dropout: float = 0.1
    p_decoder_dropout: float = 0.1
    p_postnet_dropout: float = 0.5
    d_global_condition: Optional[int] = None
    use_stop_token: bool = True
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.embedding = nn.Embed(self.vocab_size, self.d_encoder,
                                  embedding_init=nn.initializers.uniform(
                                      scale=0.1),
                                  dtype=self.dtype)
        if self.n_tones is not None:
            self.embedding_tones = nn.Embed(
                self.n_tones, self.d_encoder,
                embedding_init=nn.initializers.uniform(scale=0.06),
                dtype=self.dtype)
        self.encoder = Tacotron2Encoder(
            self.d_encoder, self.encoder_conv_layers,
            self.encoder_kernel_size, self.p_encoder_dropout,
            dtype=self.dtype)
        # bias-free, reference tacotron2.py:58-59 (DecoderPreNet)
        self.prenet = Prenet(2, self.d_prenet, self.p_prenet_dropout,
                             always_dropout=True, use_bias=False,
                             dtype=self.dtype)
        self.cell = Tacotron2DecoderCell(
            self.d_mels, self.reduction_factor, self.d_attention_rnn,
            self.d_decoder_rnn, self.d_attention, self.attention_filters,
            self.attention_kernel_size, self.p_attention_dropout,
            self.p_decoder_dropout, self.use_stop_token, dtype=self.dtype)
        self.postnet = Postnet(self.d_mels, self.postnet_conv_layers,
                               self.d_postnet, self.postnet_kernel_size,
                               self.p_postnet_dropout, dtype=self.dtype)

    @property
    def _d_values(self):
        d = self.d_encoder
        if self.d_global_condition is not None:
            d += self.d_global_condition
        return d

    def encode(self, text, text_lengths, tones=None, global_condition=None,
               *, deterministic: bool = True):
        mask = sequence_mask(text_lengths, text.shape[1])
        emb = self.embedding(text)
        if tones is not None:
            emb = emb + self.embedding_tones(tones)
        enc = self.encoder(emb, mask, deterministic=deterministic)
        if global_condition is not None:
            g = jnp.broadcast_to(
                global_condition[:, None, :],
                (enc.shape[0], enc.shape[1], global_condition.shape[-1]))
            enc = jnp.concatenate([enc, g.astype(enc.dtype)], axis=-1)
        return enc, mask

    def __call__(self, text, text_lengths, mels, output_lengths,
                 tones=None, global_condition=None,
                 *, deterministic: bool = True):
        """Teacher-forced training forward.

        text (B, T_enc) int; mels (B, T_dec, d_mels); returns dict with
        mel_output / mel_outputs_postnet / stop_logits / alignments.
        """
        values, key_mask = self.encode(
            text, text_lengths, tones, global_condition,
            deterministic=deterministic)
        b, t_enc = text.shape
        r = self.reduction_factor
        t_dec = mels.shape[1]
        n_steps = t_dec // r

        # decoder inputs: last frame of the previous reduction group,
        # shifted right with a zero initial frame — prenet over ALL steps in
        # one batched matmul (outside the scan).
        dec_in = mels[:, r - 1::r, :]                      # (B, n_steps, d)
        dec_in = jnp.concatenate(
            [jnp.zeros_like(dec_in[:, :1]), dec_in[:, :-1]], axis=1)
        prenet_out = self.prenet(dec_in, deterministic=deterministic)

        processed_keys = self.cell.process_keys(values)
        carry = self.cell.initial_carry(b, t_enc, values.shape[-1])

        scan = nn.scan(
            lambda cell, c, x: cell(c, x, processed_keys, values, key_mask,
                                    deterministic=deterministic),
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": True},
            in_axes=1, out_axes=1)
        _, (frames, stop_logits, alignments) = scan(self.cell, carry,
                                                    prenet_out)
        mel_output = frames.reshape(b, n_steps * r, self.d_mels)
        mel_output_postnet = mel_output + self.postnet(
            mel_output, deterministic=deterministic)
        return {
            "mel_output": mel_output,
            "mel_outputs_postnet": mel_output_postnet,
            "stop_logits": stop_logits,           # (B, n_steps)
            "alignments": alignments,             # (B, n_steps, T_enc)
        }

    def infer(self, text, text_lengths, tones=None, global_condition=None,
              max_decoder_steps: int = 1000, stop_threshold: float = 0.5,
              grace_steps: int = 20, *, deterministic: bool = True):
        """Free-running inference as one fixed-length scan.

        Stop criterion per utterance (reference tacotron2.py:519-536):
        sigmoid(stop_logit) > threshold when ``use_stop_token``, otherwise
        attention peak on the final valid encoder position; in the latter
        case generation continues ``grace_steps`` further steps.
        Returns mels (B, max_steps*r, d_mels), lengths (B,), alignments.
        """
        values, key_mask = self.encode(
            text, text_lengths, tones, global_condition,
            deterministic=deterministic)
        b, t_enc = text.shape
        r = self.reduction_factor
        processed_keys = self.cell.process_keys(values)
        cell_carry = self.cell.initial_carry(b, t_enc, values.shape[-1])
        carry = (cell_carry,
                 jnp.zeros((b, self.d_mels), self.dtype),     # prev frame
                 jnp.zeros((b,), jnp.bool_),                  # finished
                 jnp.zeros((b,), jnp.int32))                  # grace counter

        def step(cell, carry, _):
            cell_carry, prev_frame, finished, counter = carry
            prenet_out = self.prenet(prev_frame,
                                     deterministic=deterministic)
            cell_carry, (frame, stop_logit, weights) = cell(
                cell_carry, prenet_out, processed_keys, values, key_mask,
                deterministic=deterministic)
            frame_groups = frame.reshape(b, r, self.d_mels)
            last_frame = frame_groups[:, -1, :]
            if self.use_stop_token:
                hit = jax.nn.sigmoid(stop_logit) > stop_threshold
                new_finished = finished | hit
                new_counter = counter
            else:
                peak = jnp.argmax(weights, axis=-1)
                hit = peak >= (text_lengths - 1)
                new_counter = counter + hit.astype(jnp.int32)
                new_finished = finished | (new_counter > grace_steps)
            valid = ~finished                      # this step still emits
            new_carry = (cell_carry, last_frame, new_finished, new_counter)
            return new_carry, (frame, weights, valid)

        scan = nn.scan(step, variable_broadcast="params",
                       split_rngs={"params": False, "dropout": True},
                       in_axes=0, out_axes=1, length=max_decoder_steps)
        _, (frames, alignments, valid) = scan(self.cell, carry, None)

        mel = frames.reshape(b, max_decoder_steps * r, self.d_mels)
        mel = mel + self.postnet(mel, deterministic=deterministic)
        valid_frames = jnp.repeat(valid, r, axis=1)       # (B, steps*r)
        mel = mel * valid_frames[..., None].astype(mel.dtype)
        lengths = jnp.sum(valid_frames.astype(jnp.int32), axis=1)
        return {"mel_outputs_postnet": mel, "lengths": lengths,
                "alignments": alignments}


def tacotron2_loss(outputs, mels, output_lengths, text_lengths,
                   *, use_stop_token_loss: bool = True,
                   use_guided_attention_loss: bool = False,
                   sigma: float = 0.2, stop_pos_weight: float = 1.0):
    """MSE + postnet-MSE (+ stop BCE with one-hot-at-end labels, + guided
    attention), mirroring the reference Tacotron2Loss
    (tacotron2.py:886-980): defaults match its sigma=0.2 and unweighted
    BCEWithLogitsLoss (pos_weight=1).  Intentional deviation: all terms
    are masked by output_lengths (the reference averages over padding
    too); ``stop_pos_weight`` is kept configurable for recipes that want
    the weighted-stop variant."""
    t_dec = mels.shape[1]
    mask = sequence_mask(output_lengths, t_dec).astype(mels.dtype)
    m3 = mask[..., None]
    n_el = jnp.maximum(jnp.sum(m3) * mels.shape[-1], 1.0)
    mel_loss = jnp.sum(
        jnp.square(outputs["mel_output"] - mels) * m3) / n_el
    post_loss = jnp.sum(
        jnp.square(outputs["mel_outputs_postnet"] - mels) * m3) / n_el
    losses = {"mel_loss": mel_loss, "postnet_mel_loss": post_loss}
    loss = mel_loss + post_loss
    if use_stop_token_loss:
        stop_logits = outputs["stop_logits"]          # (B, n_steps)
        n_steps = stop_logits.shape[1]
        r = t_dec // n_steps
        step_lengths = (output_lengths + r - 1) // r
        # one-hot stop label at the last valid decoder step
        idx = jnp.arange(n_steps)[None, :]
        labels = (idx == (step_lengths - 1)[:, None]).astype(
            stop_logits.dtype)
        step_mask = (idx < step_lengths[:, None]).astype(stop_logits.dtype)
        stop_loss = stop_token_bce(stop_logits, labels, mask=step_mask,
                                   pos_weight=stop_pos_weight)
        losses["stop_loss"] = stop_loss
        loss = loss + stop_loss
    if use_guided_attention_loss:
        n_steps = outputs["alignments"].shape[1]
        r = t_dec // n_steps
        attn_loss = guided_attention_loss(
            outputs["alignments"], (output_lengths + r - 1) // r,
            text_lengths, sigma)
        losses["guided_attn_loss"] = attn_loss
        loss = loss + attn_loss
    losses["loss"] = loss
    return losses
