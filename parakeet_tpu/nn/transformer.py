"""Transformer building blocks (flax.linen).

TPU-native equivalents of the reference's ESPnet-derived transformer stack
(reference: parakeet/modules/fastspeech2_transformer/{attention.py:24,
encoder.py:27, encoder_layer.py:19, decoder.py:36, multi_layer_conv.py:18,
embedding.py:21}).  Differences from the reference by design:

- NLC layout end to end (no NCL transposes): flax convs are feature-last,
  which is also the natural TPU layout.
- attention is one fused einsum pair per layer, batched over heads, with an
  additive mask — no per-head python loops.
- ``dtype`` threads a compute dtype (use bfloat16 on TPU) while parameters
  stay float32.
- decoding uses an explicit KV-cache carried through ``lax.scan`` (see
  ``models/transformer_tts.py``) instead of python-side cache lists.
"""
from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.positional import sinusoid_position_encoding

__all__ = [
    "MultiHeadAttention", "PositionwiseFeedForward", "MultiLayerConv",
    "PositionalEncoding", "ScaledPositionalEncoding", "EncoderLayer",
    "TransformerEncoder", "DecoderLayer", "TransformerDecoder",
]

_NEG_INF = -1e9


class PositionalEncoding(nn.Module):
    """x * sqrt(d) + PE, then dropout (ESPnet convention).

    ``init_alpha``: initial value of the learnable scale of the scaled
    variant (reference transformer_tts.py:370-386 _reset_parameters).
    """
    d_model: int
    dropout_rate: float = 0.1
    scaled: bool = False  # learnable alpha variant: x + alpha * PE
    init_alpha: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True,
                 start_pos: int = 0, pe: Optional[jnp.ndarray] = None
                 ) -> jnp.ndarray:
        t = x.shape[1]
        if pe is None:
            pe = sinusoid_position_encoding(t, self.d_model,
                                            start_pos=start_pos,
                                            dtype=self.dtype)[None]
        # else: caller precomputed the (1, t, d) PE rows (AR decode
        # slices a hoisted full table instead of re-deriving sin/cos
        # inside the loop)
        if self.scaled:
            alpha = self.param(
                "alpha", nn.initializers.constant(self.init_alpha), (1,))
            x = x + alpha.astype(self.dtype) * pe
        else:
            x = x * jnp.sqrt(jnp.asarray(self.d_model, self.dtype)) + pe
        return nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)


def ScaledPositionalEncoding(d_model, dropout_rate=0.1, init_alpha=1.0,
                             dtype=jnp.float32):
    return PositionalEncoding(d_model, dropout_rate, scaled=True,
                              init_alpha=init_alpha, dtype=dtype)


class MultiHeadAttention(nn.Module):
    """Multi-head scaled dot-product attention.

    ``mask``: bool, True = attendable; broadcastable to (B, 1, Tq, Tk).
    Returns (output, attn_weights (B, H, Tq, Tk)).

    ``attn_core``: optional replacement for the dense softmax core —
    a callable ``(q, k, v, mask) -> (B, T, H, dk)`` over the projected
    heads.  Used to swap in sequence-parallel ring attention
    (parallel/ring_attention.py) for long-form synthesis; attention
    weights are then returned as None.  Parameter shapes/names are
    unchanged, so any checkpoint loads in either mode.
    """
    n_heads: int
    d_model: int
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32
    attn_core: Optional[Callable] = None

    def setup(self):
        d_k = self.d_model // self.n_heads
        heads = (self.n_heads, d_k)
        self.q = nn.DenseGeneral(heads, dtype=self.dtype)
        self.k = nn.DenseGeneral(heads, dtype=self.dtype)
        self.v = nn.DenseGeneral(heads, dtype=self.dtype)
        self.out = nn.DenseGeneral(self.d_model, axis=(-2, -1),
                                   dtype=self.dtype)
        self.attn_dropout = nn.Dropout(self.dropout_rate)

    def project_kv(self, key, value):
        """Projected (K, V) heads — for hoisting loop-invariant
        cross-attention projections out of an AR decode loop (pass the
        result back via ``kv=``)."""
        return self.k(key), self.v(value)

    def __call__(self, query, key, value, mask=None, *,
                 deterministic: bool = True, cache=None, kv=None):
        d_k = self.d_model // self.n_heads
        if (cache is not None and "index" in cache
                and query is key and key is value
                and not self.is_initializing()):
            # AR-decode self-attention fast path: one fused QKV matmul.
            # The decode while-loop streams every weight tensor from HBM
            # each step (profiled: the step is dominated by weight
            # slice/copy ops, not FLOPs), so one (d, 3*d) operand beats
            # three (d, d) ones; the concat of loop-invariant params is
            # hoisted out of the loop by XLA.  Same math bit-for-bit per
            # output column.
            d = query.shape[-1]
            ps = [m.variables["params"] for m in (self.q, self.k, self.v)]
            w = jnp.concatenate(
                [p["kernel"].reshape(d, -1) for p in ps],
                axis=1).astype(self.dtype)           # (d, 3*H*dk)
            bias = jnp.concatenate(
                [p["bias"].reshape(-1) for p in ps]).astype(self.dtype)
            qkv = query.astype(self.dtype) @ w + bias
            q, k, v = (a.reshape(query.shape[:-1] + (self.n_heads, d_k))
                       for a in jnp.split(qkv, 3, axis=-1))
        else:
            q = self.q(query)                       # (B, Tq, H, dk)
            if kv is not None:
                k, v = kv
            else:
                k, v = self.k(key), self.v(value)
        if self.attn_core is not None:
            # cores built by make_auto_attn_core fall back to the dense
            # path (instead of raising) for configurations no custom
            # core serves, and return None below their win threshold
            auto = getattr(self.attn_core, "dense_fallback", False)
            if cache is not None:
                if not auto:
                    raise ValueError(
                        "attn_core does not support KV caches")
            elif self.dropout_rate > 0.0 and not deterministic:
                if not auto:
                    raise ValueError(
                        "attn_core skips attention dropout; training "
                        f"with dropout_rate={self.dropout_rate} and a "
                        "custom core would silently lose regularization "
                        "(set the rate to 0 or train with the dense "
                        "path)")
            else:
                core_out = self.attn_core(q, k, v, mask)
                if core_out is not None:
                    return self.out(core_out.astype(self.dtype)), None, None
        new_cache = None
        if cache is not None:
            if "index" in cache:
                # scan-friendly decode: fixed-size preallocated cache
                # (B, T_max, H, dk) written in place at ``index`` — static
                # shapes, so the whole AR loop stays one XLA while-loop.
                idx = cache["index"]
                k = jax.lax.dynamic_update_slice(
                    cache["k"], k.astype(cache["k"].dtype), (0, idx, 0, 0))
                v = jax.lax.dynamic_update_slice(
                    cache["v"], v.astype(cache["v"].dtype), (0, idx, 0, 0))
                new_cache = {"k": k, "v": v, "index": idx + query.shape[1]}
            else:
                # python-loop decode: append (dynamic shapes, host loop)
                k = jnp.concatenate([cache["k"], k], axis=1)
                v = jnp.concatenate([cache["v"], v], axis=1)
                new_cache = {"k": k, "v": v}
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores / jnp.sqrt(jnp.asarray(d_k, jnp.float32))
        if mask is not None:
            if mask.ndim == 3:
                mask = mask[:, None]               # (B, 1, Tq, Tk)
            scores = jnp.where(mask, scores, _NEG_INF)
        attn = nn.softmax(scores.astype(jnp.float32), axis=-1).astype(
            self.dtype)
        attn = self.attn_dropout(attn, deterministic=deterministic)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v,
                         preferred_element_type=jnp.float32).astype(
            self.dtype)
        return self.out(out), attn, new_cache


class PositionwiseFeedForward(nn.Module):
    """linear -> relu -> dropout -> linear."""
    hidden_units: int
    d_model: int
    dropout_rate: float = 0.1
    activation: Callable = nn.relu
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        h = nn.Dense(self.hidden_units, dtype=self.dtype)(x)
        h = self.activation(h)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        return nn.Dense(self.d_model, dtype=self.dtype)(h)


class MultiLayerConv(nn.Module):
    """conv1d -> relu -> dropout -> conv1d, feature-last.

    The FastSpeech positionwise variant (reference:
    parakeet/modules/fastspeech2_transformer/multi_layer_conv.py:18-120);
    ``second_linear`` selects the Conv1dLinear flavor.
    """
    hidden_units: int
    d_model: int
    kernel_size: int = 1
    dropout_rate: float = 0.1
    second_linear: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        h = nn.Conv(self.hidden_units, (self.kernel_size,), padding="SAME",
                    dtype=self.dtype)(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        if self.second_linear:
            return nn.Dense(self.d_model, dtype=self.dtype)(h)
        return nn.Conv(self.d_model, (self.kernel_size,), padding="SAME",
                       dtype=self.dtype)(h)


def _make_positionwise(layer_type: str, units: int, d_model: int,
                       kernel_size: int, dropout: float, dtype):
    if layer_type == "linear":
        return PositionwiseFeedForward(units, d_model, dropout, dtype=dtype)
    if layer_type == "conv1d":
        return MultiLayerConv(units, d_model, kernel_size, dropout,
                              dtype=dtype)
    if layer_type == "conv1d-linear":
        return MultiLayerConv(units, d_model, kernel_size, dropout,
                              second_linear=True, dtype=dtype)
    raise ValueError(f"unknown positionwise layer type {layer_type!r}")


class EncoderLayer(nn.Module):
    """Self-attention encoder layer, pre- or post-LN, concat_after option."""
    d_model: int
    n_heads: int
    units: int
    dropout_rate: float = 0.1
    attn_dropout_rate: float = 0.0
    normalize_before: bool = True
    concat_after: bool = False
    positionwise_layer_type: str = "linear"
    positionwise_conv_kernel_size: int = 1
    dtype: jnp.dtype = jnp.float32
    attn_core: Optional[Callable] = None

    @nn.compact
    def __call__(self, x, mask=None, *, deterministic: bool = True):
        residual = x
        if self.normalize_before:
            x = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        attn_out, attn_w, _ = MultiHeadAttention(
            self.n_heads, self.d_model, self.attn_dropout_rate,
            dtype=self.dtype, attn_core=self.attn_core,
            name="self_attn")(
                x, x, x, mask, deterministic=deterministic)
        if self.concat_after:
            x = residual + nn.Dense(self.d_model, dtype=self.dtype,
                                    name="concat_proj")(
                jnp.concatenate([x, attn_out], axis=-1))
        else:
            x = residual + nn.Dropout(self.dropout_rate)(
                attn_out, deterministic=deterministic)
        if not self.normalize_before:
            x = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)

        residual = x
        if self.normalize_before:
            x = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        ff = _make_positionwise(
            self.positionwise_layer_type, self.units, self.d_model,
            self.positionwise_conv_kernel_size, self.dropout_rate,
            self.dtype)(x, deterministic=deterministic)
        x = residual + nn.Dropout(self.dropout_rate)(
            ff, deterministic=deterministic)
        if not self.normalize_before:
            x = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        return x, attn_w


class TransformerEncoder(nn.Module):
    """Token- or feature-input transformer encoder.

    ``input_layer``: "embed" (token ids), "linear" (project features), or
    None (features already d_model wide).  Returns (hs, attn_stack) where
    attn_stack is (L, B, H, T, T) — useful for guided-attention losses and
    alignment plots.
    """
    d_model: int = 384
    n_heads: int = 4
    units: int = 1536
    num_layers: int = 6
    input_layer: Optional[str] = "embed"
    vocab_size: int = 0
    dropout_rate: float = 0.1
    positional_dropout_rate: float = 0.1
    attn_dropout_rate: float = 0.0
    use_scaled_pos_enc: bool = True
    init_alpha: float = 1.0
    normalize_before: bool = True
    concat_after: bool = False
    positionwise_layer_type: str = "conv1d"
    positionwise_conv_kernel_size: int = 1
    padding_idx: int = 0
    dtype: jnp.dtype = jnp.float32
    attn_core: Optional[Callable] = None
    # optional replacement for the serial layer loop — e.g. the
    # pipeline-parallel runner (parallel/pipeline.py
    # make_pp_layer_runner).  When set, the L layers' params are
    # declared depth-STACKED under one 'layers' collection (leading dim
    # L on every leaf; convert a standard checkpoint with
    # parallel.stack_layer_params) and the runner computes the stack:
    # runner(layer_module, stacked_params, x, mask, deterministic,
    # dropout_key) -> x.  Per-layer attention weights are unavailable
    # on this path (attn_stack returns None).
    layer_runner: Optional[Callable] = None

    @nn.compact
    def __call__(self, xs, mask=None, *, deterministic: bool = True):
        if self.input_layer == "embed":
            emb = nn.Embed(self.vocab_size, self.d_model,
                           dtype=self.dtype, name="embed")(xs)
            # zero out padding ids (paddle Embedding padding_idx semantics)
            emb = emb * (xs != self.padding_idx)[..., None].astype(emb.dtype)
            x = emb
        elif self.input_layer == "linear":
            x = nn.Dense(self.d_model, dtype=self.dtype, name="embed")(xs)
        elif self.input_layer is None:
            x = xs
        else:
            raise ValueError(f"unknown input_layer {self.input_layer!r}")
        x = PositionalEncoding(
            self.d_model, self.positional_dropout_rate,
            scaled=self.use_scaled_pos_enc, init_alpha=self.init_alpha,
            dtype=self.dtype,
            name="pos_enc")(x, deterministic=deterministic)

        if self.layer_runner is not None:
            x = self._run_pipelined(x, mask, deterministic)
            attn_stack = None
        else:
            attns = []
            for i in range(self.num_layers):
                x, attn = EncoderLayer(
                    self.d_model, self.n_heads, self.units,
                    self.dropout_rate, self.attn_dropout_rate,
                    self.normalize_before, self.concat_after,
                    self.positionwise_layer_type,
                    self.positionwise_conv_kernel_size,
                    dtype=self.dtype, attn_core=self.attn_core,
                    name=f"layer_{i}")(
                        x, mask, deterministic=deterministic)
                attns.append(attn)
            # attn weights unavailable when a custom attn_core is in use
            attn_stack = None if attns[0] is None else jnp.stack(attns)
        if self.normalize_before:
            x = nn.LayerNorm(dtype=self.dtype, name="after_norm")(x)
        return x, attn_stack

    def _run_pipelined(self, x, mask, deterministic):
        """layer_runner path: depth-stacked layer params, runner owns
        the loop (see the ``layer_runner`` field comment)."""
        layer = EncoderLayer(
            self.d_model, self.n_heads, self.units, self.dropout_rate,
            self.attn_dropout_rate, self.normalize_before,
            self.concat_after, self.positionwise_layer_type,
            self.positionwise_conv_kernel_size, dtype=self.dtype,
            attn_core=self.attn_core, parent=None)   # unbound template

        def init_stack(rng):
            dummy = jnp.zeros((1, 4, self.d_model), jnp.float32)
            keys = jax.random.split(rng, self.num_layers)
            return jax.vmap(
                lambda k: layer.init(k, dummy)["params"])(keys)

        stacked = self.param("layers", init_stack)
        key = (self.make_rng("dropout")
               if not deterministic and self.has_rng("dropout") else None)
        return self.layer_runner(layer, stacked, x, mask,
                                 deterministic=deterministic,
                                 dropout_key=key)


class DecoderLayer(nn.Module):
    """Masked self-attention + cross-attention decoder layer (pre/post-LN).

    When ``cache`` is given (incremental decode) the query is the new step
    only and self-attention keys/values extend the cache.
    """
    d_model: int
    n_heads: int
    units: int
    dropout_rate: float = 0.1
    attn_dropout_rate: float = 0.0
    src_attn_dropout_rate: Optional[float] = None  # None: attn_dropout_rate
    normalize_before: bool = True
    concat_after: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.norm1 = nn.LayerNorm(dtype=self.dtype)
        self.norm2 = nn.LayerNorm(dtype=self.dtype)
        self.norm3 = nn.LayerNorm(dtype=self.dtype)
        self.self_attn = MultiHeadAttention(
            self.n_heads, self.d_model, self.attn_dropout_rate,
            dtype=self.dtype)
        src_rate = (self.attn_dropout_rate
                    if self.src_attn_dropout_rate is None
                    else self.src_attn_dropout_rate)
        self.src_attn = MultiHeadAttention(
            self.n_heads, self.d_model, src_rate, dtype=self.dtype)
        self.ff = PositionwiseFeedForward(
            self.units, self.d_model, self.dropout_rate, dtype=self.dtype)
        self.dropout = nn.Dropout(self.dropout_rate)
        if self.concat_after:
            self.concat_proj1 = nn.Dense(self.d_model, dtype=self.dtype)
            self.concat_proj2 = nn.Dense(self.d_model, dtype=self.dtype)

    def cross_kv(self, memory):
        """This layer's projected cross-attention (K, V) over the
        encoder memory — loop-invariant during AR decode; precompute
        once and pass back via ``cross_kv=``."""
        return self.src_attn.project_kv(memory, memory)

    def __call__(self, x, memory, self_mask=None, cross_mask=None, *,
                 deterministic: bool = True, cache=None, cross_kv=None):
        residual = x
        if self.normalize_before:
            x = self.norm1(x)
        sa_out, sa_w, new_cache = self.self_attn(
            x, x, x, self_mask, deterministic=deterministic, cache=cache)
        if self.concat_after:
            x = residual + self.concat_proj1(
                jnp.concatenate([x, sa_out], axis=-1))
        else:
            x = residual + self.dropout(sa_out,
                                        deterministic=deterministic)
        if not self.normalize_before:
            x = self.norm1(x)

        residual = x
        if self.normalize_before:
            x = self.norm2(x)
        ca_out, ca_w, _ = self.src_attn(
            x, memory, memory, cross_mask, deterministic=deterministic,
            kv=cross_kv)
        if self.concat_after:
            x = residual + self.concat_proj2(
                jnp.concatenate([x, ca_out], axis=-1))
        else:
            x = residual + self.dropout(ca_out,
                                        deterministic=deterministic)
        if not self.normalize_before:
            x = self.norm2(x)

        residual = x
        if self.normalize_before:
            x = self.norm3(x)
        ff = self.ff(x, deterministic=deterministic)
        x = residual + self.dropout(ff, deterministic=deterministic)
        if not self.normalize_before:
            x = self.norm3(x)
        return x, (sa_w, ca_w), new_cache


class TransformerDecoder(nn.Module):
    """Decoder stack with feature prenet input ("linear" input layer).

    Returns (hs, self_attns (L,B,H,Tq,Tq), cross_attns (L,B,H,Tq,Tk)).
    """
    d_model: int = 384
    n_heads: int = 4
    units: int = 1536
    num_layers: int = 6
    dropout_rate: float = 0.1
    positional_dropout_rate: float = 0.1
    attn_dropout_rate: float = 0.0
    src_attn_dropout_rate: Optional[float] = None
    use_scaled_pos_enc: bool = True
    init_alpha: float = 1.0
    normalize_before: bool = True
    concat_after: bool = False
    input_layer: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        if self.input_layer == "linear":
            self.input_proj = nn.Dense(self.d_model, dtype=self.dtype)
        self.pos_enc = PositionalEncoding(
            self.d_model, self.positional_dropout_rate,
            scaled=self.use_scaled_pos_enc, init_alpha=self.init_alpha,
            dtype=self.dtype)
        self.layers = [DecoderLayer(
            self.d_model, self.n_heads, self.units,
            self.dropout_rate, self.attn_dropout_rate,
            self.src_attn_dropout_rate,
            self.normalize_before, self.concat_after,
            dtype=self.dtype, name=f"layer_{i}")
            for i in range(self.num_layers)]
        if self.normalize_before:
            self.after_norm = nn.LayerNorm(dtype=self.dtype)

    def precompute_cross_kv(self, memory):
        """Per-layer cross-attention (K, V) projections of the encoder
        memory — loop-invariant during AR decode.  Hoist this out of
        the decode scan and feed the result back via ``cross_kvs=``;
        it removes the two largest matmuls per layer per step."""
        return [layer.cross_kv(memory) for layer in self.layers]

    def __call__(self, xs, memory, self_mask=None, cross_mask=None, *,
                 deterministic: bool = True, caches=None, start_pos: int = 0,
                 cross_kvs=None, pos_pe=None):
        x = xs
        if self.input_layer == "linear":
            x = self.input_proj(x)
        x = self.pos_enc(x, deterministic=deterministic,
                         start_pos=start_pos, pe=pos_pe)
        self_attns, cross_attns, new_caches = [], [], []
        for i, layer in enumerate(self.layers):
            cache_i = None if caches is None else caches[i]
            kv_i = None if cross_kvs is None else cross_kvs[i]
            x, (sa, ca), nc = layer(
                x, memory, self_mask, cross_mask,
                deterministic=deterministic, cache=cache_i,
                cross_kv=kv_i)
            self_attns.append(sa)
            cross_attns.append(ca)
            new_caches.append(nc)
        if self.normalize_before:
            x = self.after_norm(x)
        out = (x, jnp.stack(self_attns), jnp.stack(cross_attns))
        if caches is not None:
            return out + (new_caches,)
        return out
