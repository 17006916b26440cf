"""Sequence-parallel (ring) attention over a mesh axis.

The reference has no long-context machinery at all (SURVEY.md 5.7: it
crops or pads every sequence on the data side).  This module is the
additive TPU-native feature for long-form synthesis: self-attention over
a sequence that is *sharded across devices*, so the O(T^2) score matrix
never materializes on one chip and activations scale with T / n_devices.

Algorithm: flash-style online softmax with the K/V shards rotating
around the mesh axis via ``jax.lax.ppermute`` (one ICI hop per step, n
steps for n devices).  Each device keeps its Q shard resident and
accumulates (running max, normalizer, weighted sum) against every K/V
block as it passes by — compute overlaps the rotation, and the final
output is exact (identical to dense softmax attention up to float
associativity).

Use :func:`sequence_parallel_self_attention` from the host side with a
``Mesh``; use :func:`ring_attention` directly inside an existing
``shard_map``.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["ring_attention", "sequence_parallel_self_attention",
           "make_ring_attn_core"]

_NEG_INF = -1e30


def ring_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   kv_mask: Optional[jnp.ndarray] = None, *,
                   axis_name: str,
                   scale: Optional[float] = None) -> jnp.ndarray:
    """Exact self-attention with K/V ring-rotated over ``axis_name``.

    Must run inside ``shard_map`` (or ``pjit`` manual axes) where the
    time axis is sharded over ``axis_name``.

    Parameters
    ----------
    q, k, v : (B, T_local, H, D) — this device's sequence shard.
    kv_mask : (B, T_local) bool, optional — validity of the local K/V
        positions (padding mask).  Query rows are not masked here; mask
        or slice the output on the host side if needed.
    scale : defaults to D ** -0.5.

    Returns (B, T_local, H, D): the attention output for the local
    query shard, attending over the FULL global sequence.
    """
    n = jax.lax.psum(1, axis_name)
    scale = (q.shape[-1] ** -0.5) if scale is None else scale
    q = q * jnp.asarray(scale, q.dtype)

    b, t_local, h, d = q.shape

    def _vary(x):
        # the accumulators hold device-dependent values, so their
        # (device-invariant) inits must be marked varying over the ring
        # axis for the fori_loop carry types to line up under shard_map
        return jax.lax.pcast(x, (axis_name,), to="varying")

    m = _vary(jnp.full((b, h, t_local), _NEG_INF, jnp.float32))  # run max
    l = _vary(jnp.zeros((b, h, t_local), jnp.float32))        # normalizer
    acc = _vary(jnp.zeros((b, h, t_local, d), jnp.float32))
    if kv_mask is None:
        kv_mask = _vary(jnp.ones((b, k.shape[1]), bool))

    perm = [(i, (i + 1) % n) for i in range(n)]

    def step(i, carry):
        m, l, acc, k_blk, v_blk, mask_blk = carry
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k_blk,
                       preferred_element_type=jnp.float32)
        s = jnp.where(mask_blk[:, None, None, :], s, _NEG_INF)
        m_new = jnp.maximum(m, s.max(axis=-1))
        # exp(-inf - -inf) would be NaN; clamp the correction factor
        corr = jnp.exp(jnp.maximum(m - m_new, -80.0))
        p = jnp.exp(s - m_new[..., None])
        p = jnp.where(mask_blk[:, None, None, :], p, 0.0)
        l = l * corr + p.sum(axis=-1)
        acc = acc * corr[..., None] + jnp.einsum(
            "bhqk,bkhd->bhqd", p, v_blk,
            preferred_element_type=jnp.float32)
        # rotate the K/V block to the next device on the ring; after n
        # rotations every block is back home (one redundant final hop
        # keeps the loop body collective-uniform)
        k_blk, v_blk, mask_blk = (jax.lax.ppermute(x, axis_name, perm)
                                  for x in (k_blk, v_blk, mask_blk))
        return m_new, l, acc, k_blk, v_blk, mask_blk

    m, l, acc, _, _, _ = jax.lax.fori_loop(
        0, n, step, (m, l, acc, k, v, kv_mask))
    out = jnp.where(l[..., None] > 0, acc / jnp.maximum(l[..., None], 1e-30),
                    0.0)
    return out.transpose(0, 2, 1, 3).astype(q.dtype)   # (B, Tl, H, D)


def sequence_parallel_self_attention(
        mesh: Mesh, axis: str, q: jnp.ndarray, k: jnp.ndarray,
        v: jnp.ndarray, kv_mask: Optional[jnp.ndarray] = None,
        scale: Optional[float] = None) -> jnp.ndarray:
    """Host-side wrapper: shard the time axis of (B, T, H, D) q/k/v over
    ``mesh[axis]`` and run :func:`ring_attention`.

    T must be divisible by the axis size (pad + mask otherwise — the
    ``kv_mask`` keeps padded keys out of every softmax).
    """
    spec = P(None, axis)
    qkv_spec = P(None, axis, None, None)
    fn = partial(ring_attention, axis_name=axis, scale=scale)
    if kv_mask is None:
        shard_fn = jax.shard_map(
            lambda q, k, v: fn(q, k, v), mesh=mesh,
            in_specs=(qkv_spec, qkv_spec, qkv_spec), out_specs=qkv_spec)
        return shard_fn(q, k, v)
    shard_fn = jax.shard_map(
        fn, mesh=mesh,
        in_specs=(qkv_spec, qkv_spec, qkv_spec, spec),
        out_specs=qkv_spec)
    return shard_fn(q, k, v, kv_mask)


def make_ring_attn_core(mesh: Mesh, axis: str = "model"):
    """Build an ``attn_core`` for ``nn.MultiHeadAttention`` that runs
    the softmax core as sequence-parallel ring attention.

    Plugs into any attention site that accepts ``attn_core`` (e.g.
    ``FastSpeech2(decoder_attn_core=...)`` shards the decoder's frame
    axis for long-form synthesis).  The projected heads (B, T, H, dk)
    are sharded over ``mesh[axis]`` on T; the surrounding
    (LayerNorm/FFN/residual) ops stay under GSPMD auto-sharding, which
    keeps them local to the same shards.  T must be divisible by the
    axis size.

    The MHA-style ``mask`` (bool, (B, T) / (B, 1, Tk) / broadcastable
    (B, 1, Tq, Tk) padding mask) is reduced to the key-validity vector
    ring attention consumes; per-query masking (causal) is NOT
    supported here — this core is for padding-masked encoder/decoder
    stacks.
    """
    def core(q, k, v, mask):
        kv_mask = None
        if mask is not None:
            if mask.ndim == 4:          # (B, 1|H, 1, Tk)
                if mask.shape[2] != 1:
                    raise ValueError(
                        "ring attn_core supports key-padding masks only; "
                        f"got a per-query (causal?) mask of shape "
                        f"{mask.shape} — reducing it to one query row "
                        "would silently drop the causal structure")
                kv_mask = mask[:, 0, 0, :]
            elif mask.ndim == 3:        # (B, 1, Tk)
                kv_mask = mask[:, 0, :]
            else:                       # (B, Tk)
                kv_mask = mask
            kv_mask = jnp.broadcast_to(kv_mask, (q.shape[0], k.shape[1]))
        return sequence_parallel_self_attention(mesh, axis, q, k, v,
                                                kv_mask)
    return core
