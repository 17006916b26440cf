"""Masking primitives (device side, static shapes).

TPU-first replacements for the reference's masking helpers
(reference: parakeet/modules/masking.py, parakeet/modules/nets_utils.py:54-125,
parakeet/modules/masked_fill.py:28).  All functions take an explicit static
``maxlen`` so they trace cleanly under jit — the reference derives maxlen from
dynamic data, which would force recompilation.

Conventions:
- ``sequence_mask`` / ``make_non_pad_mask``: True at *valid* positions.
- ``make_pad_mask``: True at *padded* positions (ESPnet convention).
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "sequence_mask", "make_pad_mask", "make_non_pad_mask", "future_mask",
    "combine_mask", "masked_fill",
]


def sequence_mask(lengths: jnp.ndarray, maxlen: int,
                  dtype=jnp.bool_) -> jnp.ndarray:
    """(…,) lengths -> (…, maxlen) mask, True where index < length."""
    pos = jnp.arange(maxlen)
    return (pos < lengths[..., None]).astype(dtype)


def make_non_pad_mask(lengths: jnp.ndarray, maxlen: int) -> jnp.ndarray:
    return sequence_mask(lengths, maxlen)


def make_pad_mask(lengths: jnp.ndarray, maxlen: int) -> jnp.ndarray:
    return ~sequence_mask(lengths, maxlen)


def future_mask(size: int, dtype=jnp.bool_) -> jnp.ndarray:
    """(size, size) lower-triangular causal mask (True = attendable)."""
    return jnp.tril(jnp.ones((size, size), dtype=dtype))


def combine_mask(*masks: jnp.ndarray) -> jnp.ndarray:
    """Logical-and of broadcastable boolean masks."""
    out = masks[0]
    for m in masks[1:]:
        out = jnp.logical_and(out, m)
    return out


def masked_fill(x: jnp.ndarray, mask: jnp.ndarray, value) -> jnp.ndarray:
    """Set ``x`` to ``value`` where ``mask`` is True (broadcasting)."""
    return jnp.where(mask, jnp.asarray(value, dtype=x.dtype), x)
