"""Sinusoidal positional encodings (functional).

Same table as the reference (parakeet/modules/positional_encoding.py:20 and
parakeet/modules/fastspeech2_transformer/embedding.py:21): even channels sin,
odd channels cos, geometric frequency ladder over 1e4.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["sinusoid_position_encoding"]


def sinusoid_position_encoding(num_positions: int,
                               feature_size: int,
                               omega: float | jnp.ndarray = 1.0,
                               start_pos: int | jnp.ndarray = 0,
                               dtype=jnp.float32) -> jnp.ndarray:
    """(num_positions, feature_size) sinusoid table.

    ``pe[p, 2i] = sin(omega * (start_pos + p) / 10000^(2i / D))`` and cos for
    odd channels.
    """
    channel = jnp.arange(0, feature_size, 2, dtype=dtype)
    index = jnp.arange(num_positions, dtype=dtype) + start_pos
    denom = jnp.power(1e4, channel / feature_size)
    angle = omega * index[:, None] / denom[None, :]
    pe = jnp.zeros((num_positions, feature_size), dtype=dtype)
    pe = pe.at[:, 0::2].set(jnp.sin(angle))
    pe = pe.at[:, 1::2].set(jnp.cos(angle[:, :feature_size // 2]))
    return pe
