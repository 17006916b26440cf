"""Tensor reorganization helpers (reference:
parakeet/modules/geometry.py:18 shuffle_dim, modules/expansion.py)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["shuffle_dim", "time_shift"]


def shuffle_dim(x: jnp.ndarray, axis: int, perm=None,
                rng: jax.Array | None = None) -> jnp.ndarray:
    """Permute ``x`` along ``axis``.

    ``perm`` may be a static permutation (list/array); otherwise a random
    permutation is drawn from ``rng`` (functional replacement for the
    reference's in-place random shuffle, geometry.py:18 — used for the
    WaveFlow row permutations).
    """
    if perm is None:
        if rng is None:
            raise ValueError("provide either perm or rng")
        perm = jax.random.permutation(rng, x.shape[axis])
    perm = jnp.asarray(perm)
    return jnp.take(x, perm, axis=axis)


def time_shift(x: jnp.ndarray, off: int) -> jnp.ndarray:
    """(B, T, C) -> y with y[:, t] = x[:, t + off], zero outside [0, T)
    (the shifted view behind the shifted-matmul conv formulations)."""
    if off == 0:
        return x
    t = x.shape[1]
    if off > 0:
        return jnp.pad(x, ((0, 0), (0, off), (0, 0)))[:, off:]
    return jnp.pad(x, ((0, 0), (-off, 0), (0, 0)))[:, :t]
