"""Tensor reorganization helpers (reference:
parakeet/modules/geometry.py:18 shuffle_dim, modules/expansion.py)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["shuffle_dim"]


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
