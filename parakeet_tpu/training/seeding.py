"""Deterministic seeding across all RNG domains.

Equivalent of the reference's seed_everything (reference:
parakeet/training/seeding.py:21), adapted to JAX's functional RNG: python
and numpy global RNGs are seeded in place; the returned ``jax.random`` key
is the root for all device-side randomness (dropout, noise) — pass it into
train state rather than relying on global state.
"""
from __future__ import annotations

import logging
import random

import jax
import numpy as np

__all__ = ["seed_everything"]


def seed_everything(seed: int) -> jax.Array:
    random.seed(seed)
    np.random.seed(seed)
    logging.getLogger(__name__).debug("Set the seed of python/numpy to %d",
                                      seed)
    return jax.random.PRNGKey(seed)
