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

__all__ = ["seed_everything", "configure_rng_impl"]


def configure_rng_impl(impl: str) -> None:
    """Select the device RNG algorithm ('threefry2x32' | 'rbg').

    TPU-first knob: threefry (the JAX default, fully reproducible
    across backends) computes its hash on the VPU and dominates
    dropout-heavy training steps — switching FastSpeech2 bs32 bf16 to
    the counter-based 'rbg' generator measured **644 → 1078 seq/s
    (+67%)** (docs/tpu_performance.md round 5).  rbg draws differ from
    threefry's (same statistics, different streams) and its raw key is
    uint32[4] vs threefry's uint32[2], so snapshots must be resumed
    under the SAME impl they trained with (the rng leaf's shape is
    part of the state).  Call BEFORE any key is made; recipes expose
    it as ``rng_impl`` in the training config.
    """
    if impl in ("threefry", "threefry2x32"):
        jax.config.update("jax_default_prng_impl", "threefry2x32")
    elif impl == "rbg":
        jax.config.update("jax_default_prng_impl", "rbg")
    else:
        raise ValueError(f"unknown rng impl: {impl!r} "
                         "(expected 'threefry' or 'rbg')")


def seed_everything(seed: int, rng_impl: str | None = None) -> jax.Array:
    if rng_impl is not None:
        configure_rng_impl(rng_impl)
    random.seed(seed)
    np.random.seed(seed)
    logging.getLogger(__name__).debug("Set the seed of python/numpy to %d",
                                      seed)
    return jax.random.PRNGKey(seed)
