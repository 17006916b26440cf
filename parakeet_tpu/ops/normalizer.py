"""In-graph feature normalization.

JAX version of the reference's ZScore layer
(reference: parakeet/modules/normalizer.py:18): models are trained on
Z-scored features; inference wrappers apply the inverse transform before
vocoding.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["ZScore"]


class ZScore:
    """Elementwise (x - mu) / sigma with stored statistics.

    ``mu`` and ``sigma`` are (D,) arrays broadcast over leading axes.
    """

    def __init__(self, mu, sigma):
        self.mu = jnp.asarray(mu)
        self.sigma = jnp.asarray(sigma)

    def transform(self, x):
        return (x - self.mu) / self.sigma

    def inverse(self, z):
        return z * self.sigma + self.mu

    __call__ = transform
