"""Train state pytree.

The TPU-first replacement for the reference's mutable model/optimizer pair
(reference: parakeet/training/updater.py:21-85): every piece of mutable
training state lives in one immutable pytree that a jitted step maps to the
next state.  Buffers are donated, so the update is in-place on device.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

__all__ = ["TrainState", "create_train_state"]


@flax.struct.dataclass
class TrainState:
    """step + params (+ batch_stats) + optimizer state + rng.

    ``params`` / ``opt_state`` may be nested dicts holding several networks
    (e.g. {"generator": ..., "discriminator": ...} for GAN training).
    """
    step: jnp.ndarray
    params: Any
    opt_state: Any
    batch_stats: Any = None
    rng: Optional[jax.Array] = None


def create_train_state(params, tx: optax.GradientTransformation,
                       batch_stats=None, rng=None) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        batch_stats=batch_stats,
        rng=rng,
    )
