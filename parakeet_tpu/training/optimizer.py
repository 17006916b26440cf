"""Optimizer and LR-schedule factories (optax).

Equivalent of the reference's optimizer factory and schedulers (reference:
parakeet/training/optimizer.py:17-46, parakeet/utils/scheduler.py:20-60,
PWG's StepDecay usage parallel_wavegan_updater.py:36-60), expressed as
optax gradient transformations so they compose into a single jitted step.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import optax

__all__ = ["build_optimizer", "step_decay_schedule", "piecewise_schedule",
           "constant_schedule"]


def constant_schedule(value: float):
    return optax.constant_schedule(value)


def step_decay_schedule(learning_rate: float, step_size: int,
                        gamma: float = 0.5):
    """lr * gamma^(step // step_size) — paddle StepDecay semantics."""
    def schedule(count):
        return learning_rate * gamma ** (count // step_size)
    return schedule


def piecewise_schedule(boundaries: Sequence[int], values: Sequence[float]):
    """values[i] for step in [boundaries[i-1], boundaries[i])."""
    if len(values) != len(boundaries) + 1:
        raise ValueError("need len(values) == len(boundaries) + 1")

    def schedule(count):
        lr = jnp.asarray(values[0], dtype=jnp.float32)
        for b, v in zip(boundaries, values[1:]):
            lr = jnp.where(count >= b, v, lr)
        return lr
    return schedule


_OPTIMIZERS = {
    "adadelta": optax.adadelta,
    "adagrad": optax.adagrad,
    "adam": optax.adam,
    "adamw": optax.adamw,
    "adamax": optax.adamax,
    "lamb": optax.lamb,
    "momentum": lambda lr, momentum=0.9, **kw: optax.sgd(
        lr, momentum=momentum, **kw),
    "rmsprop": optax.rmsprop,
    "sgd": optax.sgd,
}


def build_optimizer(optim: str = "adam",
                    learning_rate=0.001,
                    max_grad_norm: Optional[float] = None,
                    weight_decay: Optional[float] = None,
                    **kwargs) -> optax.GradientTransformation:
    """Name -> optax chain, with optional global-norm clipping.

    ``learning_rate`` may be a float or an optax schedule (callable).
    Mirrors the reference factory's surface (optimizer.py:17-45) including
    ClipGradByGlobalNorm via ``max_grad_norm``.
    """
    name = optim.lower()
    if name not in _OPTIMIZERS:
        raise ValueError(
            f"unknown optimizer {optim!r}; available: {sorted(_OPTIMIZERS)}")
    factory = _OPTIMIZERS[name]
    if weight_decay and name in ("adamw", "lamb"):
        kwargs["weight_decay"] = weight_decay
    tx = factory(learning_rate, **kwargs)
    if weight_decay and name not in ("adamw", "lamb"):
        tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
    if max_grad_norm:
        tx = optax.chain(optax.clip_by_global_norm(max_grad_norm), tx)
    return tx
