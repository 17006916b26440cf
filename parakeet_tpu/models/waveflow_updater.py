"""WaveFlow training/eval steps (jitted).

Equivalent of the reference's WaveFlow experiment loop (reference:
examples/waveflow/train.py:18-115) as pure functions.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from ..training.state import TrainState
from .waveflow import waveflow_loss

__all__ = ["init_waveflow_train_state", "make_waveflow_train_step",
           "make_waveflow_eval_step"]


def init_waveflow_train_state(model, tx, rng, sample_batch) -> TrainState:
    init_rng, state_rng = jax.random.split(rng)
    variables = model.init(init_rng, jnp.asarray(sample_batch["wav"]),
                           jnp.asarray(sample_batch["mel"]))
    return TrainState(step=jnp.zeros((), jnp.int32),
                      params=variables["params"],
                      opt_state=tx.init(variables["params"]),
                      rng=state_rng)


def make_waveflow_train_step(model, tx, *, sigma: float = 1.0,
                             jit: bool = True):
    def train_step(state: TrainState, batch):
        def loss_fn(params):
            z, logs_sum = model.apply({"params": params}, batch["wav"],
                                      batch["mel"])
            losses = waveflow_loss(z, logs_sum, sigma)
            return losses["loss"], losses

        (_, losses), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params,
                                  opt_state=opt_state)
        return new_state, dict(losses)

    if jit:
        return jax.jit(train_step, donate_argnums=0)
    return train_step


def make_waveflow_eval_step(model, *, sigma: float = 1.0, jit: bool = True):
    def eval_step(state: TrainState, batch):
        z, logs_sum = model.apply({"params": state.params}, batch["wav"],
                                  batch["mel"])
        return waveflow_loss(z, logs_sum, sigma)

    if jit:
        return jax.jit(eval_step)
    return eval_step
