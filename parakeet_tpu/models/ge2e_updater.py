"""GE2E speaker-encoder training step (jitted).

Equivalent of the reference's GE2E training loop (reference:
examples/ge2e/train.py:19-80) as a pure function: embed the (N x M)
utterance batch, GE2E loss, scale the (w, b) grads x0.01
(``do_gradient_ops``), clip, update.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from ..training.state import TrainState
from .lstm_speaker_encoder import (LSTMSpeakerEncoder, ge2e_loss,
                                   scale_wb_gradients)

__all__ = ["init_ge2e_train_state", "make_ge2e_train_step"]


def init_ge2e_train_state(model, tx, rng, sample_batch,
                          n_speakers: int) -> TrainState:
    init_rng, state_rng = jax.random.split(rng)
    variables = model.init(init_rng, jnp.asarray(sample_batch["utterances"]),
                           n_speakers,
                           method=LSTMSpeakerEncoder.embed_sequences)
    return TrainState(step=jnp.zeros((), jnp.int32),
                      params=variables["params"],
                      opt_state=tx.init(variables["params"]),
                      rng=state_rng)


def make_ge2e_train_step(model, tx, n_speakers: int, *,
                         wb_grad_scale: float = 0.01, jit: bool = True):
    def train_step(state: TrainState, batch):
        def loss_fn(params):
            embeds, (w, b) = model.apply(
                {"params": params}, batch["utterances"], n_speakers,
                method=LSTMSpeakerEncoder.embed_sequences)
            loss, metrics = ge2e_loss(embeds, w, b)
            return loss, metrics

        (_, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        grads = scale_wb_gradients(grads, wb_grad_scale)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params,
                                  opt_state=opt_state)
        out = {k: v for k, v in metrics.items() if k != "sim"}
        return new_state, out

    if jit:
        return jax.jit(train_step, donate_argnums=0)
    return train_step
