"""Tacotron2 training/eval steps (jitted).

Equivalent of the reference's ExperimentBase-style Tacotron2 training loop
(reference: examples/tacotron2/train.py and
examples/tacotron2_aishell3/train.py:36-120) as pure functions: forward +
loss + grad + optimizer update in one XLA program, with the encoder/postnet
BatchNorm statistics carried in TrainState.batch_stats.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from ..training.state import TrainState
from .tacotron2 import tacotron2_loss

__all__ = ["init_tacotron2_train_state", "make_tacotron2_train_step",
           "make_tacotron2_eval_step", "make_tacotron2_predict_step"]


def _model_args(batch):
    return dict(tones=batch.get("tones"),
                global_condition=batch.get("spk_emb"))


def init_tacotron2_train_state(model, tx, rng, sample_batch) -> TrainState:
    init_rng, dropout_rng, state_rng = jax.random.split(rng, 3)
    variables = model.init(
        {"params": init_rng, "dropout": dropout_rng},
        jnp.asarray(sample_batch["text"]),
        jnp.asarray(sample_batch["text_lengths"]),
        jnp.asarray(sample_batch["speech"]),
        jnp.asarray(sample_batch["speech_lengths"]),
        **_model_args(sample_batch),
        deterministic=False)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        opt_state=tx.init(variables["params"]),
        batch_stats=variables.get("batch_stats"),
        rng=state_rng,
    )


def make_tacotron2_train_step(model, tx, *,
                              use_stop_token_loss: bool = True,
                              use_guided_attention_loss: bool = False,
                              sigma: float = 0.2, jit: bool = True):
    def train_step(state: TrainState, batch):
        rng, dropout_rng = jax.random.split(state.rng)

        def loss_fn(params):
            outputs, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["text"], batch["text_lengths"], batch["speech"],
                batch["speech_lengths"], **_model_args(batch),
                deterministic=False,
                rngs={"dropout": dropout_rng}, mutable=["batch_stats"])
            losses = tacotron2_loss(
                outputs, batch["speech"], batch["speech_lengths"],
                batch["text_lengths"],
                use_stop_token_loss=use_stop_token_loss,
                use_guided_attention_loss=use_guided_attention_loss,
                sigma=sigma)
            return losses["loss"], (losses, mutated["batch_stats"])

        (_, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params,
                                  opt_state=opt_state,
                                  batch_stats=new_stats, rng=rng)
        return new_state, dict(losses)

    if jit:
        return jax.jit(train_step, donate_argnums=0)
    return train_step


def make_tacotron2_eval_step(model, *, use_stop_token_loss: bool = True,
                             use_guided_attention_loss: bool = False,
                             sigma: float = 0.2, jit: bool = True):
    def eval_step(state: TrainState, batch):
        variables = {"params": state.params}
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
        # prenet dropout is always-on by design; evaluation still needs an
        # rng — derive a fixed one from the state rng for determinism.
        rng = (state.rng if state.rng is not None
               else jax.random.PRNGKey(0))
        outputs = model.apply(
            variables, batch["text"], batch["text_lengths"],
            batch["speech"], batch["speech_lengths"], **_model_args(batch),
            deterministic=True, rngs={"dropout": rng})
        return tacotron2_loss(
            outputs, batch["speech"], batch["speech_lengths"],
            batch["text_lengths"],
            use_stop_token_loss=use_stop_token_loss,
            use_guided_attention_loss=use_guided_attention_loss,
            sigma=sigma)

    if jit:
        return jax.jit(eval_step)
    return eval_step


def make_tacotron2_predict_step(model, jit: bool = True):
    """Teacher-forced forward returning the raw output dict (alignments,
    mel predictions) — feeds figure logging (reference logs these to
    VisualDL during the valid loop, examples/tacotron2_aishell3/
    train.py:100-112)."""
    def predict_step(state: TrainState, batch):
        variables = {"params": state.params}
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
        rng = (state.rng if state.rng is not None
               else jax.random.PRNGKey(0))
        return model.apply(
            variables, batch["text"], batch["text_lengths"],
            batch["speech"], batch["speech_lengths"], **_model_args(batch),
            deterministic=True, rngs={"dropout": rng})

    if jit:
        return jax.jit(predict_step)
    return predict_step
